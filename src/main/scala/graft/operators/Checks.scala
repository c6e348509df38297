package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Fused ONE-ACTION premise checks (r15 optimization round, guide
  * §1.2/§5 — driver job round-trips): every stored-index probe/append
  * runs 2–3 one-row premise aggregates (shard dup-count, id-clash
  * against the stored table, family-specific clashes), each as its own
  * driver action. A single action over a 32-core local shuffle costs
  * ~0.1–0.3 s of fixed scheduling/AQE overhead regardless of data, and
  * the streaming ingest loops pay the pair per probe AND per append at
  * drain cadence. [[counts]] unions the aggregates under a tag column
  * and collects them in one action: the subtrees execute concurrently
  * inside one job, so wall time is ~max(subtree) instead of the sum,
  * and the per-action overhead is paid once.
  *
  * Premise SEMANTICS are unchanged by construction — callers read the
  * same values and check them in the same order, throwing the same
  * messages. The one behavioral difference: a later premise's frame is
  * now evaluated even when an earlier premise fails (refusal paths are
  * exceptional; no gate reaches them), and a clash probe loses its
  * `limit(1)` short-circuit — which only ever fired on the refusal
  * path anyway (the common no-clash case always scanned everything).
  */
private[graft] object Checks {

  /** Evaluate k ONE-ROW aggregate frames in ONE Spark action. Every
    * column must be long-castable and non-null at the positions the
    * caller reads (counts and guarded sums are; pad columns added here
    * are never read). Returns each frame's values as longs, in input
    * order.
    */
  def counts(frames: DataFrame*): Seq[IndexedSeq[Long]] = {
    require(frames.nonEmpty, "Checks.counts: no frames")
    val width = frames.map(_.columns.length).max
    val tagged = frames.zipWithIndex.map { case (df, i) =>
      val cols = df.columns.toSeq.map(c => col(c).cast("long")) ++
        Seq.fill(width - df.columns.length)(lit(null).cast("long"))
      df.select((lit(i.toLong).as("_k") +: cols): _*)
    }
    // positional union — schemas aligned to (long)*(width+1) above
    val rows: Array[Row] = tagged.reduce(_ union _).collect()
    val byTag = rows.map(r => r.getLong(0) -> r).toMap
    frames.zipWithIndex.map { case (df, i) =>
      val r = byTag.getOrElse(i.toLong, throw new IllegalStateException(
        s"Checks.counts: aggregate $i returned no row — premise " +
          "aggregates must be global (one-row) aggregations"))
      (1 to df.columns.length).map(j => r.getLong(j)).toIndexedSeq
    }
  }

  /** The commonest pair: a (n, n_distinct) dup aggregate over `ids`
    * plus a clash count of `ids` against `storedIds` (left-semi on the
    * shared column name), in one action. Returns (n, nDistinct,
    * nClash).
    */
  def dupAndClash(ids: DataFrame, idCol: String,
      storedIds: DataFrame): (Long, Long, Long) = {
    val dup = ids.agg(count(lit(1)).as("n"),
      count_distinct(col(idCol)).as("nd"))
    val clash = ids.select(idCol)
      .join(storedIds.select(idCol), Seq(idCol), "left_semi")
      .agg(count(lit(1)).as("c"))
    val Seq(a, b) = counts(dup, clash)
    (a(0), a(1), b(0))
  }
}
