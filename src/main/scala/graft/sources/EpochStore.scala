package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col

/** The epoch'd write-once artifact layout shared by the stored index
  * families (the cross-polytope embedding index, r10/r11, and the
  * MinHash text index, r11) — extracted from `Ann`'s cp-index
  * machinery verbatim so a second family rides the same proven
  * torn-write discipline instead of re-implementing it.
  *
  * Layout under `dir`:
  *   - `<table>/epoch=N/`  one directory per named table per epoch
  *   - `meta_N/`           ONE row naming epoch N complete
  *
  * `meta_N` is written LAST per epoch (the staging-token discipline):
  * readers serve epochs ≤ the highest N whose meta READS, so a write
  * or append that dies mid-epoch leaves data files no reader ever
  * scans — epoch partition pruning skips them without reading a byte
  * — and the torn epoch is simply retried into the same number with
  * overwrite. Completeness is "the meta READS", not "a meta_N
  * directory exists": a crash during the meta job itself leaves
  * `meta_N` holding only `_temporary` (the committer mkdirs it before
  * any task commits), and treating that as current would brick every
  * probe AND the retry path.
  *
  * SINGLE WRITER, like any parquet layout without a table format: two
  * concurrent appends both target epoch N+1 and the loser's data is
  * silently clobbered or interleaved — serialize appends externally.
  * Concurrent READERS are always safe: they serve the highest complete
  * meta, and an in-flight epoch has none.
  *
  * What stays with each index family: the meta SCHEMA, the hash-family
  * version string and its drift refusals, and parameter-currency
  * premises — those are semantics of the family's hashes, not of the
  * layout.
  */
object EpochStore {

  /** Delete any previous artifact at `dir` — the base build's first
    * step (stale higher epochs surviving an overwrite would otherwise
    * be served as current). Corollary for callers: a rebuild whose
    * input frame READS this artifact's own files must materialize it
    * elsewhere first or build to a fresh directory — lineage recomputed
    * after the delete would find nothing.
    */
  def deleteAll(spark: SparkSession, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
  }

  /** Write one epoch: every named table lands at `dir/<name>/epoch=N`,
    * then the ONE-row `meta` frame lands at `dir/meta_N` — strictly
    * last, so the epoch only becomes visible complete.
    */
  def writeEpoch(dir: String, epoch: Int,
      tables: Seq[(String, DataFrame)], meta: DataFrame): Unit = {
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name/epoch=$epoch")
    }
    meta.coalesce(1).write.mode("overwrite").parquet(s"$dir/meta_$epoch")
  }

  /** The artifact's serving state: (epoch, meta row) of the HIGHEST
    * epoch whose meta reads. Refuses, by `who`'s name, an artifact
    * with no complete epoch (torn base build, missing directory, or a
    * foreign layout); `rebuildHint` names the family's rebuild entry
    * point.
    */
  def servingState(spark: SparkSession, dir: String, who: String,
      rebuildHint: String): (Int, Row) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rx = "meta_(\\d+)".r
    val epochs =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .collect { case rx(n) => n.toInt }
    // Only the TORN shapes skip to a lower epoch: an uncommitted
    // meta_N holds no readable parquet (the committer's _temporary
    // only → UNABLE_TO_INFER_SCHEMA / PATH_NOT_FOUND, an
    // AnalysisException) or committed zero rows (head() throws
    // NoSuchElement). Anything else — a transient I/O error, a
    // permission failure — PROPAGATES: silently serving epoch N−1
    // because epoch N hiccuped would emit an incomplete answer with
    // no error, which is worse than failing the probe (r11 review).
    val serving = epochs.sorted(Ordering[Int].reverse).view
      .flatMap { n =>
        try Some((n, spark.read.parquet(s"$dir/meta_$n").head()))
        catch {
          case _: org.apache.spark.sql.AnalysisException => None
          case _: java.util.NoSuchElementException => None
        }
      }.headOption
    require(serving.nonEmpty,
      s"$who: no complete epoch at $dir (no readable meta_N) — " +
        "the artifact is torn, missing, or a foreign layout; " +
        s"(re)build it with $rebuildHint")
    serving.get
  }

  /** A table's rows through `epoch` — epoch partition pruning on the
    * directory column skips torn higher epochs without reading a byte
    * of them. Callers project their own columns (the epoch column is
    * dropped here).
    */
  def tableThrough(spark: SparkSession, dir: String, name: String,
      epoch: Int): DataFrame =
    spark.read.parquet(s"$dir/$name")
      .filter(col("epoch") <= epoch).drop("epoch")
}
