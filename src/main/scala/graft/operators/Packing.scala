package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence PACKING — assign documents, in a stable global
  * order, to fixed-token-budget shards (the "pack the corpus into ~4M-token
  * training files" step of an LLM data pipeline; north-star extension).
  *
  * Packing rule: walk documents in ascending `orderCol`; a document whose
  * running token count BEFORE it is `c` lands in shard `c DIV budget`.
  * This is the streaming-concatenate-and-cut discipline (shard sums
  * overshoot the budget by at most one document, never undershoot by
  * fragmentation), it is a pure function of the ordered prefix sums — no
  * bin-packing heuristic state — so any engine reproduces it bit-exactly:
  * the oracle is a plain SQL window cumsum.
  *
  * Scale shape: the naive form is `sum(tokens) OVER (ORDER BY id)` — a
  * GLOBAL window, i.e. one single-task sort of the corpus (the q48
  * anti-pattern). This implementation is the two-pass range-partitioned
  * plan of [[GlobalWindow]]: range-exchange on the order key, local
  * per-partition cumsums, then a partition-count-sized stats frame turned
  * into broadcast prefix offsets — the only single-partition work is
  * O(partitions), independent of data size.
  *
  * The locally-cumsummed frame is consumed by BOTH the stats aggregate and
  * the final join, and RangePartitioner's sampled boundaries are seeded
  * per-RDD, so the frame must be pinned (CLAUDE.md self-join rule) — a
  * re-execution could re-draw boundaries and corrupt every offset. It is
  * registered in [[graft.CacheScope]] so the harness releases it with the
  * query.
  */
object Packing {

  /** Adds `shard` (0-based BIGINT) and `cum_before` to `df`.
    *
    * @param orderCol  total-order column (must be unique — ties would make
    *                  the prefix sum ambiguous); ascending
    * @param tokensCol non-negative integral token count per row
    * @param budget    shard token budget, > 0
    * @param parts     range partitions; <= 0 ⇒ session shuffle parallelism
    */
  def packByBudget(df: DataFrame, orderCol: String, tokensCol: String,
      budget: Long, parts: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val nParts =
      if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val o = col(orderCol)
    val parted = df.repartitionByRange(nParts, o.asc)
      .withColumn("_pid", spark_partition_id())
    val wLoc = Window.partitionBy(col("_pid")).orderBy(o.asc)
    val local = graft.CacheScope.scoped(parted
      .withColumn("_lcum",
        sum(col(tokensCol).cast("long")).over(wLoc))) // inclusive cumsum
    val wStat = Window.orderBy(col("_pid"))
    val offsets = local.groupBy(col("_pid"))
      .agg(max(col("_lcum")).as("_ptot")) // max of inclusive cumsum = total
      .withColumn("_off", coalesce(
        sum(col("_ptot")).over(wStat.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_pid"), col("_off"))
    local.join(broadcast(offsets), Seq("_pid"))
      // exclusive global prefix = partition offset + inclusive local - own
      .withColumn("cum_before",
        col("_off") + col("_lcum") - col(tokensCol).cast("long"))
      .withColumn("shard", expr(s"cum_before DIV $budget"))
      .drop("_pid", "_lcum", "_off")
  }
}
