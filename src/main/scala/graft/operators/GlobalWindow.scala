package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global-order window functions (rank, ntile, lag) WITHOUT a global
  * single-task window.
  *
  * `Window.orderBy(...)` with no partitionBy forces every row into ONE
  * task — fine at 1.5k rows, a single-executor sort at 100×. The
  * scale-safe plan is the classic two-pass:
  *
  *   1. range-partition by the order key (`repartitionByRange`): rows are
  *      globally ordered ACROSS partitions, each partition holds a
  *      contiguous rank range;
  *   2. per-partition local windows (row_number / lag) — parallel, each
  *      task sorts only its slice;
  *   3. a TINY per-partition stats frame (one row per partition: count,
  *      last value) turned into prefix offsets + boundary carry values by
  *      a window over `parts` rows — the only single-partition work is
  *      O(parts), bounded by construction, independent of data size;
  *   4. broadcast the offsets back and combine: global rank = prefix
  *      offset + local rank; a partition-first row's lag comes from the
  *      previous partition's last value; ntile becomes closed-form
  *      integer arithmetic on (global rank, total count).
  *
  * Output values are invariant to where the (sampled) range boundaries
  * fall, so the plan is deterministic end-to-end.
  */
object GlobalWindow {

  /** Standard SQL ntile bucket from a 1-based global rank and total count:
    * q = n div k, r = n mod k; the first r buckets hold q+1 rows. Integral
    * `DIV` keeps the arithmetic exact at any scale (the DSL `/` promotes
    * longs to double, and a correctly-rounded double quotient can still
    * floor across a bucket boundary once numerators pass 2^53). The q=0
    * branch order matters: when n < k every row lands in a size-1 bucket
    * via the first branch, so the DIV-by-zero branch is never evaluated
    * (CaseWhen is lazy).
    */
  private def ntileExpr(rnCol: String, nCol: String, k: Int): Column = expr(
    s"""CASE WHEN $rnCol <= ($nCol % $k) * (($nCol DIV $k) + 1)
          THEN ($rnCol - 1) DIV (($nCol DIV $k) + 1) + 1
          ELSE ($nCol % $k) +
               ($rnCol - 1 - ($nCol % $k) * (($nCol DIV $k) + 1))
                 DIV ($nCol DIV $k) + 1 END""")

  /** ntile + lag over the global (valueCol DESC, keyCol ASC) total order.
    * Adds `global_rn`, `ntile_bucket` (1..buckets), and `prev_value` (the
    * previous row's value in global order; null for the global first row).
    *
    * The locally-windowed frame is cache()'d because BOTH the stats
    * aggregation and the final join consume it: uncached, each consumer
    * would re-execute the range exchange, and RangePartitioner's sampled
    * boundaries are seeded per-RDD — two independent executions could
    * disagree on partition assignment and corrupt every offset (the
    * CLAUDE.md self-join-intermediate rule; relying on ReuseExchange
    * dedup is fragile since column pruning can de-canonicalize one
    * side). The cached working set is the operator's own output size.
    *
    * `parts <= 0` (the default) resolves to the session's shuffle
    * parallelism — partition count must GROW with the cluster/data; a
    * fixed constant would turn each range slice into an ever-larger
    * single-task sort at scale (the q50-nation-blocking mistake).
    */
  def ntileLagDesc(df: DataFrame, valueCol: String, keyCol: String,
      buckets: Int, parts: Int = 0): DataFrame = {
    val nParts =
      if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val v = col(valueCol); val k = col(keyCol)
    val parted = df.repartitionByRange(nParts, v.desc, k.asc)
      .withColumn("_pid", spark_partition_id())
    val wLoc = Window.partitionBy(col("_pid")).orderBy(v.desc, k.asc)
    val local = graft.CacheScope.scoped(parted
      .withColumn("_lrn", row_number().over(wLoc))
      .withColumn("_llag", lag(v, 1).over(wLoc)))
    // last row of each partition = the row with the max LOCAL rank:
    // max_by over _lrn (never null) stays correct when v itself has
    // nulls, which a (v, -k)-struct argmin would mis-order
    val stats = local.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_cnt"),
        max_by(v, col("_lrn")).as("_last"))
    val wStat = Window.orderBy(col("_pid"))
    val offsets = stats
      .withColumn("_off", coalesce(
        sum(col("_cnt")).over(wStat.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("_prev_last", lag(col("_last"), 1).over(wStat))
      .withColumn("_n", sum(col("_cnt")).over(
        wStat.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("_pid"), col("_off"), col("_prev_last"), col("_n"))
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn("global_rn", col("_off") + col("_lrn"))
      .withColumn("ntile_bucket", ntileExpr("global_rn", "_n", buckets))
      // lag semantics preserved for nullable values: only a partition's
      // FIRST row borrows the previous partition's last value — a
      // coalesce would also fire when the true predecessor's value is
      // legitimately NULL and fabricate a non-null prev
      .withColumn("prev_value",
        when(col("_lrn") === 1, col("_prev_last")).otherwise(col("_llag")))
      .drop("_pid", "_lrn", "_llag", "_off", "_prev_last", "_n")
  }
}
