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

  /** LENGTH-BUCKETED batch assignment — the dynamic-batching prep step
    * (group sequences of similar length so a batch pads to its bucket's
    * bound, not the corpus max; the standard packing alternative when
    * examples must stay unconcatenated): docs bucket by power-of-two
    * token-count bands [0,16) [16,32) [32,64) [64,128) [128,∞), and
    * within each bucket consecutive `batchSize` docs (doc_id order)
    * share a batch index.
    *
    * Per-bucket global rank WITHOUT a per-bucket global sort — the
    * [[packByBudget]] two-pass plan generalized to grouped order:
    * range-partition on (bucket, doc_id), rank locally per (bucket,
    * partition), then add broadcast per-(bucket, partition) offsets.
    * Two full-data exchanges — the range partition plus the hash
    * exchange Catalyst inserts for the local-rank window (it cannot
    * prove `spark_partition_id` is partition-stable, so
    * EnsureRequirements re-clusters on (bucket, _pid); see the PLANS.md
    * q140 plan) — but every SORT is partition-local and the offsets
    * frame is buckets × partitions rows. That is the point: a plain
    * `row_number OVER (PARTITION BY bucket)` would sort five
    * corpus-fifth-sized window partitions — the single-task-ish hazard
    * GlobalWindow exists to avoid. Output is rank-derived, so
    * range-sampling nondeterminism in partition BOUNDARIES cannot
    * change it.
    */
  def lengthBucketBatches(docs: DataFrame, batchSize: Int,
      parts: Int = 0): DataFrame = {
    require(batchSize >= 1, "batchSize must be positive")
    val nParts =
      if (parts > 0) parts
      else docs.sparkSession.sessionState.conf.numShufflePartitions
    val nTok = size(split(col("text"), " ")).cast("long")
    val bucket = when(nTok < 16, 0L).when(nTok < 32, 1L)
      .when(nTok < 64, 2L).when(nTok < 128, 3L).otherwise(4L)
    val parted = docs
      .select(col("doc_id"), nTok.as("n_tok"), bucket.as("len_bucket"))
      .repartitionByRange(nParts, col("len_bucket").asc, col("doc_id").asc)
      .withColumn("_pid", spark_partition_id())
    val wLoc = Window.partitionBy(col("len_bucket"), col("_pid"))
      .orderBy(col("doc_id").asc)
    val local = graft.CacheScope.scoped(
      parted.withColumn("_lrank", row_number().over(wLoc)))
    val wStat = Window.partitionBy(col("len_bucket"))
      .orderBy(col("_pid").asc)
    val offsets = local.groupBy(col("len_bucket"), col("_pid"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_off", coalesce(
        sum(col("_c")).over(wStat.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("len_bucket"), col("_pid"), col("_off"))
    local.join(broadcast(offsets), Seq("len_bucket", "_pid"))
      .withColumn("batch_idx",
        expr(s"(_lrank + _off - 1) div $batchSize"))
      .select(col("doc_id"), col("n_tok"), col("len_bucket"),
        col("batch_idx"))
      .orderBy(col("doc_id"))
  }
}
