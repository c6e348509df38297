package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns (SURVEY.md "salting for skew").
  *
  * Salted two-phase aggregation: phase 1 aggregates on (key, salt) so a
  * hot key's rows spread over `buckets` reducers; phase 2 merges the
  * partials per key. For algebraic aggregates (count/sum over exact
  * types) the result is IDENTICAL to the direct group-by — which is why
  * the driver gate can hash-compare it against a plain GROUP BY oracle.
  *
  * (AQE's skew handling covers join skew automatically; explicit salting
  * remains the tool for aggregation skew and for engines/pipelines where
  * AQE cannot see the hot key in advance.)
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from a row-unique column
    * (hash-based, not random — reruns produce identical partials).
    */
  def salt(rowKey: Column, buckets: Int): Column =
    pmod(hash(rowKey), lit(buckets))

  /** count + exact-decimal sum per key, via salted two-phase aggregation.
    */
  def saltedStats(df: DataFrame, key: String, valueCol: String,
      rowKey: String, buckets: Int = 16): DataFrame =
    df.withColumn("__salt", salt(col(rowKey), buckets))
      .groupBy(col(key), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol).cast("decimal(18,6)")).as("__s"))
      .groupBy(col(key))
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__s")).cast("double").as("sum_value"))
      .orderBy(col(key))

  /** Salted shuffle JOIN for a skewed fact key: the fact side salts each
    * row into one of `buckets` sub-keys, the (small-but-not-broadcastable
    * at scale) build side is REPLICATED across all buckets, and the join
    * runs on (key, salt) — a hot key's rows land on `buckets` reducers
    * instead of one. The salt provably cancels out of the result (every
    * fact row meets exactly one replica of each matching build row), so
    * the driver gate hash-compares it against a PLAIN join oracle.
    *
    * The shuffle-hash hint pins the salted-shuffle plan: at gate size
    * Spark would otherwise broadcast the dim and salt nothing. This is
    * the explicit remedy for the cases AQE's skew splitting cannot reach
    * — streaming joins, a build side above the broadcast ceiling, or a
    * hot key known in advance. PlanAuditSpec's AQE skew test runs the
    * SAME hot-key dataset through both remedies: AQE's runtime split
    * (`skew=true` on the sort-merge join) and this salted join, asserting
    * they produce identical aggregates.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factRowKey: String, buckets: Int = 8): DataFrame = {
    val salted = fact.withColumn("__salt", salt(col(factRowKey), buckets))
    val replicated = dim
      .withColumn("__salt",
        explode(array((0 until buckets).map(lit): _*)))
    // hint on the REPLICATED DIM side: the hinted side is the hash-table
    // build side, and only the dim is small enough to build per task —
    // hinting the fact would materialize the big side's partitions in
    // memory
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
