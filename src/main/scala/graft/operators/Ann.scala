package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VecFns
import graft.plans.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star extension; SURVEY.md §2.5).
  *
  * Two paths with the same contract (top-k cosine neighbors per query):
  *
  *  - [[bruteTopK]]: exact baseline. The (small) query set is broadcast
  *    against the corpus — a broadcast nested-loop join, embarrassingly
  *    parallel over corpus partitions, with a per-query top-k window.
  *    Correct at any corpus size as long as |queries| is broadcastable;
  *    cost O(|corpus| × |queries| × dim).
  *  - [[lshTopK]]: the 100 TB path. Corpus and queries are bucketed by
  *    sign-bit random-hyperplane LSH; each query only scans its own
  *    bucket (expected |corpus| / 2^planes candidates). Recall vs the
  *    exact baseline is asserted in ScalaTest — by design it trades
  *    recall for a 2^planes scan reduction. An IVF variant would replace
  *    the hash with learned centroids; the join shape is identical.
  *
  * Outputs are (query_id, neighbor_id, rank) — integer-only, so oracle
  * hash comparison is immune to low-bit float divergence between engines.
  */
object Ann {

  /** Codegen'd fused cosine ([[graft.plans.CosineSim]]) — bit-identical to
    * VecFns.cosine, ~9× faster on similarity joins.
    */
  private def fastCosine(df: DataFrame, a: String, b: String): Column = {
    GraftFunctions.register(df.sparkSession)
    expr(s"graft_cosine($a, $b)")
  }

  private def ranked(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exact brute-force top-k: broadcast the query set over the corpus. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      VecFns.toDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      VecFns.toDouble(col("embedding")).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        fastCosine(c, "qv", "cv").as("sim"))
    ranked(scored, k)
  }

  /** LSH-bucketed top-k: candidates limited to the query's sign-bit
    * bucket. One shuffle on bucket id (or broadcast when queries are
    * small); scan cost drops by ~2^nPlanes.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int = 64, nPlanes: Int = 4): DataFrame = {
    def withBucket(df: DataFrame, idAs: String, vAs: String) =
      df.select(col("vec_id").as(idAs),
        VecFns.toDouble(col("embedding")).as(vAs),
        VecFns.lshBucket(VecFns.toDouble(col("embedding")), dim, nPlanes))
    val q = withBucket(queries, "query_id", "qv")
    val c = withBucket(corpus, "neighbor_id", "cv")
    val scored = c.join(broadcast(q),
        c("bucket") === q("bucket") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        fastCosine(c, "qv", "cv").as("sim"))
    ranked(scored, k)
  }

  /** IVF (inverted-file) top-k: partition the corpus by nearest centroid,
    * search only the query's `nprobe` closest cells. Centroids are learned
    * with a fixed number of Lloyd iterations from a deterministic seed
    * (first `nCells` corpus vectors by id) — distributed k-means expressed
    * as join/groupBy rounds, no MLlib dependency.
    *
    * Scale: each iteration is one broadcast (centroids are tiny) + one
    * hash aggregation over the corpus; search touches |corpus| ×
    * nprobe/nCells candidates. The LSH variant needs no training; IVF
    * adapts to the data distribution — both exist because real pipelines
    * choose per workload.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 8, nprobe: Int = 2, iterations: Int = 2,
      dim: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    GraftFunctions.register(spark)
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      graft.functions.VecFns.toDouble(col("embedding")).as("cv")).cache()

    // deterministic init: the nCells lowest-id vectors
    var centroids = c.orderBy(col("neighbor_id")).limit(nCells)
      .select(monotonically_increasing_id().as("cell"), col("cv").as("cen"))
    // Lloyd iterations: assign to nearest centroid, recompute means.
    // Centroid frames are tiny (nCells rows) -> collected into literals is
    // avoided; broadcast joins keep everything declarative. Each round is
    // materialized (count) so the previous round's cache can be released
    // immediately instead of pinning one frame per iteration.
    for (_ <- 0 until iterations) {
      val assigned = c.join(broadcast(centroids))
        .withColumn("sim", expr("graft_cosine(cv, cen)"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("neighbor_id")).orderBy(col("sim").desc,
            col("cell"))))
        .filter(col("rk") === 1)
      val prev = centroids
      centroids = assigned.groupBy(col("cell"))
        .agg(array((0 until dim).map(i =>
          avg(element_at(col("cv"), i + 1))): _*).as("cen"))
        .cache()
      centroids.count()
      prev.unpersist()
    }
    val cells = c.join(broadcast(centroids))
      .withColumn("sim", expr("graft_cosine(cv, cen)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("neighbor_id")).orderBy(col("sim").desc,
          col("cell"))))
      .filter(col("rk") === 1)
      .select(col("neighbor_id"), col("cv"), col("cell"))

    val q = queries.select(col("vec_id").as("query_id"),
      graft.functions.VecFns.toDouble(col("embedding")).as("qv"))
      .join(broadcast(centroids))
      .withColumn("sim", expr("graft_cosine(qv, cen)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc,
          col("cell"))))
      .filter(col("rk") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))

    val scored = cells.join(broadcast(q),
        cells("cell") === q("cell") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("graft_cosine(qv, cv)").as("sim"))
    ranked(scored, k)
  }

  /** Embedding near-duplicate pairs: all (a < b) with cosine >= threshold.
    * Exact form is a broadcast nested-loop self-join — quadratic, kept as
    * the verifiable baseline; the LSH bucketing above is the scale path
    * (same verify-after-candidates shape as TextDedup).
    */
  def cosinePairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("vec_a"),
      VecFns.toDouble(col("embedding")).as("va"))
    val b = corpus.select(col("vec_id").as("vec_b"),
      VecFns.toDouble(col("embedding")).as("vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        fastCosine(a, "va", "vb").as("sim"))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"))
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
