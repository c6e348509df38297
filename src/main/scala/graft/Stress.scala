package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale stress of the suite's four heaviest operators (diagnostic
  * main, not part of the driver contract; r5 VERDICT #7: measure the
  * scale curves instead of asserting them).
  *
  * Builds a one-off ~sf1-equivalent corpus in /tmp as TEN id-shifted
  * copies of the sf0.1 tables, then times each heavy query at 1× and
  * 10× in the same JVM (warmed, min-of-`passes`) and reports the
  * measured scaling exponent log₁₀(t₁₀/t₁).
  *
  * The copy construction is chosen so each operator's PREMISE — not an
  * artifact — is what scales:
  *  - documents: per-copy digit injected after every space, so the
  *    within-copy near-dup structure is preserved (both members of a
  *    pair get the same transform) while cross-copy 12-gram Jaccard
  *    collapses — 10× docs, 10× true pairs, no spurious ×100 pair
  *    explosion from verbatim copies (q69/q70);
  *  - customer: plain id shift — q96's four residue-class chains thread
  *    THROUGH the copies, so the adversarial diameter itself grows 10×
  *    (the log₂(diameter) round count is the premise under test);
  *  - orders/lineitem: all keys shifted per copy — 10 disjoint
  *    marketplaces, so customers-per-part (the q108 C(k,2) premise)
  *    stays scale-invariant while part count grows 10×, exactly the
  *    TPC-H degree model the maxPerKey=256 cap encodes. q134's k-core
  *    rides the same copies: 10 independent co-purchase graphs, so the
  *    peel-cascade DEPTH (the round premise) is invariant while edge
  *    volume grows 10×.
  *
  * NOT stress-scaled, deliberately: the banded cosine join family
  * (q52/q118). At d = 64 and the gate's adversarial 0.4 threshold, ANY
  * per-copy orthogonal decorrelation (signed permutations measured, and
  * a perfect random rotation is no better: P(cos ≥ 0.4) ≈ 7·10⁻⁴ at
  * 64 dims) leaves a cross-copy similarity tail that inflates pair
  * volume ~10× beyond the true within-copy structure — the scaled
  * corpus would stress an artifact, not the operator's premise. A
  * production-threshold variant (≥ 0.7) would scale cleanly; the gate
  * threshold is kept adversarial on purpose.
  *
  * Run: `sbt 'runMain graft.Stress'` (optionally SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_PASSES). One line per query:
  * `STRESS <q> t1x=<s> t10x=<s> ratio=<r> exponent=<e>`.
  */
object Stress {

  private val copies = 10
  private val offset = 100000000L // clears every sf0.1 id space

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/testdata/sf0.1"
    val dir10 = "/tmp/graft_stress_10x"

    buildCorpus(spark, base, dir10)

    val queries = Seq("q69_chargram_jaccard", "q70_dedup_clusters",
      "q96_chain_components", "q108_triangles", "q134_kcore")
    // warm the codegen/JIT once at sf0.001 so neither timed tier pays it
    queries.foreach { q =>
      CacheScope.withScope {
        Queries.all(q)(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
      }
    }
    def time(q: String, dir: String): Double =
      (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        CacheScope.withScope {
          Queries.all(q)(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        (System.nanoTime() - t0) / 1e9
      }.min
    queries.foreach { q =>
      val t1 = time(q, base)
      val t10 = time(q, dir10)
      val ratio = t10 / t1
      val exp = math.log10(ratio)
      println(f"STRESS $q t1x=$t1%.1fs t10x=$t10%.1fs " +
        f"ratio=$ratio%.1f exponent=$exp%.2f")
    }
    spark.stop()
  }

  /** Ten id-shifted copies of each input table, written parquet in the
    * Tables.load layout so the registered queries run unmodified.
    */
  private def buildCorpus(spark: SparkSession, base: String,
      out: String): Unit = {
    graft.streaming.EventStreams.deleteStagingForTest(
      java.nio.file.Paths.get(out))
    def tenfold(df: DataFrame, f: (DataFrame, Long) => DataFrame)
        : DataFrame =
      (0 until copies).map(k => f(df, k.toLong)).reduce(_ unionByName _)
    val docs = spark.read.parquet(s"$base/documents.parquet")
    tenfold(docs, (d, k) => d
      .withColumn("doc_id", col("doc_id") + lit(k * offset))
      // same transform on every doc of a copy: preserves within-copy
      // pair similarity, kills cross-copy 12-gram overlap
      .withColumn("text", regexp_replace(col("text"), lit(" "),
        concat(lit(" "), lit(k.toString)))))
      .write.parquet(s"$out/documents.parquet")
    val cust = spark.read.parquet(s"$base/customer.parquet")
    tenfold(cust, (d, k) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(k * offset)))
      .write.parquet(s"$out/customer.parquet")
    val orders = spark.read.parquet(s"$base/orders.parquet")
    tenfold(orders, (d, k) => d
      .withColumn("o_orderkey", col("o_orderkey") + lit(k * offset))
      .withColumn("o_custkey", col("o_custkey") + lit(k * offset)))
      .write.parquet(s"$out/orders.parquet")
    val li = spark.read.parquet(s"$base/lineitem.parquet")
    tenfold(li, (d, k) => d
      .withColumn("l_orderkey", col("l_orderkey") + lit(k * offset))
      .withColumn("l_partkey", col("l_partkey") + lit(k * offset)))
      .write.parquet(s"$out/lineitem.parquet")
    println(s"STRESS corpus built at $out (${copies}× $base)")
  }
}
