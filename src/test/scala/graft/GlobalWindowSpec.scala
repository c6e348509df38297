package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalWindow

/** The two-pass range-partitioned global window must be value-identical to
  * the naive single-task `Window.orderBy` form, while keeping all
  * data-sized work partitioned.
  */
class GlobalWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, buckets: Int) = {
    val w = Window.orderBy(col("v").desc, col("k"))
    df.select(col("k"), col("v"),
      ntile(buckets).over(w).as("nt"),
      lag(col("v"), 1).over(w).as("pv"))
  }

  test("ntile+lag equal the naive global window (ties, odd buckets)") {
    // id%97 plants heavy value ties that straddle range boundaries;
    // buckets=7 exercises the uneven (q+1 vs q) bucket split
    val df = spark.range(1000)
      .select(col("id").as("k"), (col("id") % 97).cast("double").as("v"))
    val got = GlobalWindow.ntileLagDesc(df, "v", "k", buckets = 7, parts = 8)
      .select(col("k"), col("v"), col("ntile_bucket").cast("int").as("nt"),
        col("prev_value").as("pv"))
      .as[(Long, Double, Int, Option[Double])].collect().toSet
    val want = naive(df, 7).as[(Long, Double, Int, Option[Double])]
      .collect().toSet
    assert(got == want)
  }

  test("nullable values: lag must return NULL after a null-valued row, not a carry") {
    // every 7th value NULL: a coalesce-based boundary carry would
    // fabricate a non-null prev for rows whose true predecessor is NULL
    val df = spark.range(500)
      .select(col("id").as("k"),
        when(col("id") % 7 === 0, lit(null))
          .otherwise((col("id") % 53).cast("double")).as("v"))
    val got = GlobalWindow.ntileLagDesc(df, "v", "k", buckets = 4, parts = 8)
      .select(col("k"), col("ntile_bucket").cast("int").as("nt"),
        col("prev_value").as("pv"))
      .as[(Long, Int, Option[Double])].collect().toSet
    val want = naive(df, 4).select(col("k"), col("nt"), col("pv"))
      .as[(Long, Int, Option[Double])].collect().toSet
    assert(got == want)
  }

  test("n < buckets degenerate case matches naive ntile") {
    val df = spark.range(3)
      .select(col("id").as("k"), col("id").cast("double").as("v"))
    val got = GlobalWindow.ntileLagDesc(df, "v", "k", buckets = 5, parts = 4)
      .select(col("k"), col("ntile_bucket").cast("int"))
      .as[(Long, Int)].collect().toSet
    val want = naive(df, 5).select(col("k"), col("nt"))
      .as[(Long, Int)].collect().toSet
    assert(got == want)
  }

  test("property: random sizes/ties/nulls/buckets always equal the naive window") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(1, 300)
      tieMod <- Gen.choose(1, 50)     // small mod → heavy ties
      nullEvery <- Gen.choose(2, 20)  // planted nulls
      buckets <- Gen.choose(1, 9)
      parts <- Gen.choose(1, 12)
    } yield (n, tieMod, nullEvery, buckets, parts)
    val prop = Prop.forAll(gen) { case (n, tieMod, nullEvery, buckets, parts) =>
      val df = spark.range(n.toLong)
        .select(col("id").as("k"),
          when(col("id") % nullEvery === 0, lit(null))
            .otherwise((col("id") % tieMod).cast("double")).as("v"))
      val got = GlobalWindow
        .ntileLagDesc(df, "v", "k", buckets, parts)
        .select(col("k"), col("ntile_bucket").cast("int"), col("prev_value"))
        .as[(Long, Int, Option[Double])].collect().toSet
      val want = naive(df, buckets)
        .select(col("k"), col("nt"), col("pv"))
        .as[(Long, Int, Option[Double])].collect().toSet
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("two-phase stratified top-k equals the naive per-stratum window") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val k = 7
    val got = graft.operators.Sampling
      .stratifiedTopK(docs, "lang", "doc_id", k)
      .as[(String, Long, Int)].collect().toSeq
    val h = pmod(pmod(col("doc_id"), lit(100003L)) * lit(2654435761L),
      lit(1000000007L))
    val w = Window.partitionBy(col("lang")).orderBy(h, col("doc_id"))
    val naive = docs.select(col("lang"), col("doc_id"))
      .withColumn("sample_rank", row_number().over(w).cast("int"))
      .filter(col("sample_rank") <= k)
      .orderBy(asc_nulls_first("lang"), col("sample_rank"))
      .as[(String, Long, Int)].collect().toSeq
    assert(got == naive,
      "partition-local pruning must not change the exact per-stratum top-k")
  }

  test("no single-partition exchange over data-sized input") {
    val df = spark.range(1000)
      .select(col("id").as("k"), (col("id") % 97).cast("double").as("v"))
    val out = GlobalWindow.ntileLagDesc(df, "v", "k", buckets = 4, parts = 8)
    val plan = out.queryExecution.executedPlan.toString
    // The only SinglePartition exchange allowed is the one feeding the
    // O(parts)-row stats window; it must sit above an aggregate, never
    // above the raw input. q48's r1 plan put ALL rows in one task.
    val singles = plan.linesIterator
      .zipWithIndex.filter(_._1.contains("Exchange SinglePartition")).toSeq
    assert(singles.size <= 1, s"unexpected global exchanges:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(_pid"),
      s"data-sized window must be partitioned by _pid:\n$plan")
  }
}
