package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Stats, TxnTransform}
import scala.jdk.CollectionConverters._

/** Property-based tests (SURVEY.md §5.3): generators for dirty transaction
  * rows; invariants and idempotence must hold for ANY input. Uses the
  * scalacheck runner directly (no scalatestplus bridge in the build).
  */
class TransformPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genId = Gen.oneOf(Gen.const(null: String),
    Gen.alphaNumStr.map(s => "t" + s.take(6)))
  private val genAmount = Gen.oneOf(
    Gen.const(null: String),
    Gen.const("garbage"),
    Gen.chooseNum(-100000L, 100000L).map(c => (c / 100.0).toString),
    Gen.chooseNum(0L, 999L).map(_.toString))
  private val genStatus = Gen.oneOf(
    Gen.const(null: String),
    Gen.oneOf("completed", " CANCELLED ", "Cancelled", "PENDING  ",
      "unknown", " ok "))
  private val genRow = for {
    id <- genId; uid <- genId; amt <- genAmount; st <- genStatus
  } yield (id, uid, amt, "2024-01-01", st)
  private val genRows = Gen.nonEmptyListOf(genRow).map(_.take(60))

  /** Spark 4 tuple encoders reject embedded nulls; build via explicit
    * Rows + schema.
    */
  private def toTxnDf(rows: List[(String, String, String, String, String)]) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq("transaction_id", "user_id", "amount",
      "ts", "status").map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](rows.map(r =>
        Row(r._1, r._2, r._3, r._4, r._5)).asJava), schema)
  }

  private def check(name: String)(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, s"$name: $res")
  }

  test("invariants: pipeline output never violates the reference validators") {
    check("invariants")(Prop.forAll(genRows) { rows =>
      val df = toTxnDf(rows)
      val v = Stats.integrity(TxnTransform.pipeline("TS0")(df)).collect().head
      // null counts, negative amounts, cancelled rows must all be 0
      (1 to 7).forall(i => v.getLong(i) == 0L)
    })
  }

  test("idempotence: transforming already-transformed data is a no-op") {
    check("idempotence")(Prop.forAll(genRows) { rows =>
      val df = toTxnDf(rows)
      val once = TxnTransform.pipeline("TS0")(df)
      val twice = TxnTransform.pipeline("TS0")(
        once.withColumn("amount", col("amount").cast("string")))
      once.collect().toSeq.sortBy(_.toString) ==
        twice.collect().toSeq.sortBy(_.toString)
    })
  }

  test("funnel conservation: drop stages partition the input exactly") {
    check("funnel")(Prop.forAll(genRows) { rows =>
      val df = toTxnDf(rows)
      val f = Stats.funnel(df).collect().head
      (1 to 5).map(f.getLong).sum == f.getLong(0)
    })
  }

  test("dedup: exactly one survivor per key, carrying the max batch") {
    val genDup = for {
      key <- Gen.oneOf("k1", "k2", "k3")
      batch <- Gen.chooseNum(1, 5)
      v <- Gen.alphaStr.map(_.take(4))
    } yield (key, batch, v)
    check("dedup")(Prop.forAll(Gen.nonEmptyListOf(genDup).map(_.take(40))) {
      rows =>
        val df = rows.toDF("id", "batch", "v")
        val out = Dedup.lastWriterWins(df, Seq("id"),
          Seq(col("batch").desc, col("v"))).as[(String, Int, String)]
          .collect()
        val maxBatch = rows.groupBy(_._1).map { case (k, g) =>
          k -> g.map(_._2).max }
        out.map(_._1).sorted.toSeq == rows.map(_._1).distinct.sorted &&
          out.forall { case (k, b, _) => b == maxBatch(k) }
    })
  }
}
