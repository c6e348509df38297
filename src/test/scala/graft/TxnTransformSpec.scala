package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.operators.TxnTransform

/** Unit tests per transform operator (SURVEY.md §2.2, P2-P12) plus the
  * §7 semantic decisions (unknown-status intent, trim-before-filter,
  * HALF_UP rounding, idempotence).
  */
class TxnTransformSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def txn(rows: (String, String, String, String, String)*) =
    rows.toDF("transaction_id", "user_id", "amount", "ts", "status")

  test("P2: null keys are dropped") {
    val out = TxnTransform.clean(txn(
      (null, "u1", "1.00", "d", "ok"),
      ("t1", null, "1.00", "d", "ok"),
      ("t2", "u2", "1.00", "d", "ok")))
    assert(out.select("transaction_id").as[String].collect().toSeq == Seq("t2"))
  }

  test("P3+P4: unparseable amounts coerce to null and drop") {
    val out = TxnTransform.clean(txn(
      ("t1", "u1", "abc", "d", "ok"),
      ("t2", "u2", "", "d", "ok"),
      ("t3", "u3", "2.5", "d", "ok")))
    assert(out.select("transaction_id").as[String].collect().toSeq == Seq("t3"))
    assert(out.select("amount").as[Double].collect().toSeq == Seq(2.5))
  }

  test("P5: null status becomes 'unknown' (the documented intent, not the reference's 'nan' accident)") {
    val out = TxnTransform.clean(txn(("t1", "u1", "1.0", "d", null)))
    assert(out.select("status").as[String].collect().toSeq == Seq("unknown"))
  }

  test("P6: negative amounts filtered") {
    val out = TxnTransform.businessRules(
      TxnTransform.clean(txn(
        ("t1", "u1", "-0.01", "d", "ok"),
        ("t2", "u2", "0.0", "d", "ok"))))
    assert(out.select("transaction_id").as[String].collect().toSeq == Seq("t2"))
  }

  test("P7: cancelled filter is case- and padding-insensitive") {
    val out = TxnTransform.businessRules(
      TxnTransform.clean(txn(
        ("t1", "u1", "1.0", "d", "cancelled"),
        ("t2", "u2", "1.0", "d", " CANCELLED "),
        ("t3", "u3", "1.0", "d", "Cancelled"),
        ("t4", "u4", "1.0", "d", "ok"))))
    assert(out.select("transaction_id").as[String].collect().toSeq == Seq("t4"))
  }

  test("P8-P11: enrich lowercases+trims status, rounds amount HALF_UP, stamps processed_at") {
    val out = TxnTransform.enrich("TS0")(
      TxnTransform.clean(txn(("t1", "u1", "2.675", "d", "  OK Then "))))
      .select("status", "amount", "processed_at").as[(String, Double, String)]
      .collect().head
    assert(out == (("ok then", 2.68, "TS0")))
  }

  test("P12: canonical column order") {
    val out = TxnTransform.pipeline("TS0")(txn(("t1", "u1", "1.0", "d", "ok")))
    assert(out.columns.toSeq == TxnTransform.outputCols)
  }

  test("pipeline is idempotent on its own output shape") {
    val once = TxnTransform.pipeline("TS0")(txn(
      ("t1", "u1", "10.005", "d", " OK "),
      ("t2", "u2", "-1", "d", "ok"),
      ("t3", "u3", "x", "d", "ok")))
    val twice = TxnTransform.pipeline("TS0")(
      once.withColumn("amount", once("amount").cast("string")))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("reference runtime validators hold on pipeline output (sf0.001)") {
    val out = TxnTransform.pipeline(Queries.RunTs)(
      TxnView.dirty(spark, TestSpark.sf))
    val viol = operators.Stats.integrity(out).collect().head
    // columns: n_rows, null_*, negative_amount, cancelled_rows, unknown_status
    assert(viol.getLong(0) > 0)
    (1 to 7).foreach(i => assert(viol.getLong(i) == 0L,
      s"violation column $i nonzero"))
    assert(viol.getLong(8) > 0) // some statuses defaulted to 'unknown'
  }
}
