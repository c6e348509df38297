package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Verify error-marker contract (r6 VERDICT #5): a query that
  * THROWS during the correctness dump must still land an output under its
  * name — a one-row `_graft_error` frame whose schema can never match an
  * oracle — so the gate records a FAIL for it instead of the row silently
  * vanishing from the round's correctness file.
  */
class VerifyMarkerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a throwing query yields a _graft_error marker row, not an absence") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_verify_marker").toString
    Verify.writeErrorMarker(spark, out, "q_boom",
      new IllegalStateException("synthetic failure"))
    val back = spark.read.parquet(s"$out/q_boom")
    assert(back.columns.toSeq == Seq("_graft_error"),
      "marker schema must be the reserved error column (never oracle-matching)")
    val rows = back.collect()
    assert(rows.length == 1 && rows.head.getString(0) == "synthetic failure")
  }

  test("a null-message throwable still writes a non-empty marker") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_verify_marker").toString
    Verify.writeErrorMarker(spark, out, "q_boom2",
      new RuntimeException(null: String))
    val rows = spark.read.parquet(s"$out/q_boom2").collect()
    assert(rows.length == 1 && rows.head.getString(0).nonEmpty)
  }
}
