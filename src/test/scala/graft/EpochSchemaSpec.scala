package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Bm25, Dedup, Multimodal, TextDedup, TextIndex}
import graft.sources.EpochStore

/** The append-path SCHEMA PREMISE (r14 — r13 VERDICT #4): every epoch
  * of a table must carry the table's stored schema. Parquet mixed
  * reads do not fail on drift — a renamed column reads as NULLs, a
  * retyped one breaks only at probe time — so the shared write path
  * (`EpochStore.writeEpoch`) refuses a drifted frame BEFORE any bytes
  * land. One test per index family pins the refusal message (extra /
  * renamed / retyped column) and that the attempt leaves the artifact
  * untouched; the check is order-sensitive and nullability-blind by
  * design (parquet read-back is all-nullable while in-flight frames
  * often are not — see the writeEpoch scaladoc).
  */
class EpochSchemaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** Attempt three drifted appends of `table` and require the loud
    * refusal each time, then prove the artifact did not move.
    */
  private def assertDriftRefused(dir: String, table: String): Unit = {
    val st = EpochStore.servingState(spark, dir, "EpochSchemaSpec",
      "rebuild")
    val meta = spark.createDataFrame(
        java.util.Collections.singletonList(st.meta), st.meta.schema)
      .drop("floor_epoch")
    val good = EpochStore.tableThrough(spark, dir, table, st.floor,
      st.epoch).limit(1)
    def refuse(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        EpochStore.writeEpoch(dir, st.epoch + 1, Seq(table -> df),
          meta, st.floor)
      }
      assert(e.getMessage.contains("schema drift") &&
        e.getMessage.contains(s"'$table'"),
        s"$what must refuse as schema drift, got: ${e.getMessage}")
    }
    CacheScope.withScope {
      refuse(good.withColumn("extra_col", lit(1)), "an extra column")
      val first = good.schema.fields.head.name
      refuse(good.withColumnRenamed(first, s"${first}_renamed"),
        "a renamed column")
      val retyped =
        if (good.schema.fields.head.dataType ==
            org.apache.spark.sql.types.StringType) "binary"
        else "string"
      refuse(good.withColumn(first, col(first).cast(retyped)),
        "a retyped column")
    }
    val after = EpochStore.servingState(spark, dir, "EpochSchemaSpec",
      "rebuild")
    assert(after.epoch == st.epoch && after.floor == st.floor,
      "a refused drifted append must leave the artifact untouched")
  }

  test("fp: a drifted fps epoch refuses loudly before any bytes land") {
    val d = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").limit(60)
    val dir = "/tmp/graft_test_schema_fp"
    CacheScope.withScope { Dedup.writeFingerprintIndex(d, dir) }
    assertDriftRefused(dir, "fps")
  }

  test("text: a drifted docs epoch refuses loudly") {
    val d = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").limit(60)
    val dir = "/tmp/graft_test_schema_txt"
    CacheScope.withScope {
      TextIndex.writeJaccardIndex(d, dir, threshold = 0.6) }
    assertDriftRefused(dir, "docs")
  }

  test("bm25: a drifted postings epoch refuses loudly") {
    val d = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").limit(60)
    val dir = "/tmp/graft_test_schema_bm25"
    CacheScope.withScope { Bm25.writeBm25Index(d, dir) }
    assertDriftRefused(dir, "postings")
  }

  test("cp: a drifted vectors epoch refuses loudly") {
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select("vec_id", "embedding").limit(120)
    val dir = "/tmp/graft_test_schema_cp"
    CacheScope.withScope {
      Ann.writeCpIndex(e, dir, threshold = 0.4) }
    assertDriftRefused(dir, "vectors")
  }

  test("dhash: a drifted hashes epoch refuses loudly") {
    val d = Tables.documents(spark, TestSpark.sf)
      .filter(col("doc_id") % 3 === 0).limit(30)
    val dir = "/tmp/graft_test_schema_dh"
    CacheScope.withScope { Multimodal.writeDHashIndex(d, dir) }
    assertDriftRefused(dir, "hashes")
  }

  test("decon: a drifted grams epoch refuses loudly") {
    val d = Tables.documents(spark, TestSpark.sf)
      .filter(length(col("text")) >= 60)
      .select("doc_id", "text").limit(20)
    val dir = "/tmp/graft_test_schema_dc"
    CacheScope.withScope { TextDedup.writeDeconIndex(d, dir, w = 60) }
    assertDriftRefused(dir, "grams")
  }
}
