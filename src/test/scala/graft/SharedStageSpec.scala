package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** SharedStage's contract: identity when reuse is off (the Verify /
  * correctness-gate path), exact parquet roundtrip + build-once when the
  * bench opts in, and a fresh key always rebuilds.
  */
class SharedStageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parquetOnce is the identity when reuse is off") {
    val df = Seq((1L, 2L, 0), (3L, 4L, 1)).toDF("id_a", "id_b", "edit_dist")
    assert(!java.lang.Boolean.getBoolean("graft.stage.reuse"),
      "suite premise: tests run with reuse OFF")
    val out = SharedStage.parquetOnce(df, "/tmp/graft_test_sharedstage_id",
      "k1")
    assert(out eq df, "reuse-off must return the frame untouched")
  }

  test("under reuse, the stage builds once per key and later callers " +
      "see the identical row set") {
    val dir = "/tmp/graft_test_sharedstage_reuse"
    graft.streaming.EventStreams.deleteStagingForTest(
      java.nio.file.Paths.get(dir))
    System.setProperty("graft.stage.reuse", "true")
    try {
      var builds = 0
      def stage() = {
        val df = Seq((1L, 2L, 1), (5L, 9L, 2)).toDF("id_a", "id_b",
          "edit_dist")
        // count builds through buildOnce directly (parquetOnce rides it)
        SharedStage.buildOnce(dir, "pairs|v1") {
          builds += 1
          df.write.mode("overwrite").parquet(s"$dir/data")
        }
        spark.read.parquet(s"$dir/data")
      }
      val first = stage().as[(Long, Long, Int)].collect().toSet
      val second = stage().as[(Long, Long, Int)].collect().toSet
      assert(builds == 1, "same (JVM, key) must build exactly once")
      assert(first == second && first == Set((1L, 2L, 1), (5L, 9L, 2)))
      // a DIFFERENT key never reuses the old artifact
      SharedStage.buildOnce(dir, "pairs|v2") { builds += 1 }
      assert(builds == 2, "a changed key must rebuild")
    } finally System.clearProperty("graft.stage.reuse")
  }
}
