package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** A thrown query must stay VISIBLE in the record: write a marker
    * result (one `_graft_error` row) so the downstream compare reports a
    * schema-mismatch FAIL for this name instead of the row silently
    * VANISHING from the correctness file — which is how q64's r6
    * regression hid (it threw, no output dir was created, and the
    * driver record simply had no row to flag).
    */
  private[graft] def writeErrorMarker(spark: SparkSession, outDir: String,
      name: String, e: Throwable): Unit =
    try {
      import spark.implicits._
      Seq(Option(e.getMessage).getOrElse(e.getClass.getName))
        .toDF("_graft_error")
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    } catch {
      case t: Throwable =>
        // the marker write itself failing must not be silent — that
        // re-opens the vanishing-row hole the marker exists to close
        System.err.println(
          s"[verify] $name: error-marker write ALSO failed: $t")
    }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    * Shared with [[Dev]]'s subset dump so the two writers cannot drift.
    */
  private[graft] def jsonEscape(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      // withScope: operator-internal caches drop when this query's
      // action completes — release is owner-scoped, see CacheScope
      try CacheScope.withScope {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        writeErrorMarker(spark, outDir, name, e)
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonEscape(k)}: ${jsonEscape(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
