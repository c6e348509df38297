package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Scratch probe main for interactive development (not part of the driver
  * contract; run with `sbt 'runMain graft.Dev'`). Writes the probed
  * queries' outputs + oracle_sql.json like Verify, so
  * `tools/check.py <out> <sf> <query...>` gates just the subset.
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = "/tmp/dev_out"
    // args after the sf dir select the probed subset; default = the
    // queries under active development
    val qs: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q126_gopher_rules", "q127_linear_fit")
    new java.io.File(outDir).mkdirs()
    for (q <- qs) {
      println(s"\n======== $q ========")
      val t0 = System.nanoTime()
      val n = CacheScope.withScope {
        val df = Queries.all(q)(spark, dir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$q")
        spark.read.parquet(s"$outDir/$q").count()
      }
      println(f"DEVOK $q: $n rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val json = SparkEntry.oracleSql.filter(kv => qs.contains(kv._1))
      .map { case (k, v) => s"${Verify.jsonEscape(k)}: ${Verify.jsonEscape(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
