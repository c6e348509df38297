package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main for interactive development (not part of the driver
  * contract; run with `sbt 'runMain graft.Dev'`).
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
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q116_streaming_restart")) {
      println(s"\n======== $q ========")
      val t0 = System.nanoTime()
      val n = CacheScope.withScope { Queries.all(q)(spark, dir).count() }
      println(f"DEVOK $q: $n rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
