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
    for (q <- Seq("q01_pipeline", "q11_region_revenue", "q12_priority_agg",
        "q24_ann_topk", "q26_neardup_lsh")) {
      println(s"\n======== $q ========")
      println(Queries.all(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
