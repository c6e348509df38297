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
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._

    println("== explicit schema read ==")
    try {
      val ev = spark.read
        .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
        .parquet(s"$dir/events.parquet")
      ev.select(col("ts"), timestamp_micros(expr("ts div 1000")).as("tsx"))
        .show(3, truncate = false)
    } catch { case e: Throwable => println("explicit failed: " + e.getMessage.take(200)) }

    println("== nanosAsLong read ==")
    try {
      val ev = Tables.events(spark, dir)
      ev.printSchema()
      ev.select(col("ts"), timestamp_micros(expr("ts div 1000")).as("tsx"),
          get_json_object(col("props"), "$.k").as("k")).show(3, truncate = false)
      println("count=" + ev.count())
    } catch { case e: Throwable => println("nanosAsLong failed: " + e.getMessage.take(200)) }

    println("== embeddings ==")
    val emb = Tables.embeddings(spark, dir)
    emb.printSchema()
    println("emb=" + emb.count() + " docs=" + Tables.documents(spark, dir).count())
    spark.stop()
  }
}
