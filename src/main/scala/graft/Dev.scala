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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val (clean, corrupt) = graft.sources.CsvSource.splitCorrupt(
      graft.sources.CsvSource.readTxnCsv(spark,
        "src/test/resources/txn_malformed.csv"))
    println("== clean rows ==")
    clean.show(30, truncate = false)
    println("== corrupt rows ==")
    corrupt.show(30, truncate = false)
    println(s"clean=${clean.count()} corrupt=${corrupt.count()}")
    val piped = graft.operators.TxnTransform.pipeline(Queries.RunTs)(
      clean.withColumnRenamed("ts", "ts"))
    piped.show(30, truncate = false)
    println("piped=" + piped.count())
    spark.stop()
  }
}
