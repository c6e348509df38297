package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each table is one parquet file under `sfDir`. At 100 TB these would be
  * multi-file partitioned datasets; `spark.read.parquet(dir)` handles both
  * shapes identically, and all downstream operators rely only on the
  * DataFrame abstraction (partition-parallel scan, predicate pushdown,
  * column pruning all come from the parquet source).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). Reading with an explicit
    * schema that maps the INT64 physical type to LongType sidesteps the
    * logical-type check without any session-wide legacy conf; `ts` arrives
    * as raw epoch nanoseconds (see [[graft.operators.Events]] for the
    * truncating conversion that matches DuckDB's ns→µs read behavior).
    */
  private[graft] val eventsSchema =
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
      "value DOUBLE, props STRING"

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame =
    s.read.schema(eventsSchema).parquet(s"$d/events.parquet")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
