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

  /** Raw read schema for the TIMESTAMP(NANOS) fallback: Spark's parquet
    * reader rejects ns-annotated INT64 outright ([PARQUET_TYPE_ILLEGAL]),
    * so that physical layout is read by mapping the INT64 to LongType
    * (raw epoch nanoseconds), sidestepping the logical-type check without
    * any session-wide legacy conf. Only [[events]] may use this — every
    * consumer sees the NORMALIZED frame it returns.
    */
  private[graft] val eventsRawNsSchema =
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
      "value DOUBLE, props STRING"

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** The events table, NORMALIZED: the parquet footer's timestamp unit is
    * detected per read and the frame always arrives as
    * `(event_id, ts TIMESTAMP(µs), user_id, event_type, value, props,
    * ts_us LONG)` — `ts_us` is exact integer epoch microseconds (the
    * engine-portable precision every events oracle uses via DuckDB's
    * `epoch_us`), `ts` is `timestamp_micros(ts_us)`.
    *
    * Unit detection (this is the ONE place a physical time unit exists;
    * no consumer may divide `ts` by anything):
    *  - native probe: `spark.read.parquet` resolves the footer's logical
    *    type — MICROS/MILLIS arrive as TimestampType and `unix_micros`
    *    is exact;
    *  - TIMESTAMP(NANOS) makes that probe THROW (Spark has no ns type),
    *    which identifies the layout: re-read via [[eventsRawNsSchema]]
    *    (raw INT64 ns) and floor-divide ONCE — the same ns→µs truncation
    *    DuckDB applies, so both unit layouts hash identically downstream
    *    (pinned by TimeUnitSpec against hand-written µs and ns fixtures).
    *
    * A 100 TB deployment meets mixed-unit parquet on day one; detecting
    * from the footer (a metadata-only probe, no data scan) instead of
    * assuming a unit is what makes every events-family operator survive a
    * producer-side schema migration.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros, unix_micros}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    // one footer read: the probed frame is REUSED by the typed branches
    val probe = scala.util.Try {
      val df = s.read.parquet(path); (df, df.schema("ts").dataType)
    }
    val withUs = probe match {
      case scala.util.Success((df, TimestampType)) =>
        // isAdjustedToUTC=true MICROS/MILLIS: unix_micros is the exact
        // stored integer (no session-TZ math on UTC-instant timestamps)
        df.withColumn("ts_us", unix_micros(col("ts")))
      case scala.util.Success((df, TimestampNTZType)) =>
        // isAdjustedToUTC=false footer (arrives NTZ under Spark 4's
        // default inference): the NTZ-epoch diff recovers the stored
        // integer TZ-independently — a cast to TimestampType would shift
        // by the session timezone, which DuckDB's naive read does not
        df.withColumn("ts_us", expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"))
      case scala.util.Success((_, other)) =>
        // an unannotated INT64 (or any non-timestamp type) carries NO
        // declared unit — guessing nanos here would be the exact r6
        // failure mode in reverse (an epoch-µs raw long shrunk 1000×).
        // Historical ns files are ANNOTATED (they land in the Failure
        // branch below), so refusing loses nothing.
        throw new IllegalArgumentException(
          s"$path: events.ts has type $other — a parquet TIMESTAMP " +
            "annotation (MICROS/MILLIS/NANOS) is required; refusing to " +
            "guess the physical unit of a raw integer column")
      case scala.util.Failure(e)
          if String.valueOf(e.getMessage).contains("NANOS") =>
        // TIMESTAMP(NANOS) annotation: Spark has no ns type, so the
        // probe throws [PARQUET_TYPE_ILLEGAL] naming the NANOS logical
        // type (message match pinned by TimeUnitSpec) → raw-INT64 read,
        // one floor division — the same ns→µs truncation DuckDB applies
        s.read.schema(eventsRawNsSchema).parquet(path)
          .withColumn("ts_us", expr("ts div 1000"))
      case scala.util.Failure(e) =>
        // any OTHER probe failure (missing file/column, corrupt footer,
        // FS error) is a real error — routing it into the ns read would
        // bury the diagnostic under wrong-looking data
        throw e
    }
    withUs.withColumn("ts", timestamp_micros(col("ts_us")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
