package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types.TimestampType

/** Pins [[Tables.events]]'s footer-driven time-unit detection: the SAME
  * logical rows written as TIMESTAMP(NANOS) (the layout Spark's native
  * reader rejects → raw-INT64 fallback), TIMESTAMP(MICROS) adjusted and
  * unadjusted (NTZ — the current testdata layout), and TIMESTAMP(MILLIS)
  * must all normalize to identical `(ts TIMESTAMP(µs), ts_us LONG)` — the
  * unit lives in exactly one place and a producer-side unit migration
  * cannot change a single downstream answer. Fixtures are written with
  * parquet-mr directly (Spark cannot write ns), sub-µs noise included so
  * the ns path's floor division is exercised, not just the happy scale.
  */
class TimeUnitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (event_id, ts in epoch NANOS, user_id, event_type, value, props);
  // rows 2 and 3 carry sub-µs residue the ns read must floor away
  private val rows = Seq(
    (1L, 1700000000000000000L, 7L, "click", 1.5, """{"k":1}"""),
    (2L, 1700000000123456789L, 7L, "view", 2.0, null: String),
    (3L, 1700003600999999999L, 8L, "purchase", 0.0, """{"k":2}"""))

  private def writeFixture(dir: String, unit: TimeUnit,
      adjustedToUtc: Boolean): String = {
    val root = java.nio.file.Paths.get(dir)
    graft.streaming.EventStreams.deleteStagingForTest(root)
    java.nio.file.Files.createDirectories(root)
    val schema = Types.buildMessage()
      .addField(Types.optional(PrimitiveTypeName.INT64).named("event_id"))
      .addField(Types.optional(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(adjustedToUtc, unit))
        .named("ts"))
      .addField(Types.optional(PrimitiveTypeName.INT64).named("user_id"))
      .addField(Types.optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.optional(PrimitiveTypeName.DOUBLE).named("value"))
      .addField(Types.optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props"))
      .named("events")
    val w = ExampleParquetWriter.builder(new Path(s"$dir/events.parquet"))
      .withType(schema).build()
    val fac = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, tsNs, uid, et, v, props) =>
      val tsVal = unit match {
        case TimeUnit.NANOS  => tsNs
        case TimeUnit.MICROS => tsNs / 1000L
        case TimeUnit.MILLIS => tsNs / 1000000L
      }
      val g = fac.newGroup()
      g.append("event_id", id)
      g.append("ts", tsVal)
      g.append("user_id", uid)
      g.append("event_type", et)
      g.append("value", v)
      if (props != null) g.append("props", props)
      w.write(g)
    } finally w.close()
    dir
  }

  private def normalized(dir: String): Seq[(Long, Long, Long, String,
      Double, Option[String])] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"$dir: ts must always arrive as µs TimestampType")
    df.select("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .as[(Long, Long, Long, String, Double, Option[String])]
      .collect().toSeq.sortBy(_._1)
  }

  test("ns, µs (NTZ and UTC), and ms annotated events files normalize " +
      "to identical (ts, ts_us) through Tables.events") {
    val expectUs = rows.map { case (id, tsNs, uid, et, v, props) =>
      (id, tsNs / 1000L, uid, et, v, Option(props))
    }
    val ns = writeFixture("/tmp/graft_unit_ns", TimeUnit.NANOS,
      adjustedToUtc = true)
    val usNtz = writeFixture("/tmp/graft_unit_us_ntz", TimeUnit.MICROS,
      adjustedToUtc = false) // the current testdata layout
    val usUtc = writeFixture("/tmp/graft_unit_us_utc", TimeUnit.MICROS,
      adjustedToUtc = true)
    assert(normalized(ns) == expectUs,
      "ns fallback path must floor to the same µs integers")
    assert(normalized(usNtz) == expectUs,
      "NTZ µs path must recover the stored integers TZ-independently")
    assert(normalized(usUtc) == expectUs,
      "adjusted-µs path must be exact")

    // MILLIS: native TimestampType read, unix_micros exact at ms grain
    val ms = writeFixture("/tmp/graft_unit_ms", TimeUnit.MILLIS,
      adjustedToUtc = true)
    val expectMs = rows.map { case (id, tsNs, uid, et, v, props) =>
      (id, tsNs / 1000000L * 1000L, uid, et, v, Option(props))
    }
    assert(normalized(ms) == expectMs)
  }

  test("the NANOS fallback is routed by the probe's error message (the " +
      "match Tables.events keys on), and a raw-INT64 ts refuses loudly") {
    // pin the native-probe failure shape for an ns-annotated footer:
    // the message must name the NANOS logical type, or the fallback
    // match in Tables.events would silently stop routing
    writeFixture("/tmp/graft_unit_ns", TimeUnit.NANOS, adjustedToUtc = true)
    val e = intercept[Throwable] {
      spark.read.parquet("/tmp/graft_unit_ns/events.parquet").schema
    }
    assert(String.valueOf(e.getMessage).contains("NANOS"),
      s"probe failure no longer names NANOS: ${e.getMessage}")

    // an UNANNOTATED INT64 ts has no declared unit: Tables.events must
    // refuse (guessing nanos would be the r6 failure mode in reverse)
    val raw = java.nio.file.Paths.get("/tmp/graft_unit_rawlong")
    graft.streaming.EventStreams.deleteStagingForTest(raw)
    java.nio.file.Files.createDirectories(raw)
    rows.map { case (id, tsNs, uid, et, v, props) =>
      (id, tsNs / 1000L, uid, et, v, props)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite")
      .parquet("/tmp/graft_unit_rawlong/events.parquet")
    val r = intercept[IllegalArgumentException] {
      Tables.events(spark, "/tmp/graft_unit_rawlong").collect()
    }
    assert(r.getMessage.contains("refusing to guess"))
  }

  test("a unit-migrated producer changes no event-operator answer: " +
      "hourly rollup over the ns and µs fixtures is identical") {
    import org.apache.spark.sql.functions.col
    val a = operators.Events.rollup(
      Tables.events(spark, "/tmp/graft_unit_ns"), "hour")
      .collect().toSeq
    val b = operators.Events.rollup(
      Tables.events(spark, "/tmp/graft_unit_us_ntz"), "hour")
      .collect().toSeq
    assert(a == b && a.nonEmpty)
    assert(a.map(_.getLong(2)).sum == rows.size)
  }
}
