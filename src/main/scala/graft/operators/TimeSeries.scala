package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Regular-grid time-series operators: resampling onto a dense bucket
  * spine and gap handling — the pandas `resample`/`ffill` surface a
  * metrics or feature pipeline needs before any windowed model sees the
  * data (a missing bucket must be an EXPLICIT zero/carry row, or
  * downstream moving windows silently shrink their denominators).
  *
  * Buckets are exact integer `ts_us DIV busWidth` indices (no calendar
  * functions — the q120 convention), so both engines bucket identically.
  */
object TimeSeries {

  /** Per-`keyCol` series resampled onto the CORPUS-WIDE bucket spine
    * [min bucket, max bucket]: every (key, bucket) cell exists in the
    * output — observed cells carry their count and exact-decimal value
    * sum; empty cells carry n = 0, is_gap = true, and `filled_sum`
    * FORWARD-FILLS the last observed sum (NULL before a key's first
    * observation — a carry must never invent data).
    *
    * Scale shape: one keyed aggregation over the events (map-side
    * combinable), a spine built from |keys| × the 1-row bounds frame
    * (broadcast — the sanctioned q64-style bounds mechanism) with
    * `sequence`/`explode` (never a driver loop), one left join keyed on
    * (key, bucket), and the forward-fill window partitioned per key —
    * no global sort. Spine size is |keys|·|buckets|, the OUTPUT's own
    * cardinality; nothing is corpus-sized but the first aggregation.
    *
    * `filled_sum` copies the decimal-derived double of an earlier row
    * (no fresh float arithmetic), so forward-fill is oracle-exact.
    */
  def resampleFill(ev: DataFrame, keyCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucket width must be positive")
    val bucket = expr(s"ts_us div ${bucketUs}L")
    val observed = ev.groupBy(col(keyCol), bucket.as("bucket_idx"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType)
          .as("sum_value"))
    val bounds = ev.agg(min(bucket).as("b0"), max(bucket).as("b1"))
    val spine = ev.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(sequence(col("b0"), col("b1"))).as("bucket_idx"))
    val fill = Window.partitionBy(col(keyCol)).orderBy(col("bucket_idx"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(observed, Seq(keyCol, "bucket_idx"), "left_outer")
      .select(col(keyCol), col("bucket_idx"),
        coalesce(col("n"), lit(0L)).as("n"),
        (coalesce(col("n"), lit(0L)) === 0L).as("is_gap"),
        last(col("sum_value"), ignoreNulls = true).over(fill)
          .as("filled_sum"))
      .orderBy(col(keyCol), col("bucket_idx"))
  }
}
