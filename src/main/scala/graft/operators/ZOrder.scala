package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional data-skipping
  * primitive: sort-by-one-column clusters min/max file stats on that column
  * only; sorting by the bit-interleaved code of TWO columns clusters both
  * at once, so parquet footer pruning cuts scans for predicates on either
  * dimension. This is the layout trick behind Delta/Iceberg `ZORDER BY`.
  *
  * The code is built purely from shiftright/shiftleft/AND/OR over integral
  * columns — whole-stage-codegen'd builtins, no UDF, and bit-identical in
  * any engine (the DuckDB oracle evaluates the same expression). Inputs
  * must be non-negative and fit in `bits` bits; quantize first (e.g.
  * `floor(price / 256)` — FLOOR before the integral cast, per the float
  * policy).
  */
object ZOrder {

  /** Morton code interleaving the low `bits` bits of x (even positions)
    * and y (odd positions). x and y must be integral, in [0, 2^bits).
    */
  def zval(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The same interleave as ANSI SQL text, for the oracle side. */
  def zvalSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")

  /** Physically cluster `df` on the curve: range-partition by the z value
    * (so each output file owns one contiguous curve segment = one small
    * rectangle in (x, y) space) and sort within partitions (so row groups
    * subdivide it further). Write the result with any sink; parquet
    * min/max stats then prune on BOTH source columns.
    */
  def clusterByZ(df: DataFrame, z: Column, numPartitions: Int): DataFrame =
    df.withColumn("_z", z)
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
}
