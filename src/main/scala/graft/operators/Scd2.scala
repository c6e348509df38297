package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history build: collapse an event-keyed
  * attribute stream into validity intervals, one row per (entity, attribute
  * run), with change suppression — consecutive observations of the SAME
  * attribute value extend the current version instead of opening a new one.
  *
  * Shape: lag() flags changes, a running sum numbers versions, a group-by
  * collapses runs, lead() closes each interval with the next version's
  * start. All windows are partitioned by entity (no global window); the
  * per-entity row count bounds every sort, and the spans frame the final
  * lead() sees is strictly smaller than the input. One shuffle on entity,
  * reused by every subsequent window and the group-by (Catalyst keeps the
  * child partitioning, so the three window operators share it).
  */
object Scd2 {

  /** Version history of `attr` per `entity`, ordered by (`ts`, `tiebreak`).
    * Output: entity, version (1-based), attr, valid_from, valid_to
    * (null = open), is_current, n_obs (observations in the run).
    */
  def history(df: DataFrame, entity: String, attr: String, ts: String,
      tiebreak: String): DataFrame = {
    val wSeq = Window.partitionBy(col(entity)).orderBy(col(ts), col(tiebreak))
    val versioned = df
      .select(col(entity), col(attr), col(ts), col(tiebreak))
      .withColumn("_prev", lag(col(attr), 1).over(wSeq))
      // null-safe change flag: first row and every value flip open a run
      .withColumn("_chg", when(col("_prev") <=> col(attr), 0).otherwise(1))
      .withColumn("version",
        sum(col("_chg")).over(
          wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
    val spans = versioned
      .groupBy(col(entity), col("version"))
      // attr is constant within a run; min() is the aggregation-shaped
      // way to carry it through the group-by
      .agg(min(col(attr)).as(attr),
        min(col(ts)).as("valid_from"),
        count(lit(1)).as("n_obs"))
    val wVer = Window.partitionBy(col(entity)).orderBy(col("version"))
    spans
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wVer))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col(entity), col("version"))
  }
}
