package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level MERGE INTO — the fine-grained upsert complement to q73's
  * partition-overwrite upsert (which replaces whole partitions).
  *
  * ANSI MERGE semantics over a changes feed carrying a tombstone flag:
  *   - change matches a target key, tombstone      → row deleted
  *   - change matches a target key, not tombstone  → payload updated
  *   - change matches nothing, not tombstone       → row inserted
  *   - change matches nothing, tombstone           → no-op (delete of
  *     an absent key)
  *   - target row with no change                   → kept as-is
  *
  * Matched-ness is decided by the join itself (not by the feed's claim),
  * in ONE full-outer shuffle join keyed on the merge key. At lake scale
  * the standard refinement is file-level pruning before the join (join
  * the changes against parquet footer min/max to rewrite only touched
  * files — the Delta/Iceberg MERGE path); the row-level semantics here
  * are exactly what that refinement preserves. AQE handles the skewed
  * key case; the changes side is typically ≪ target, and Spark's
  * full-outer SortMergeJoin only shuffles each side once.
  */
object Merge {

  /** Merge `changes` into `target` on `key`.
    *
    * `changes` must carry `key`, the same `payload` columns as `target`,
    * and a boolean `tombstone` column. Output: `key`, merged `payload`,
    * and an `action` column (keep/update/insert) — deleted rows are gone.
    */
  def mergeInto(target: DataFrame, changes: DataFrame, key: String,
      payload: Seq[String], tombstone: String = "tombstone"): DataFrame = {
    // Presence markers: payload columns may be legitimately null, so
    // matched-ness hangs on explicit flags, not on payload nullness.
    val t = target.select(
      (col(key) +: payload.map(col)) :+ lit(true).as("_t_present"): _*)
    val c = changes.select(
      (col(key) +: payload.map(p => col(p).as(s"_c_$p"))) ++
        Seq(col(tombstone).as("_c_tomb"), lit(true).as("_c_present")): _*)

    val matched = col("_t_present").isNotNull && col("_c_present").isNotNull
    val takeChange: String => Column = p =>
      when(col("_c_present").isNotNull, col(s"_c_$p")).otherwise(col(p)).as(p)

    t.join(c, Seq(key), "full_outer")
      // deletes: matched tombstones drop the row; unmatched tombstones
      // are no-ops and drop with them (they carry no insertable payload).
      .filter(!coalesce(col("_c_tomb"), lit(false)))
      .select(
        (col(key) +: payload.map(takeChange)) :+
          when(matched, lit("update"))
            .when(col("_t_present").isNull, lit("insert"))
            .otherwise(lit("keep")).as("action"): _*)
  }
}
