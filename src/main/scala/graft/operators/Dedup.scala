package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-based deduplication.
  *
  * The reference gets dedup implicitly from SQLite `INSERT OR REPLACE` on
  * the `transaction_id` primary key (reference: src/core/db_manager.py:135)
  * — last-writer-wins where "last" is thread-completion order, i.e.
  * nondeterministic (reference: src/file_manager.py:131 `as_completed`).
  * We define the survivor deterministically by an explicit total order
  * (SURVEY.md §7): a window `row_number` over the key, ordered by the
  * caller's priority columns plus the key itself as final tiebreak.
  *
  * Scale: one hash-shuffle on the key; AQE handles skewed keys. No
  * collect(), no global sort.
  */
object Dedup {

  /** Keep exactly one row per key: the first under `order` (descending
    * priority columns supplied by the caller, e.g. batch DESC).
    */
  def lastWriterWins(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Aggregation-based last-writer-wins: the survivor is the row whose
    * `orderCols` struct is MAXIMAL (field-by-field, all-descending
    * priority). Plans as a SortAggregate (struct aggregation buffers are
    * not hash-aggregable — verified on the executed plan) but, unlike the
    * window form, runs `partial_max_by` BEFORE the shuffle: duplicate and
    * hot keys collapse map-side, so shuffle volume is bounded by distinct
    * keys — the property that matters for skew at 100 TB.
    *
    * `payload` are the non-key output columns; `orderCols` must be
    * non-null for a total order.
    */
  def lastWriterWinsAgg(df: DataFrame, keys: Seq[String],
      payload: Seq[String], orderCols: Seq[String]): DataFrame = {
    val winner = max_by(
      struct(payload.map(col): _*),
      struct(orderCols.map(col): _*)).as("__w")
    df.groupBy(keys.map(col): _*)
      .agg(winner)
      .select(keys.map(col) ++ payload.map(p => col(s"__w.$p")): _*)
  }

  /** Exact duplicate-group detection by an arbitrary derived key (e.g. a
    * text hash): one row per group with the minimal id as canonical
    * representative plus the group size. Groups of size 1 are unique docs.
    */
  def exactGroups(df: DataFrame, key: Column, idCol: String): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("group_size"))
}
