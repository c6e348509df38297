package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic subsampling operators for training-data pipelines
  * (north-star extension; complements q61's deterministic split).
  *
  * [[stratifiedTopK]] draws a REPRODUCIBLE fixed-size sample per stratum:
  * the k rows with the smallest portable hash of their id. Same
  * multiplicative-hash residue arithmetic as the train/val/test split —
  * overflow-safe in BIGINT, identical in any engine, so the DuckDB oracle
  * recomputes the exact same sample. This is the "give me 10k docs per
  * language, same ones every run" primitive.
  *
  * Scale shape: a naive `row_number over (partition by stratum order by
  * hash)` shuffles EVERY row to its stratum's window — with few strata
  * that is a handful of giant single-task sorts at 100 TB. Here a first
  * top-k over (stratum, input-partition-id) runs on a key space of
  * strata × partitions — the exchange is well spread, no giant stratum
  * task exists, and each task sorts only its slice — so the exact
  * per-stratum window in phase 2 sorts at most k × partitions surviving
  * rows. Survivor volume is independent of data size; the stratum window
  * stops being a scale hazard.
  */
object Sampling {

  /** Portable sample-order hash (see q61): bounded residues, BIGINT-safe. */
  private def portableHash(idCol: Column): Column =
    pmod((pmod(idCol, lit(100003L)) * lit(2654435761L)), lit(1000000007L))

  /** The k rows of each stratum with the smallest (hash, id) order key.
    * Output: stratum column, id column, `sample_rank` (1..k).
    */
  def stratifiedTopK(df: DataFrame, stratumCol: String, idCol: String,
      k: Int): DataFrame = {
    val h = portableHash(col(idCol))
    val wLocal = Window.partitionBy(col(stratumCol), col("_pid"))
      .orderBy(h, col(idCol))
    val wGlobal = Window.partitionBy(col(stratumCol)).orderBy(h, col(idCol))
    df.select(col(stratumCol), col(idCol))
      .withColumn("_pid", spark_partition_id())
      // phase 1: pruning over the (stratum, partition-id) key space —
      // survivors ≤ k per cell, every task sorts only its own slice
      .withColumn("_lrn", row_number().over(wLocal))
      .filter(col("_lrn") <= k)
      .drop("_pid", "_lrn")
      // phase 2: exact global rank over the pruned survivors
      .withColumn("sample_rank", row_number().over(wGlobal).cast("int"))
      .filter(col("sample_rank") <= k)
      .orderBy(asc_nulls_first(stratumCol), col("sample_rank"))
  }
}
