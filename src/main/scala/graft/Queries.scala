package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators._
import graft.sources.CsvSource

/** The operator inventory (SURVEY.md §2) exposed as named queries over the
  * driver testdata, each paired with equivalent DuckDB SQL in [[Oracles]].
  *
  * Column names are aliased identically on both sides (driver hash-compares
  * after sorting columns by name); every query ends in a deterministic
  * ORDER BY; float outputs follow the exact-decimal policy (see
  * [[graft.operators.Stats]]).
  */
object Queries {

  /** Per-job constant `processed_at` (SURVEY.md §7: the reference's
    * per-chunk wall clock is nondeterministic; a job parameter is the
    * deterministic re-expression).
    */
  val RunTs = "2026-01-01T00:00:00Z"

  private def cleaned(s: SparkSession, dir: String): DataFrame =
    TxnTransform.pipeline(RunTs)(TxnView.dirty(s, dir))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E2/P2-P12: the full clean→rules→enrich→project pipeline.
    "q01_pipeline" -> ((s, dir) =>
      cleaned(s, dir).orderBy("transaction_id")),

    // A5: funnel stats over the dirty input (one scan).
    "q02_funnel" -> ((s, dir) =>
      Stats.funnel(TxnView.dirty(s, dir))),

    // S7: deterministic last-writer-wins upsert of two batches.
    "q03_dedup_lww" -> ((s, dir) => {
      val c = cleaned(s, dir)
      val b1 = c.withColumn("batch", lit(1))
      val b2 = c.withColumn("amount", col("amount") + lit(1.0))
        .withColumn("batch", lit(2))
      // Total order: the synthetic lineitem yields duplicate derived ids,
      // so every column participates — a partial order would leave the
      // survivor engine-dependent (SURVEY.md §7 determinism decision).
      Dedup.lastWriterWins(b1.unionByName(b2), Seq("transaction_id"),
          Seq(col("batch").desc, col("user_id"), col("amount"),
            col("ts"), col("status")))
        .orderBy("transaction_id")
    }),

    // A1+A3: count, min/max/avg/sum (decimal-exact sums).
    "q04_table_stats" -> ((s, dir) => Stats.tableStats(cleaned(s, dir))),

    // A2: group-by status counts.
    "q05_status_counts" -> ((s, dir) => Stats.statusCounts(cleaned(s, dir))),

    // A4: integrity validation, one pass.
    "q06_integrity" -> ((s, dir) => Stats.integrity(cleaned(s, dir))),

    // S1+S4: CSV sink then schema'd CSV scan, verified by aggregate parity.
    "q07_csv_roundtrip" -> ((s, dir) => {
      val out = s"/tmp/graft_csv_roundtrip"
      CsvSource.writeCsv(cleaned(s, dir), out)
      val schema = StructType(Seq(
        StructField("transaction_id", StringType),
        StructField("user_id", StringType),
        StructField("amount", DoubleType),
        StructField("ts", StringType),
        StructField("status", StringType),
        StructField("processed_at", StringType)))
      val back = s.read.option("header", "true").schema(schema).csv(out)
      back.agg(
        count(lit(1)).as("n_rows"),
        sum(col("amount").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("sum_amount"),
        countDistinct(col("user_id")).as("n_users"))
    })
  )
}
