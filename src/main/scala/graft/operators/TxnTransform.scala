package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The reference's per-chunk transform (reference:
  * src/data_processor.py:145-186) as composable `DataFrame => DataFrame`
  * operators. Catalyst fuses the whole chain into one WholeStageCodegen
  * stage over the scan — there is no per-chunk loop, no thread pool, no
  * intermediate materialization (SURVEY.md E2).
  *
  * Deliberate semantic decisions (SURVEY.md §7 "hard parts"):
  *  - null status becomes "unknown" (the reference's `fillna` is dead code
  *    behind `astype(str)` and accidentally produces "nan"; we implement
  *    the documented intent — reference: src/data_processor.py:61);
  *  - the cancelled filter trims before comparing (the reference compares
  *    untrimmed then trims later, letting " CANCELLED " rows survive as
  *    "cancelled" in the output — reference: src/data_processor.py:96 vs
  *    :120; we filter on the normalized value);
  *  - `processed_at` is one per-JOB constant passed in (deterministic),
  *    not per-chunk wall clock (reference: src/data_processor.py:123-124).
  */
object TxnTransform {

  val keyCols: Seq[String] = Seq("transaction_id", "user_id")
  val outputCols: Seq[String] =
    Seq("transaction_id", "user_id", "amount", "ts", "status", "processed_at")

  /** P2-P5: drop null keys, coerce amount string→double (unparseable →
    * null → dropped), default null status to "unknown".
    * `try_cast` (not `cast`) because Spark 4 runs ANSI mode by default,
    * where a failed numeric cast throws instead of yielding null.
    */
  def clean(df: DataFrame): DataFrame =
    df.na.drop("any", keyCols)
      .withColumn("amount", expr("try_cast(amount AS DOUBLE)").cast(DoubleType))
      .filter(col("amount").isNotNull)
      .withColumn("status", coalesce(col("status"), lit("unknown")))

  /** P6-P7: business rules — non-negative amounts, no cancelled rows
    * (case-insensitive, padding-insensitive).
    */
  def businessRules(df: DataFrame): DataFrame =
    df.filter(col("amount") >= 0)
      .filter(lower(trim(col("status"))) =!= "cancelled")

  /** P8-P11: normalize status, round amount to 2 dp, stamp `processed_at`
    * with the per-job constant.
    */
  def enrich(runTs: String)(df: DataFrame): DataFrame =
    df.withColumn("status", lower(trim(col("status"))))
      .withColumn("amount", round(col("amount"), 2))
      .withColumn("processed_at", lit(runTs))

  /** P12: canonical projection / column order. */
  def project(df: DataFrame): DataFrame =
    df.select(outputCols.map(col): _*)

  /** E2: the full per-row transform, fused lazily by Catalyst. */
  def pipeline(runTs: String)(df: DataFrame): DataFrame =
    (clean _).andThen(businessRules).andThen(enrich(runTs)).andThen(project)(df)
}
