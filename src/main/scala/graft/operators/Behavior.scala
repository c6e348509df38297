package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over the normalized events frame
  * (north-star §2.5 event-stream family; complements Events.rollup /
  * sessionize with the three classic product-analytics shapes: ordered
  * funnels, cohort retention, and adjacent-pair sequence patterns).
  *
  * All inputs are the [[graft.Tables.events]] normalized frame — time
  * arithmetic is on the exact integer `ts_us` only (the float-free
  * convention every events oracle shares via DuckDB's `epoch_us`).
  *
  * Scale shape: every aggregation and join in this file is keyed on
  * `user_id` — one logical hash-partitioning that Spark reuses across
  * the chained per-step joins (same-key exchanges collapse under AQE),
  * and the per-step / per-cohort frames are ≤ |users| rows, so each
  * follow-up join's build side is tiny relative to the event scan.
  * Nothing here sorts globally or collects — deterministic output
  * ORDER BYs live in the gate-query layer (Queries.scala), not here.
  */
object Behavior {

  /** Ordered conversion funnel: step 1 is reached at a user's FIRST
    * `steps(0)` event; step k+1 at the first `steps(k)` event STRICTLY
    * AFTER the user's step-k time (the standard product-analytics
    * semantics — a purchase logged before the click does not convert).
    *
    * Output: one row per step — `(step, event_type, n_users,
    * total_lag_us)`, where `total_lag_us` sums (t_step − t_first) over
    * the users who reached the step (exact integer µs; 0 for step 1).
    *
    * One events scan per step, each filtered to that step's type at the
    * source (predicate pushdown keeps the scans narrow); the chained
    * min-aggregations all shuffle on `user_id`.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = graft.CacheScope.scoped(
      events.select(col("user_id"), col("event_type"), col("ts_us")))
    // every reach frame is scoped-cached: each is consumed by the NEXT
    // step's join AND by its own output row (and `first` by every row's
    // t1 join) — uncached, the chained lineages would re-execute every
    // earlier step per consumer (the CLAUDE.md iterative-lineage rule)
    val first = graft.CacheScope.scoped(
      e.filter(col("event_type") === steps.head)
        .groupBy("user_id").agg(min(col("ts_us")).as("t")))
    // reachTimes(k): (user_id, t) for users who reached step k+1
    val reachTimes = steps.tail.scanLeft(first) { (prev, step) =>
      graft.CacheScope.scoped(
        e.filter(col("event_type") === step)
          .join(prev.select(col("user_id"), col("t").as("_prev_t")),
            "user_id")
          .filter(col("ts_us") > col("_prev_t"))
          .groupBy("user_id").agg(min(col("ts_us")).as("t")))
    }
    val t1 = first.select(col("user_id"), col("t").as("_t1"))
    reachTimes.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.join(t1, "user_id")
        .agg(count(lit(1)).as("n_users"),
          coalesce(sum(col("t") - col("_t1")), lit(0L)).cast("long")
            .as("total_lag_us"))
        .select(lit(i + 1).as("step"), lit(step).as("event_type"),
          col("n_users"), col("total_lag_us"))
    }.reduce(_ unionAll _)
  }

  /** Cohort retention matrix: users bucketed by FIRST-ACTIVE day (their
    * cohort), counted on every (cohort_day, day_offset) cell where they
    * were active again. Day index = `ts_us div 86400000000` — exact
    * integer UTC-day arithmetic, no calendar/timezone functions, so any
    * engine reproduces the identical matrix.
    *
    * Two keyed aggregations (per-(user, day) distinct → per-user min)
    * plus one user-keyed join; the distinct frame is ≤ users × active
    * days, already tiny relative to raw events.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val d = graft.CacheScope.scoped(
      events.select(col("user_id"),
        expr("ts_us div 86400000000").as("day_idx")).distinct())
    val cohort = d.groupBy("user_id").agg(min(col("day_idx")).as("cohort_day"))
    d.join(cohort, "user_id")
      // d is distinct per (user, day) ⇒ count(*) counts users exactly
      .groupBy(col("cohort_day"),
        (col("day_idx") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Adjacent-pair sequence pattern (the MATCH_RECOGNIZE-lite shape):
    * per user, count occurrences of a `first` event IMMEDIATELY followed
    * — next event in the user's (ts_us, event_id)-ordered timeline — by
    * a `second` event within `maxGapUs`. Output: `(user_id, n_matches,
    * total_gap_us)` for users with ≥ 1 match.
    *
    * One user-partitioned window (lead), one keyed aggregation; the
    * event_id tiebreak makes the timeline — and therefore the match set
    * — deterministic under equal timestamps.
    */
  def adjacentPattern(events: DataFrame, first: String, second: String,
      maxGapUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    events.select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us"))
      .withColumn("_next_type", lead(col("event_type"), 1).over(w))
      .withColumn("_next_us", lead(col("ts_us"), 1).over(w))
      .filter(col("event_type") === first && col("_next_type") === second &&
        col("_next_us") - col("ts_us") <= maxGapUs)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_matches"),
        sum(col("_next_us") - col("ts_us")).cast("long").as("total_gap_us"))
  }
}
