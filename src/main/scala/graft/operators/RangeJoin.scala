package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch band (range) self-join: all pairs of events from the same key
  * within a time band — the batch form of the q72 streaming interval
  * join, and the canonical "join on closeness, not equality" problem
  * (sessions, co-occurrence, sensor correlation).
  *
  * Written naively (`a.ts BETWEEN b.ts AND b.ts + band` with no equality
  * conjunct beyond the key) Spark plans an inequality theta-join: with a
  * non-broadcastable side that is BroadcastNestedLoopJoin or a sort-merge
  * whose range predicate degenerates per key — per-key O(n²) comparisons
  * on a skewed key. The scale form here turns the band into an EQUI-join:
  * bucket time by the band width W, emit each LEFT row into its own
  * bucket and the next (a 2× dup, constant factor), keep each RIGHT row
  * in its own bucket, hash-join on (key, bucket), and apply the exact
  * band predicate inside the join. For the time-ordered pair (a, b) with
  * 0 ≤ t_b − t_a ≤ band ≤ W, b's bucket is a's or the one after, and b
  * lives in exactly ONE bucket — so every qualifying pair is found, and
  * found exactly once (no dedup pass). One shuffle, keyed, map-side
  * prunable, AQE-splittable on skew.
  */
object RangeJoin {

  /** Interval OVERLAP self-join: all pairs of same-key intervals that
    * intersect (closed ends; point-touch counts, overlap_us = 0) — the
    * interval×interval generalization of the point band join below, under
    * the same bucketing discipline. Precondition: every interval's length
    * is ≤ `maxLenUs` (enforced; the bound is what makes the bucket
    * scheme exact). Expects (key, id, s, e) with µs endpoints; output
    * (key, id_a, id_b, overlap_us), id_a < id_b.
    *
    * Bucket width W = maxLenUs, so an interval spans at most TWO buckets
    * (bounded 2× dup — no data-dependent explode). Overlapping pairs
    * share the bucket of their overlap's START (greatest(s_a, s_b) lies
    * inside both intervals), so the join matches there; the attribution
    * predicate `bkt = greatest(s_a, s_b) div W` kills every other shared
    * bucket — each qualifying pair lands exactly once, no dedup pass.
    * One keyed equi-shuffle; the naive form is a per-key O(n²)
    * inequality theta-join.
    */
  def overlapJoin(intervals: DataFrame, maxLenUs: Long): DataFrame = {
    require(maxLenUs >= 1, "max interval length must be positive")
    // the bound is a correctness premise, so violations must be LOUD —
    // a silent filter would quietly change the join's semantics. The
    // assert threads through a USED column (a free-standing check column
    // would be pruned away and never run).
    val base = graft.CacheScope.scoped(intervals
      .select(col("key"), col("id"),
        when(assert_true(col("e") >= col("s") &&
            col("e") - col("s") <= lit(maxLenUs),
          concat(lit("overlapJoin premise: interval length outside [0, maxLen]: "),
            col("id"))).isNull, col("s")).as("s"),
        col("e")))
    val left = base
      .select(col("key"), col("id").as("id_a"), col("s").as("sa"),
        col("e").as("ea"))
      .withColumn("bkt", explode(sequence(
        expr(s"sa div ${maxLenUs}L"), expr(s"ea div ${maxLenUs}L"))))
    val right = base
      .select(col("key").as("k_r"), col("id").as("id_b"),
        col("s").as("sb"), col("e").as("eb"))
      .withColumn("bkt_r", explode(sequence(
        expr(s"sb div ${maxLenUs}L"), expr(s"eb div ${maxLenUs}L"))))
    left
      .join(right, col("key") === col("k_r") &&
        col("bkt") === col("bkt_r"))
      .filter(col("id_a") < col("id_b") &&
        col("sa") <= col("eb") && col("sb") <= col("ea") &&
        col("bkt") === expr(s"greatest(sa, sb) div ${maxLenUs}L"))
      .select(col("key"), col("id_a"), col("id_b"),
        (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb")))
          .as("overlap_us"))
  }

  /** All same-user event pairs within `bandUs` microseconds, time-ordered
    * (event_id tiebreak on equal timestamps). Expects the NORMALIZED
    * `events` frame ([[graft.Tables.events]]; `ts_us` is exact integer
    * epoch-µs regardless of the file's physical unit).
    * Output: (user_id, id_a, id_b, delta_us), a ≺ b.
    *
    * The µs frame feeds both join sides — pinned per CLAUDE.md's
    * self-join rule so the scan/projection runs once.
    */
  def selfBandJoin(events: DataFrame, bandUs: Long): DataFrame = {
    require(bandUs >= 1, "band must be positive")
    val base = graft.CacheScope.scoped(events
      .select(col("user_id"), col("event_id"),
        col("ts_us").as("tu")))
    val left = base
      .select(col("user_id"), col("event_id").as("id_a"), col("tu").as("ta"))
      .withColumn("bkt",
        explode(array(expr(s"ta div ${bandUs}L"),
          expr(s"ta div ${bandUs}L") + 1)))
    val right = base
      .select(col("user_id").as("u_r"), col("event_id").as("id_b"),
        col("tu").as("tb"))
      .withColumn("bkt_r", expr(s"tb div ${bandUs}L"))
    left
      .join(right, col("user_id") === col("u_r") &&
        col("bkt") === col("bkt_r"))
      .filter((col("ta") < col("tb") ||
        (col("ta") === col("tb") && col("id_a") < col("id_b"))) &&
        col("tb") - col("ta") <= bandUs)
      .select(col("user_id"), col("id_a"), col("id_b"),
        (col("tb") - col("ta")).as("delta_us"))
  }
}
