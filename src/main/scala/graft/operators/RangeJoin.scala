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

  /** All same-user event pairs within `bandUs` microseconds, time-ordered
    * (event_id tiebreak on equal timestamps). Expects the raw `events`
    * frame ([[graft.Tables.events]]; `ts` is epoch NANOS — truncated to µs
    * here, the same floor DuckDB applies reading TIMESTAMP(NANOS)).
    * Output: (user_id, id_a, id_b, delta_us), a ≺ b.
    *
    * The µs frame feeds both join sides — pinned per CLAUDE.md's
    * self-join rule so the scan/projection runs once.
    */
  def selfBandJoin(events: DataFrame, bandUs: Long): DataFrame = {
    require(bandUs >= 1, "band must be positive")
    val base = graft.CacheScope.scoped(events
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("tu")))
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
