package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the shuffle-volume cut for joins
  * whose build side is too big to broadcast as a hash table but whose
  * BLOOM FILTER is tiny: build an m-bit filter over the dim keys (one
  * map-side-combinable aggregation), broadcast the filter (m/8 bytes),
  * and drop fact rows that cannot join BEFORE the join's exchange. False
  * positives survive the filter and are removed by the exact join, so
  * results are identical to the unfiltered join — which is exactly what
  * the q75 oracle (the plain join) proves. This is the manual form of
  * Spark's runtime row-level filtering; making it an operator lets a
  * pipeline apply it where the optimizer's heuristics decline.
  *
  * SIZING: keep the filter cache-resident. The probe evaluates k
  * element_at reads per fact row against the broadcast bits array, and
  * the measured per-row cost jumps ~10× once the array outgrows L2
  * (2¹⁸ bits = 32 KB fine; 2²⁰ = 128 KB dominated q97's whole runtime,
  * 19 s vs 2 s, same answer). Since false positives only cost exact-join
  * volume — never correctness — the right m is the SMALLEST one whose
  * FPR keeps the confirm join cheap, not the most generous one.
  *
  * Everything is built from codegen'd builtins (xxhash64, shifts, bit
  * ops, bit_or aggregate) — no UDF, no custom expression, no driver-side
  * collect: the filter lives in a one-row DataFrame that a broadcast
  * cross-join delivers to every fact partition.
  *
  * Double hashing (Kirsch–Mitzenmacher): probe_i = h1 + i·h2 mod m, with
  * h1/h2 two independent xxhash64 views of the key (the second salted by
  * a constant extra column). k probes per key.
  */
object BloomJoin {

  /** Second-hash salt (any fixed odd 64-bit constant). */
  private val Salt = -7046029254386353131L // golden-ratio prime, public

  /** probe_i = (h1 + i·h2) mod m with both hashes reduced mod m FIRST:
    * i ≤ k and residues < m keep every intermediate ≪ 2^63 (Spark 4 runs
    * ANSI mode — raw h1 + i·h2 on full-range hashes throws
    * ARITHMETIC_OVERFLOW instead of wrapping).
    */
  private def posSql(keyCol: String, i: Int, mBits: Int): String = {
    val m = s"${mBits.toLong}L"
    s"pmod(pmod(xxhash64($keyCol), $m) + " +
      s"${i}L * pmod(xxhash64($keyCol, ${Salt}L), $m), $m)"
  }

  /** One-row frame with column `bits`: Array[Long] of mBits/64 words over
    * xxhash64 probes of `keyCol`. mBits must be a multiple of 64.
    */
  def bloomBits(dim: DataFrame, keyCol: String, mBits: Int,
      k: Int): DataFrame = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    val nWords = mBits / 64
    val probes = (0 until k).map(i => expr(posSql(keyCol, i, mBits)))
    dim
      .select(explode(array(probes: _*)).as("pos"))
      .select(shiftright(col("pos"), 6).as("w"),
        expr("shiftleft(1L, CAST(pos % 64 AS INT))").as("mask"))
      // word count (mBits/64) bounds this aggregation, not dim size
      .groupBy(col("w")).agg(bit_or(col("mask")).as("word"))
      .agg(map_from_entries(
        collect_list(struct(col("w"), col("word")))).as("m"))
      .select(transform(
        sequence(lit(0L), lit(nWords - 1L)),
        i => coalesce(element_at(col("m"), i), lit(0L))).as("bits"))
  }

  /** Membership predicate over the broadcast `bits` column: all k probe
    * bits set. Pure SQL-expression text so the variable bit shifts stay
    * inside whole-stage codegen.
    */
  def mightContain(bitsCol: String, keyCol: String, mBits: Int,
      k: Int): Column =
    (0 until k).map { i =>
      val p = posSql(keyCol, i, mBits)
      expr(s"((element_at($bitsCol, CAST((($p) >> 6) AS INT) + 1) " +
        s">> CAST(($p) % 64 AS INT)) & 1) = 1")
    }.reduce(_ && _)

  /** Fact rows that may join `dim` on fact.`factKey` = dim.`dimKey`:
    * builds the filter on the dim side, broadcasts it, and prunes the
    * fact BEFORE any exchange. Superset of the true semi-join (no false
    * negatives); follow with the exact join.
    *
    * Delivery is a broadcast LEFT SEMI join whose CONDITION is the probe,
    * not a crossJoin + filter: a semi join emits only the fact-side
    * columns, so the mBits/8-byte bits array is never copied into per-row
    * join output. The crossJoin form materialized fact-rows × (mBits/8)
    * bytes of UnsafeRow copies before the filter could drop the column —
    * measured 14 s → 1 s on the q97 gram stream at mBits = 2²⁰ (128 KB a
    * row, ~1M probe rows). Same plan family (BroadcastNestedLoopJoin,
    * constant-size build side), same result.
    */
  def prune(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, mBits: Int = 1 << 16, k: Int = 5): DataFrame =
    fact.join(broadcast(bloomBits(dim, dimKey, mBits, k)),
      mightContain("bits", factKey, mBits, k), "left_semi")
}
