package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min-sketch heavy hitters with exact confirm — the frequent-items
  * member of the sketch family (bloom = membership, MinHash/SimHash =
  * similarity, HLL = cardinality, CMS = frequency), wired in the same
  * lossless candidates-then-confirm shape as [[BloomJoin]]/q97.
  *
  * Why not just `groupBy(word).count()`: at 100 TB the distinct-key
  * stream IS the shuffle (web-scale vocabularies are billions of keys,
  * most seen a handful of times), and the partial-aggregation hash maps
  * spill long before the tail is absorbed. The CMS route bounds both
  * sides structurally: the sketch build shuffles AT MOST partitions ×
  * d·w cell rows (map-side combine collapses each partition to its own
  * cell histogram — the sketch's linearity, expressed relationally), and
  * the exact pass shuffles only occurrences of CANDIDATE words — the
  * heavy tail never reaches an exchange.
  *
  * Correctness does not depend on sketch quality: CMS estimates are
  * one-sided (est ≥ true count, always — each counted cell holds the
  * word's full count plus nonnegative collision mass), so the candidate
  * set is a SUPERSET of the true heavy hitters and the exact confirm
  * pass removes every false positive. Identical output to the naive
  * GROUP BY — which is exactly what the q104 oracle proves. Sizing only
  * moves the candidate volume: keep w ≳ a few × N/threshold so expected
  * collision mass per cell (N/w) sits far below the threshold, and d at
  * 4 so a tail word must collide with heavy cells in EVERY row to
  * survive the min (probability (vocab_heavy/w)^d). Defaults hold to
  * ~3M tokens per mille-of-threshold; callers at larger N raise w — the
  * array is d·w longs (512 KB at defaults), broadcast once.
  */
object Sketches {

  /** The d CMS cell indices of a word (flat layout: row i occupies
    * [i·w, (i+1)·w)); row-seeded via the extra hash operand.
    */
  private def cells(word: Column, w: Int, d: Int): Seq[Column] =
    (0 until d).map(i => lit(i.toLong * w) + pmod(xxhash64(word, lit(i)), lit(w.toLong)))

  /** Exact heavy hitters (count ≥ threshold) over a single-column `word`
    * frame, CMS-pruned: build the sketch (one bounded keyed shuffle),
    * broadcast it as one dense array row, probe every occurrence
    * map-side, and exact-count only the survivors. The word frame feeds
    * both passes — pinned per CLAUDE.md's self-join rule.
    */
  def heavyHitters(words: DataFrame, threshold: Long, w: Int = 16384,
      d: Int = 4): DataFrame = {
    require(threshold >= 1, "threshold must be positive")
    require(w >= 2 && d >= 1, "degenerate sketch dimensions")
    val pinned = graft.CacheScope.scoped(words.select(col("word")))
    val cms = pinned
      .select(explode(array(cells(col("word"), w, d): _*)).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("cnt"))
      .agg(map_from_entries(collect_list(struct(col("cell"), col("cnt"))))
        .as("m"))
      .select(transform(sequence(lit(0L), lit(d.toLong * w - 1)),
        i => coalesce(element_at(col("m"), i), lit(0L))).as("cms"))
    val minEst = least(cells(col("word"), w, d)
      .map(c => element_at(col("cms"), c.cast("int") + 1)): _*)
    pinned
      .join(broadcast(cms), minEst >= threshold, "left_semi")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }
}
