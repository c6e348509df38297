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
  * moves the candidate volume: a tail word becomes a false candidate
  * only by colliding with heavy-mass cells in EVERY row (probability
  * ≈ (vocab_heavy/w)^d), so d = 4 with w in the thousands keeps the
  * confirm stream at heavy-hitters + noise. The array is d·w longs
  * (128 KB at defaults) broadcast once — sized small deliberately: the
  * probe reads d cells per occurrence, and the bloom-join measurements
  * (BloomJoin scaladoc) showed per-probe cost jumping ~10× once the
  * broadcast array outgrows cache. Callers with much larger heavy
  * vocabularies raise w; false candidates only ever cost confirm
  * volume, never correctness.
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
  def heavyHitters(words: DataFrame, threshold: Long, w: Int = 4096,
      d: Int = 4): DataFrame = {
    require(threshold >= 1, "threshold must be positive")
    require(w >= 2 && d >= 1, "degenerate sketch dimensions")
    val spark = words.sparkSession
    val pinned = graft.CacheScope.scoped(words.select(col("word")))
    // Dense one-row array WITHOUT per-index map lookups: left-join the
    // cell counts onto the full [0, d·w) domain, sorted-collect, extract
    // positionally. The tempting transform(sequence, i -> element_at(m,
    // i)) form is O((d·w)²) — Spark map element_at is a LINEAR scan, and
    // at d·w = 64k that one task burned 160 s at sf0.1 (bench-caught);
    // this build is n·log n in the sketch size and O(1) in the corpus.
    val cms = spark.range(d.toLong * w).select(col("id").as("cell"))
      .join(pinned
        .select(explode(array(cells(col("word"), w, d): _*)).as("cell"))
        .groupBy(col("cell")).agg(count(lit(1)).as("cnt")),
        Seq("cell"), "left")
      .select(col("cell"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .agg(array_sort(collect_list(struct(col("cell"), col("cnt"))))
        .as("e"))
      .select(transform(col("e"), s => s.getField("cnt")).as("cms"))
    val minEst = least(cells(col("word"), w, d)
      .map(c => element_at(col("cms"), c.cast("int") + 1)): _*)
    pinned
      .join(broadcast(cms), minEst >= threshold, "left_semi")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }
}
