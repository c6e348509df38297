package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-curation operators for training-data pipelines (north-star
  * extension; SURVEY.md §2.5): cross-document boilerplate removal and the
  * filter→score→cap curation funnel. Reference scope: the reference
  * pipeline stops at row-level cleaning (src/core/data_processor.py);
  * these are the corpus-level curation passes a pretraining pipeline runs
  * after it, built in its spirit — declarative, one pass, oracle-checked.
  */
object Curation {

  /** The q100 planted boilerplate: exactly 10 words, so it occupies one
    * full segment in every carrier document (shared with the oracle SQL,
    * which embeds it verbatim).
    */
  val header: String =
    "subscribe now to our newsletter and click here to unsubscribe"

  /** Cross-document boilerplate removal, the CCNet/RefinedWeb "line
    * dedup" pass re-expressed for documents without line structure: split
    * each document into consecutive `segWords`-word segments (the "line"
    * unit), count DISTINCT documents per exact segment, and delete from
    * every document the segments that appear in at least `minDocs`
    * documents — navigation chrome, cookie banners, boilerplate headers —
    * then reassemble the surviving segments in order.
    *
    * Output: (doc_id, clean_text, kept_segments, dropped_segments), one
    * row per input document (a fully-boilerplate document survives with
    * clean_text = '').
    *
    * Shape, and why it scales: segmentation is a pure codegen map
    * (split + transform + slice — no explode); the frequency count is ONE
    * shuffle keyed by segment over exploded (segment, doc) pairs with
    * map-side distinct; and the deletion is map-side — the boilerplate
    * set is collapsed to a single sorted-array row and broadcast, so no
    * second shuffle and no per-doc join. The broadcast is small BY
    * DEFINITION: a segment enters it only by appearing in ≥ minDocs
    * documents, so its size is bounded by total_segments / minDocs — at
    * web scale the true boilerplate tail is thousands of strings, not
    * millions (raise minDocs with corpus size; swap the exact array for
    * [[BloomJoin.bloomBits]] + exact confirm — the q97 construction — if
    * a corpus ever proves otherwise).
    *
    * The segment frame feeds both the frequency count and the final
    * deletion, so it is pinned (CLAUDE.md self-join rule) — otherwise
    * Spark re-runs the segmentation producer on both sides.
    */
  def removeBoilerplate(docs: DataFrame, segWords: Int = 10,
      minDocs: Long = 10): DataFrame = {
    require(segWords >= 1, "segWords must be positive")
    require(minDocs >= 2, "a segment seen once is content, not boilerplate")
    val seg = graft.CacheScope.scoped(docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), transform(
        sequence(lit(0), ((size(col("ws")) - 1) / segWords).cast("int")),
        i => array_join(
          slice(col("ws"), i * segWords + 1, lit(segWords)), " "))
          .as("segs")))
    // one row holding the sorted boilerplate set (empty array if none);
    // sort_array pins the array layout so plans are deterministic
    val bl = seg
      .select(col("doc_id"), explode(col("segs")).as("seg"))
      .groupBy(col("seg"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .agg(sort_array(collect_list(col("seg"))).as("bl"))
    seg
      .crossJoin(broadcast(bl))
      .select(col("doc_id"),
        filter(col("segs"), s => !array_contains(col("bl"), s)).as("kept"),
        size(col("segs")).as("n_segs"))
      .select(col("doc_id"),
        array_join(col("kept"), " ").as("clean_text"),
        size(col("kept")).as("kept_segments"),
        (col("n_segs") - size(col("kept"))).as("dropped_segments"))
  }

  /** The stopword set behind [[gopherRules]]' natural-language tell —
    * shared with the oracle SQL, which embeds it verbatim.
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is")

  /** Gopher-style document-quality rule battery (Rae et al. 2021, App. A
    * — the heuristic pre-filter most pretraining pipelines run before any
    * model-based scoring), re-expressed in EXACT integer arithmetic so
    * the oracle gate hash-matches every rule bit — no float ratios:
    *
    *   - word count within [minWords, maxWords]
    *   - mean word length in [3, 10] chars, as the cross-multiplied
    *     integer bounds 3·n_words ≤ word_chars ≤ 10·n_words
    *   - alphabetic-word fraction ≥ 0.8, as 5·n_alpha ≥ 4·n_words
    *   - ≥ 2 DISTINCT [[stopwords]] present
    *
    * (Gopher's line-shaped rules — bullet-start / ellipsis-end ratios —
    * have no carrier in a corpus without line structure and are omitted;
    * the symbol-ratio rule collapses into the alphabetic-word rule under
    * space tokenization.)
    *
    * Output: one row per document with the rule inputs and the composite
    * `keep` verdict — kept as a profile rather than a filter so the gate
    * pins BOTH verdicts; `.filter(col("keep"))` is the production form.
    *
    * Scale shape: a single narrow codegen map over the corpus — no
    * shuffle, no explode (the alpha and stopword counts ride array
    * `filter`/`array_intersect` on the split tokens); at 100 TB this
    * pass is scan-bound, exactly what a rule battery should be.
    */
  def gopherRules(docs: DataFrame, minWords: Int = 30,
      maxWords: Int = 10000): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords, "nonsensical word bounds")
    val ws = split(col("text"), " ")
    docs
      .select(col("doc_id"),
        size(ws).cast("long").as("n_words"),
        // total in-word chars: drop the separators (space-joined corpus)
        length(translate(col("text"), " ", "")).cast("long")
          .as("word_chars"),
        size(filter(ws, w => w.rlike("^[a-z]+$"))).cast("long")
          .as("n_alpha_words"),
        size(array_intersect(ws, array(stopwords.map(lit): _*)))
          .cast("long").as("n_stop_kinds"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
        lit(3) * col("n_words") <= col("word_chars") &&
        col("word_chars") <= lit(10) * col("n_words") &&
        lit(5) * col("n_alpha_words") >= lit(4) * col("n_words") &&
        col("n_stop_kinds") >= 2)
  }

  /** The curation funnel: language-ID gate + token-length floor + quality
    * scoring + per-source diversity cap — the standard select-the-best-K-
    * per-domain pass that keeps a pretraining mix from being swamped by
    * its largest crawl sources. Composes the gated primitives
    * [[TextFns.langId]] (q22) and [[TextFns.quality]] (q23) rather than
    * re-deriving them.
    *
    * Output: survivors only — (doc_id, source, predicted_lang,
    * quality_score, q_rank) with q_rank ≤ capPerSource, ranked by quality
    * within source (doc_id tiebreak pins tied doubles).
    *
    * Scale: scoring is a pure codegen map; the only shuffle is the
    * per-source ranking window, partitioned by source — never a global
    * sort. A top-K per group never needs the full sort either: Spark
    * applies rank-limit pushdown, and a skewed mega-source is bounded by
    * per-partition pre-filtering (each map task can locally drop rows
    * beyond its own top-K before the exchange).
    */
  def curateCorpus(docs: DataFrame, minTokens: Int = 30,
      capPerSource: Int = 10): DataFrame = {
    require(minTokens >= 0 && capPerSource >= 1, "nonsensical funnel bounds")
    val ws = split(col("text"), " ")
    val scored = docs
      .select(col("doc_id"), col("source"),
        TextFns.langId(ws).getField("predicted_lang").as("predicted_lang"),
        TextFns.quality(col("text"), ws).as("q"))
      .select(col("doc_id"), col("source"), col("predicted_lang"),
        col("q.n_tokens").as("n_tokens"),
        col("q.quality_score").as("quality_score"))
      .filter(col("predicted_lang") =!= "unknown" &&
        col("n_tokens") >= minTokens)
    scored
      .withColumn("q_rank", row_number().over(Window
        .partitionBy(col("source"))
        .orderBy(col("quality_score").desc, col("doc_id"))))
      .filter(col("q_rank") <= capPerSource)
      .drop("n_tokens")
  }
}
