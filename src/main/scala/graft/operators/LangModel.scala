package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained MLE bigram language-model scoring — the classic cheap
  * fluency/quality signal of a data-curation pipeline ("how typical is
  * this document of the corpus it sits in"; KenLM-style filters are this
  * plus smoothing). North-star extension next to [[TfIdf]] and [[Bm25]].
  *
  * Per adjacent token pair (w1, w2) the conditional MLE is
  * P(w2|w1) = c(w1,w2) / c(w1,·), and a document's score is the sum over
  * its bigram INSTANCES of floor(10⁶ · c(w1,w2) / c(w1,·)) — one integral
  * floor DIV per instance, so the score is exact BIGINT arithmetic any
  * engine reproduces bit-for-bit (the log-probability form would not be:
  * `ln` is not cross-engine bit-stable — same policy as TfIdf/Bm25).
  * Summing floors instead of flooring a sum keeps every intermediate
  * bounded by 10⁶ · n_bigrams.
  *
  * Scale shape: bigrams come from zipping each token array with its own
  * tail — a per-row map, ONE tokenize pass. The model counts c(w1,w2) are
  * a map-combinable aggregation; c(w1,·) is derived FROM c(w1,w2) by a
  * second (vocabulary-sized) aggregation, so raw bigrams are aggregated
  * once. Model size is O(vocab²) — broadcast to the scoring join (for a
  * web-scale vocabulary swap the broadcast for a shuffle join on w1,w2;
  * the derivation is unchanged). The per-doc score aggregation is the
  * only data-sized shuffle.
  */
object LangModel {

  /** Within-document REPETITION metric (Gopher-style quality rule "drop
    * docs whose duplicate n-gram fraction exceeds θ"): per doc,
    * dup_ppm = ⌊10⁶ · (n_grams − n_distinct_grams) / n_grams⌋ over word
    * n-grams. Integer-exact (one floor DIV), so oracle-gateable; the
    * complement of the CORPUS-level dedup family — it catches a doc that
    * repeats ITSELF (looping generation, boilerplate stutter), which no
    * inter-document comparison sees.
    *
    * Scale shape: the gram generator is a pure codegen map
    * (transform/sequence/concat_ws — same generator as
    * [[TextDedup.ngramDecontaminate]]); one (doc, gram) aggregation with
    * map-side distinct partials. Docs with fewer than n tokens have no
    * gram and are absent (structurally incapable of repetition at that
    * order).
    *
    * Output: (doc_id, n_grams, dup_ppm), doc_id order.
    */
  def repetitionPpm(docs: DataFrame, n: Int = 3): DataFrame = {
    require(n >= 1, "n must be positive")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= n) // guard: sequence(0, neg) descends
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(t) - $n), i -> " +
          s"concat_ws(' ', slice(t, i + 1, $n)))")).as("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), countDistinct(col("g")).as("n_uniq"))
      .select(col("doc_id"), col("n_grams"),
        expr("(1000000 * (n_grams - n_uniq)) DIV n_grams").as("dup_ppm"))
      .orderBy(col("doc_id"))
  }

  /** (doc_id, n_bigrams, score_micro) per document with ≥ 1 bigram;
    * deterministic doc_id order.
    */
  def bigramScore(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    // arrays_zip(t[0..n-2], t[1..n-1]) — field names from the aliases
    val bi = toks.select(col("doc_id"), explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1).as("w1"),
        slice(col("t"), lit(2), size(col("t")) - 1).as("w2"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    // `bi` has three consumers (model counts, continuation mass, scoring
    // probe). Pin the VOCAB²-sized model frame, not the corpus×tokens-
    // sized bigram stream: caching c12 collapses c1 and the probe join
    // onto one materialized tiny frame, so the tokenize map stage runs
    // twice (model build + probe) instead of three times — while caching
    // `bi` itself would materialize a frame LARGER than the corpus, the
    // wrong trade at 100 TB (and measurably slower at gate scale). The
    // producer is deterministic (no sampling), so skipping its cache is
    // a pure cost choice, not a correctness risk.
    val c12 = graft.CacheScope.scoped(
      bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")))
    // rows of c12 grouped by w1 carry the full continuation mass of w1
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    bi.join(broadcast(c12), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(expr("(1000000 * c12) DIV c1")).as("score_micro"))
      .orderBy(col("doc_id"))
  }
}
