package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary induction + coverage profiling — the tokenizer-fitting
  * half of a training pipeline: pick the top-V corpus vocabulary, then
  * measure how much of each document falls OUTSIDE it (the OOV mass a
  * fixed-vocab tokenizer would shred into unknowns / byte fallbacks).
  * Corpora are mixed or dropped on exactly this signal when a tokenizer
  * is frozen before the data mix is final.
  */
object Vocab {

  /** (doc_id, n_tokens, oov_tokens, oov_ppm): per-document OOV mass
    * against the corpus's own top-`vocabSize` vocabulary (frequency
    * DESC, term ASC tiebreak — deterministic under ties). oov_ppm is
    * the truncating integral ppm both engines share.
    *
    * Scale shape: ONE term-count shuffle (map-side combine); the top-V
    * cut is `orderBy.limit` = TakeOrdered (tree top-k, no global sort);
    * the vocabulary collapses to a single sorted-array row and
    * broadcasts (vocabularies are 10⁴–10⁵ strings — broadcast-small by
    * construction), so the scoring pass is a pure narrow map over the
    * corpus: `filter`/`array_contains` per row, no explode, no join
    * exchange. The same q100/q75 one-row-broadcast delivery mechanism.
    */
  def oovCoverage(docs: DataFrame, vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be positive")
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(vocabSize)
      .agg(sort_array(collect_list(col("term"))).as("vl"))
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(filter(col("ws"), t => !array_contains(col("vl"), t)))
          .cast("long").as("oov_tokens"))
      .withColumn("oov_ppm", expr("(1000000 * oov_tokens) div n_tokens"))
      .orderBy(col("doc_id"))
  }
}
