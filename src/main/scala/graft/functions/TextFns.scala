package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines
  * (north-star extension; SURVEY.md §2.5): tokenization, language-ID
  * heuristic, quality scoring, fingerprinting. All built-in expressions —
  * no UDFs, so every operator stays inside WholeStageCodegen and scales to
  * 100 TB as a pure map stage (no shuffle).
  */
object TextFns {

  /** Whitespace tokens via regexp extraction — identical semantics in
    * Spark and DuckDB for leading/trailing/repeated whitespace (unlike
    * split(), which produces empty tokens).
    */
  def tokens(text: Column): Column =
    regexp_extract_all(text, lit("\\S+"), lit(0))

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token estimate: alpha runs, digit runs, and single
    * punctuation marks each count as one token — a cheap deterministic
    * stand-in for a real tokenizer's piece count.
    */
  def subwordEstimate(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles over a pre-split token array (1-based positions,
    * matching DuckDB list indexing). Callers must filter size >= n first:
    * Spark's `sequence(1, 0)` counts DOWN instead of returning empty.
    *
    * Built from the passed Column (not a hardcoded column name — the r1
    * expr-string form silently bound to any unrelated column named `ws`).
    * The concat interleaves literal spaces to mirror the oracle's
    * `w[i] || ' ' || w[i+1] || ...` shape exactly.
    */
  def shingles(ws: Column, n: Int): Column =
    array_distinct(transform(sequence(lit(1), size(ws) - lit(n - 1)), i =>
      concat((0 until n).flatMap { k =>
        val tok = element_at(ws, (i + lit(k)).cast("int"))
        if (k == 0) Seq(tok) else Seq(lit(" "), tok)
      }: _*)))

  private def countIn(ws: Column, words: Seq[String]): Column =
    size(filter(ws, w => array_contains(array(words.map(lit): _*), w)))

  val enStop = Seq("the", "a", "of", "and", "is", "in")
  val esStop = Seq("el", "la", "de", "los", "y", "que")
  val frStop = Seq("le", "la", "de", "les", "et", "un")
  val deStop = Seq("der", "die", "das", "und", "ein", "ist")

  /** Language-ID heuristic: stopword-marker counts per language with a
    * fixed priority order on ties (en > es > fr > de, else 'unknown').
    * Returns a struct of the four counts + the prediction.
    */
  def langId(ws: Column): Column = {
    val en = countIn(ws, enStop); val es = countIn(ws, esStop)
    val fr = countIn(ws, frStop); val de = countIn(ws, deStop)
    struct(
      en.as("n_en"), es.as("n_es"), fr.as("n_fr"), de.as("n_de"),
      when(en >= es && en >= fr && en >= de && en > 0, "en")
        .when(es >= fr && es >= de && es > 0, "es")
        .when(fr >= de && fr > 0, "fr")
        .when(de > 0, "de")
        .otherwise("unknown").as("predicted_lang"))
  }

  /** Quality metrics: token count, mean token length, stopword ratio, and
    * a weighted score in [0,1]. Double arithmetic is written with the
    * exact expression shape mirrored in the oracle SQL (IEEE ops on
    * identical operands are engine-independent).
    */
  def quality(text: Column, ws: Column): Column = {
    val nTok = size(ws).cast("double")
    val nChar = length(regexp_replace(text, "\\s+", "")).cast("double")
    val avgLen = nChar / nTok
    val stopRatio = countIn(ws, enStop).cast("double") / nTok
    struct(
      size(ws).as("n_tokens"),
      avgLen.as("avg_token_len"),
      stopRatio.as("stopword_ratio"),
      (least(nTok / lit(100.0), lit(1.0)) * lit(0.5) +
        stopRatio * lit(0.3) +
        least(avgLen / lit(8.0), lit(1.0)) * lit(0.2)).as("quality_score"))
  }

  /** Document fingerprint: md5 of the casefolded, punctuation-stripped,
    * whitespace-collapsed text — the canonical normalize-then-hash exact
    * near-identity key.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " ")))
}
