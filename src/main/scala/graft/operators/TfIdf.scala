package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF-style term weighting for training-data curation (north-star
  * extension; the "which terms make this document distinctive" primitive
  * behind corpus quality filters and topic-drift monitors).
  *
  * The inverse-document-frequency factor is the RATIONAL idf = N/df, not
  * log(N/df): `ln` is not correctly-rounded in IEEE and its last-ulp
  * behavior differs across engines/libms, which would break the bit-exact
  * oracle hash. Since N is constant per corpus, ranking by tf·N/df is
  * ranking by tf/df — the emitted `score_micro = floor(1e6·tf / df)` uses
  * only exact integer products and one correctly-rounded division, so
  * Spark and DuckDB produce identical bits (see the float policy in
  * [[Stats]]).
  *
  * Scale shape: one tokenize pass feeds a (doc, term) count; the
  * document-frequency table is derived FROM that count (one row per
  * (doc, term) — counting rows per term IS the distinct-doc count), so the
  * expensive distinct-aggregation never touches raw tokens. df is
  * vocabulary-sized, so the score join broadcasts; the only data-sized
  * shuffles are the two aggregations, both map-side combinable.
  */
object TfIdf {

  /** Top-k distinctive terms per document with integer-exact scores.
    * Output: doc_id, term, tf, df, score_micro, rank (1..k).
    */
  def topTerms(docs: DataFrame, k: Int): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf has exactly one row per (doc, term): rows-per-term == distinct
    // docs containing the term. No second pass over raw tokens.
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "term")
      .withColumn("score_micro",
        floor((lit(1000000.0) * col("tf")) / col("df")).cast("long"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "score_micro", "rank")
      .orderBy("doc_id", "rank")
  }
}
