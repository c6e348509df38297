package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 retrieval scoring — the ranked-retrieval companion to [[TfIdf]]
  * (corpus search, eval-set mining, "find the docs most about X" curation
  * queries; north-star extension).
  *
  * Standard Okapi BM25 with k1 = 1.2, b = 0.75, written as ONE exact
  * integer formula so the oracle gate can hash-match it. With ad = the
  * integral average document length (A DIV N over the corpus) and the
  * conventional log-free rational idf (ln is not cross-engine bit-stable;
  * same policy as TfIdf's N/df), per (doc, term):
  *
  *   idf       = (2N − 2df + 1) / (2df + 1)        [ = (N−df+½)/(df+½) ]
  *   tf-factor = tf·(k1+1) / (tf + k1·(1 − b + b·L/ad))
  *             = 44·ad·tf / (20·ad·tf + 6·ad + 18·L)   [ k1=6/5, b=3/4 ]
  *
  *   score_micro_t = (10⁶ · (2N−2df+1) · 44·ad·tf)
  *                     DIV ((2df+1) · (20·ad·tf + 6·ad + 18·L))
  *
  * — a single integral floor division per term; the per-document score is
  * the integer SUM of its per-term micros. Every operand is BIGINT; the
  * numerator is bounded by 10⁶·2N·44·ad·tf_max (≈ 10¹⁶ at N = 10⁵,
  * ad ≈ 50, tf ≤ 50 — far under 2⁶³; at web scale lower the 10⁶ micro
  * scale or move to DECIMAL(38,0), a one-line change both sides).
  *
  * Scale shape: the tokenizer emits ONLY query-term hits (the isin filter
  * sits before the aggregation, so the (doc,term) shuffle carries hits,
  * not the corpus); document length comes from `size(split(...))` — a
  * per-row map, no second shuffle; df and the 1-row corpus stats frame
  * are broadcast; the final top-k is `orderBy.limit` = TakeOrdered (tree
  * top-k, no global sort). Two narrow corpus scans (a toks-free stats
  * pass + the tokenize pass, cheaper than caching the tokenized corpus),
  * one hit-sized shuffle.
  */
object Bm25 {

  /** Top-k (doc_id, score_micro, n_terms) for a bag-of-words query.
    * Ties break on ascending doc_id. Only documents containing at least
    * one query term appear.
    */
  def topK(docs: DataFrame, queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // corpus stats: one aggregate row (N docs, integral avg doc length)
    // over a toks-free projection — a narrow second scan, cheaper than
    // caching the tokenized corpus just to share it with tf
    val stats = docs
      .select(size(split(col("text"), " ")).cast("long").as("dl"))
      // greatest(count,1): an EMPTY corpus must yield an empty result,
      // not an ANSI DIVIDE_BY_ZERO from the avg-doc-length division —
      // sum(dl) is NULL there, so ad is NULL and no score row exists to
      // consume it (tf is empty too). Non-empty corpora are unaffected.
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(dl) DIV greatest(count(1), 1)").as("ad"))
    // tf feeds BOTH dfreq and the score join — pinned so the hit
    // aggregation runs once (CLAUDE.md self-join rule); hit-sized, tiny
    val tf = graft.CacheScope.scoped(docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf")))
    // one row per (doc, term) ⇒ rows-per-term IS the document frequency
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .join(broadcast(stats))
      .withColumn("score_micro_t", expr(
        """(1000000L * (2*n_docs - 2*df + 1) * 44 * ad * tf)
             DIV ((2*df + 1) * (20*ad*tf + 6*ad + 18*dl))"""))
      .groupBy(col("doc_id"))
      .agg(sum(col("score_micro_t")).as("score_micro"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }
}
