package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** The shared corpus-stats aggregate: one row (N docs, integral avg
    * doc length) over a toks-free projection. Both retrieval forms ride
    * this single definition so the formula cannot drift between them.
    */
  private def corpusStats(docs: DataFrame) = docs
    .select(size(split(col("text"), " ")).cast("long").as("dl"))
    // greatest(count,1): an EMPTY corpus must yield an empty result,
    // not an ANSI DIVIDE_BY_ZERO from the avg-doc-length division —
    // sum(dl) is NULL there, so ad is NULL and no score row exists to
    // consume it (tf is empty too). Non-empty corpora are unaffected.
    .agg(count(lit(1)).as("n_docs"),
      expr("sum(dl) DIV greatest(count(1), 1)").as("ad"))

  /** The one exact integer per-(doc,term) BM25 expression (see the
    * object scaladoc) — shared text, so [[topK]] and [[topKPerQuery]]
    * are the same formula by construction.
    */
  private val scoreMicroT: String =
    """(1000000L * (2*n_docs - 2*df + 1) * 44 * ad * tf)
         DIV ((2*df + 1) * (20*ad*tf + 6*ad + 18*dl))"""

  /** Top-k (doc_id, score_micro, n_terms) for a bag-of-words query.
    * Ties break on ascending doc_id. Only documents containing at least
    * one query term appear.
    */
  def topK(docs: DataFrame, queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // corpus stats: a narrow second scan, cheaper than caching the
    // tokenized corpus just to share it with tf
    val stats = corpusStats(docs)
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
      .withColumn("score_micro_t", expr(scoreMicroT))
      .groupBy(col("doc_id"))
      .agg(sum(col("score_micro_t")).as("score_micro"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
  }

  /** Batched retrieval: top-k per query for a whole QUERY SET in one
    * pass — the shape an eval-mining or RAG-indexing job actually runs
    * (N queries against the corpus, not one). Queries are (query_id,
    * text); a query's bag of words is its DISTINCT tokens. A query never
    * retrieves itself (`query_id <> doc_id`), so self-matches can't
    * crowd out real neighbors when queries are drawn from the corpus.
    *
    * Same exact integer formula as [[topK]] (see the object scaladoc) —
    * df per term is its true corpus document frequency (counted over all
    * docs containing the term, independent of which query asked).
    *
    * Scale shape: the query-term set is broadcast twice — once as a
    * LEFT SEMI join pruning corpus tokens to terms ANY query uses
    * (hits-only shuffle, like topK's isin), once as the scoring join
    * fanning hits out per interested query. Per-query top-k is a
    * rank-limited window on query_id — never a global sort. Queries are
    * assumed broadcast-small (thousands); a corpus-scale query set would
    * swap the broadcasts for shuffle joins on term, same plan shape.
    */
  def topKPerQuery(docs: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    val stats = corpusStats(docs)
    // distinct query terms, pinned: feeds both the corpus-token pruning
    // semi-join and the scoring fan-out (CLAUDE.md self-join rule)
    val qterms = graft.CacheScope.scoped(queries
      .select(col("query_id"),
        explode(array_distinct(split(col("text"), " "))).as("term")))
    val tf = graft.CacheScope.scoped(docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"),
        explode(split(col("text"), " ")).as("term"))
      .join(broadcast(qterms.select("term").distinct()), Seq("term"),
        "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25_micro").desc, col("doc_id"))
    tf.join(broadcast(dfreq), "term")
      .join(broadcast(qterms), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .join(broadcast(stats))
      .withColumn("score_micro_t", expr(scoreMicroT))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("score_micro_t")).as("bm25_micro"))
      .withColumn("brank", row_number().over(w))
      .filter(col("brank") <= k)
  }
}
