package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the RAG / context-window
  * preprocessing step that turns each document into fixed-size,
  * stride-overlapped chunks (north-star §2.5 text family; complements
  * [[Packing]]'s budgeted concatenation with the split-one-doc-up dual).
  *
  * Chunk k of a doc covers tokens [k·stride, k·stride + size); every
  * token position below n_tok starts at most one chunk, so trailing
  * chunks may be short (standard sliding-window semantics — stride <
  * size yields (size − stride)-token overlaps for retrieval recall).
  *
  * Scale shape: split → sequence → posexplode → slice is a single
  * narrow codegen pipeline — zero shuffles, zero UDFs; output volume is
  * ≈ n_tok/stride rows per doc, each carrying only the chunk fingerprint
  * and bounds (never the chunk text), so the operator's output is
  * footprint-bounded even when chunking a 100 TB corpus. Downstream
  * chunk-level dedup/embedding joins key on (doc_id, chunk_idx).
  */
object Chunker {

  /** Tokens are whitespace-split on the single-space convention the
    * corpus oracles share (q21/q74: `string_split(text, ' ')`).
    * Output: (doc_id, chunk_idx, start_tok, chunk_tokens, chunk_fp) —
    * `chunk_fp` is the md5 of the space-rejoined chunk text, the
    * engine-portable fingerprint (q20's convention) chunk-level dedup
    * keys on.
    */
  def chunk(docs: DataFrame, sizeTokens: Int, strideTokens: Int): DataFrame = {
    require(sizeTokens > 0 && strideTokens > 0,
      "chunk size and stride must be positive")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n_tok", size(col("ws")))
      // sequence is end-inclusive: starts = {0, stride, …} ∩ [0, n_tok)
      .select(col("doc_id"), col("ws"), col("n_tok"),
        posexplode(sequence(lit(0), col("n_tok") - 1, lit(strideTokens)))
          .as(Seq("chunk_idx", "start_tok")))
      .select(col("doc_id"),
        col("chunk_idx").cast("int").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        least(lit(sizeTokens), col("n_tok") - col("start_tok")).cast("long")
          .as("chunk_tokens"),
        // slice is 1-based and clamps at the array end, exactly like the
        // oracle's list slice — the trailing short chunk needs no case
        md5(concat_ws(" ",
          slice(col("ws"), col("start_tok") + 1, lit(sizeTokens))))
          .as("chunk_fp"))
  }
}
