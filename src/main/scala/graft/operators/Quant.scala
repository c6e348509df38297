package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecFns

/** Symmetric int8 embedding quantization + integer-dot retrieval — the
  * storage/bandwidth path for 100 TB embedding stores (north-star
  * extension; complements [[Pq]]'s codebook compression with the simpler,
  * codebook-free scheme most vector stores ship first).
  *
  * Each vector is scaled by its own max-|component| onto [-127, 127] and
  * floored to integers: 4× smaller than FLOAT, and similarity becomes an
  * exact BIGINT dot product — no float accumulation anywhere, so scores
  * are bit-identical at any parallelism and the oracle gate hash-matches
  * them (the same motivation as the Stats decimal policy, achieved here
  * by quantizing INPUTS instead of sums).
  *
  * The quantization itself IS oracle-portable: float→double widening is
  * exact, and `x·127.0 / mx` is two correctly-rounded IEEE ops both
  * engines evaluate identically, so FLOOR lands on the same integer —
  * per-vector scales, unlike per-batch ones, also keep the formula free
  * of any cross-row float reduction.
  *
  * Scale shape: quantization is a pure narrow codegen map (transform /
  * array_max — no shuffle, no UDF); retrieval is the q24 broadcast-scan
  * contract with an integer kernel. At corpus scale the same quantized
  * column drops into [[Ann.lshTopK]]/[[Ann.ivfTopK]] bucketing unchanged.
  */
object Quant {

  /** (id, qv): the int8-range quantized vector as array<long>, scaled by
    * the vector's own max component; an all-zero vector quantizes to
    * zeros (the 0/0 guard) rather than NaN-poisoning the pipeline.
    */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val dv = VecFns.toDouble(col(vecCol))
    val mx = array_max(transform(dv, x => abs(x)))
    df.select(col(idCol),
      when(mx === 0d, transform(dv, _ => lit(0L)))
        .otherwise(transform(dv, x => floor(x * lit(127.0) / mx)))
        .as("qv"))
  }

  /** Exact BIGINT dot product of two quantized vectors. */
  private def qdot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Top-k by quantized integer dot product: q24's broadcast-scan shape
    * (queries broadcast over the corpus, deliberately a broadcast NL
    * join) with the int8 kernel. Output (query_id, neighbor_id, qdot,
    * rank) is integer-only end-to-end.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    val q = quantize(queries, "vec_id", "embedding")
      .select(col("vec_id").as("query_id"), col("qv").as("qa"))
    val c = quantize(corpus, "vec_id", "embedding")
      .select(col("vec_id").as("neighbor_id"), col("qv").as("qb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        qdot(col("qa"), col("qb")).as("qdot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }
}
