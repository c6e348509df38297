package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Unit coverage for the retrieval/compression additions (q128 int8
  * quantized ANN, q129 two-stage retrieval, q130 image dHash): the gate
  * queries prove corpus-scale oracle parity; these pin the operator
  * contracts — quantization arithmetic, per-query BM25 ≡ single-query
  * BM25, rerank ≡ brute ranking on a full candidate set, and
  * decode-derived dHash ≡ the closed-form raster definition.
  */
class RetrievalQuantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------- quantize

  test("quantize scales to [-127,127] with floor, zero vector to zeros") {
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)),
      (3L, Seq(-2.0f, 1.0f, 0.5f))).toDF("vec_id", "embedding")
    val got = CacheScope.withScope {
      Quant.quantize(df, "vec_id", "embedding")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    }
    // id1: mx=1 → [127, floor(-63.5)=-64, floor(31.75)=31]
    assert(got(1L) === Seq(127L, -64L, 31L))
    assert(got(2L) === Seq(0L, 0L, 0L))
    // id3: mx=2 → [-127, floor(63.5)=63, floor(31.75)=31]
    assert(got(3L) === Seq(-127L, 63L, 31L))
  }

  test("quantizedTopK ranks by exact integer dot with id tiebreak") {
    // corpus engineered so two neighbors TIE on qdot: ranks must break
    // on ascending neighbor_id
    val e = Seq(
      (0L, Seq(1.0f, 0.0f)), // the query
      (1L, Seq(1.0f, 0.0f)), // qdot 127·127 = 16129
      (2L, Seq(0.5f, 0.5f)), // q=[127,127] scaled by .5 → qdot 16129
      (3L, Seq(-1.0f, 0.0f))) // qdot −16129
      .toDF("vec_id", "embedding")
    val got = CacheScope.withScope {
      Quant.quantizedTopK(e, e.filter(col("vec_id") === 0), k = 3)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    }
    assert(got === Array((1L, 16129L, 1), (2L, 16129L, 2),
      (3L, -16129L, 3)))
  }

  // ------------------------------------------------------ topKPerQuery

  test("topKPerQuery matches single-query topK scores, self excluded") {
    val docs = Seq(
      (1L, "spark hash window"),
      (2L, "spark spark hash join"),
      (3L, "window window window spark"),
      (4L, "sort merge join")).toDF("doc_id", "text")
    val queries = docs.filter(col("doc_id") === 1)
      .select(col("doc_id").as("query_id"), col("text"))
    val (batched, single) = CacheScope.withScope {
      val b = Bm25.topKPerQuery(docs, queries, k = 10)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val s = Bm25.topK(docs, Seq("spark", "hash", "window"), k = 10)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (b, s)
    }
    // the query doc itself never appears in the batched result...
    assert(!batched.contains(1L))
    // ...and every other doc carries the IDENTICAL exact integer score
    // (stats/df are corpus-wide in both forms)
    assert(batched === single.removed(1L))
  }

  // -------------------------------------------------------- rerankTopK

  test("rerank over the full candidate set reproduces bruteTopK") {
    val e = Seq(
      (0L, Seq(1.0f, 0.2f, 0.1f)), (1L, Seq(0.9f, 0.3f, 0.0f)),
      (2L, Seq(-1.0f, 0.1f, 0.5f)), (3L, Seq(0.2f, 0.9f, 0.4f)),
      (4L, Seq(0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val allCands = e.select(col("vec_id").as("neighbor_id"))
      .crossJoin(e.filter(col("vec_id") === 0)
        .select(col("vec_id").as("query_id")))
      .filter(col("neighbor_id") =!= col("query_id"))
    val (rr, brute) = CacheScope.withScope {
      val r = Ann.rerankTopK(allCands, e, k = 3)
        .collect().map(r => (r.getLong(1), r.getInt(2)))
      val b = Ann.bruteTopK(e, e.filter(col("vec_id") === 0), k = 3)
        .collect().map(r => (r.getLong(1), r.getInt(2)))
      (r, b)
    }
    assert(rr.sorted === brute.sorted)
  }

  test("rerank refuses candidate columns that collide with its internals") {
    val e = Seq((0L, Seq(1.0f)), (1L, Seq(0.9f))).toDF("vec_id", "embedding")
    // an upstream score named "rank" (or any reserved internal) would be
    // silently overwritten — must refuse instead
    val cands = Seq((0L, 1L, 0.7)).toDF("query_id", "neighbor_id", "rank")
    val ex = intercept[IllegalArgumentException] {
      Ann.rerankTopK(cands, e, k = 1)
    }
    assert(ex.getMessage.contains("collide"))
  }

  test("rerank passes extra candidate columns through") {
    val e = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val cands = Seq((0L, 1L, 42L))
      .toDF("query_id", "neighbor_id", "bm25_micro")
    val row = CacheScope.withScope {
      Ann.rerankTopK(cands, e, k = 5).collect().head
    }
    assert(row.getLong(row.fieldIndex("bm25_micro")) === 42L)
    assert(row.getInt(row.fieldIndex("rank")) === 1)
  }

  // -------------------------------------------------------- imageDHash

  /** The closed-form dHash: raster p(x,y) = (id·31+7x+13y) mod 256 at
    * w = 8+id%16, h = 8+id%8 — an independent replay of the grid spec.
    */
  private def expectedDHash(id: Long): (Long, Long) = {
    val w = 8 + id % 16
    val h = 8 + id % 8
    def p(x: Long, y: Long) = (id * 31 + 7 * x + 13 * y) % 256
    var hi = 0L; var lo = 0L
    for (j <- 0 until 8; i <- 0 until 8) {
      val y = (j * (h - 1)) / 7
      val x0 = (i * (w - 1)) / 8
      val x1 = ((i + 1) * (w - 1)) / 8
      if (p(x1, y) > p(x0, y)) {
        if (j >= 4) hi |= 1L << (8 * (j - 4) + i)
        else lo |= 1L << (8 * j + i)
      }
    }
    (hi, lo)
  }

  test("imageDHash recovers the closed-form hash from real PNG decode") {
    val ids = Seq(0L, 3L, 6L, 9L, 258L)
    val docs = ids.map(i => (i, "x y", 3L)).toDF("doc_id", "text", "n_chars")
    val got = CacheScope.withScope {
      Multimodal.imageDHash(docs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    assert(got.keySet === ids.toSet) // all ids are %3==0 → all imaged
    ids.foreach { id => assert(got(id) === expectedDHash(id), s"id $id") }
  }

  test("imageDHashNear equals brute-force Hamming pairs on real decode") {
    val ids = (0L to 90L by 3L)
    val docs = ids.map(i => (i, "x y", 3L)).toDF("doc_id", "text", "n_chars")
    // independent expectation: reps per closed-form hash, exact Hamming
    val reps = ids.groupBy(expectedDHash).map { case (h, g) => (h, g.min) }
    val expected = (for {
      (ha, a) <- reps; (hb, b) <- reps if a < b
      d = java.lang.Long.bitCount(ha._1 ^ hb._1) +
        java.lang.Long.bitCount(ha._2 ^ hb._2)
      if d >= 1 && d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = CacheScope.withScope {
      Multimodal.imageDHashNear(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(got === expected && expected.nonEmpty)
  }

  test("nearPairsFromHashes pins the pigeonhole edges") {
    // A/A2 exact dups (collapse to rep 1); B at Hamming 3 from A
    // (kept, boundary); D at Hamming 4 from A all in ONE band (it IS a
    // band-join candidate via the three zero bands — the verify must
    // drop it); E at Hamming 4 spread one-bit-per-band from A (never
    // even a candidate); (B,D) differ by one bit (kept)
    val hashes = Seq(
      (1L, 0L, 0L), (5L, 0L, 0L), (2L, 0L, 7L), (3L, 0L, 0xFL),
      (4L, 0x10001L, 0x10001L))
      .toDF("media_id", "dhash_hi", "dhash_lo")
    val got = CacheScope.withScope {
      Multimodal.nearPairsFromHashes(hashes, maxHamming = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(got === Set((1L, 2L, 3L), (2L, 3L, 1L)))
    // maxHamming >= band count breaks the pigeonhole — refused loudly
    intercept[IllegalArgumentException] {
      Multimodal.imageDHashNear(Seq((3L, "x", 1L))
        .toDF("doc_id", "text", "n_chars"), maxHamming = 4)
    }
  }

  test("imageDHash groups identical hashes (256-periodic raster)") {
    // ids 3 and 3+768 share id mod 256, id mod 16, id mod 8 → same
    // raster → same hash; 771 % 3 == 0 so both rows are imaged
    val docs = Seq((3L, "x", 1L), (771L, "x", 1L), (6L, "x", 1L))
      .toDF("doc_id", "text", "n_chars")
    val got = CacheScope.withScope {
      Multimodal.imageDHash(docs).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
    }
    assert(got(3L) === 2L && got(771L) === 2L)
  }
}
