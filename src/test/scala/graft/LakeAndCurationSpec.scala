package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{BloomJoin, Merge, Scd2, TfIdf, ZOrder}

/** Round-4 additions: row-level MERGE, SCD2 history, Z-order clustering,
  * TF-IDF weighting, Bloom-filter semi-join reduction.
  */
class LakeAndCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------------- Merge

  private def mergeFixture = {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType), StructField("tombstone", BooleanType)))
    val changes = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(2L, "B2", false),          // matched update
        Row(3L, null, true),           // matched delete
        Row(4L, "d", false),           // unmatched insert
        Row(99L, null, true)),         // unmatched tombstone: no-op
      schema)
    Merge.mergeInto(target, changes, "k", Seq("v"))
  }

  test("mergeInto routes matched/unmatched × tombstone correctly") {
    val got = mergeFixture.orderBy("k")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "a", "keep"), (2L, "B2", "update"),
      (4L, "d", "insert")))
  }

  test("mergeInto: update to a NULL payload is an update, not a keep") {
    val target = Seq((1L, "a")).toDF("k", "v")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType), StructField("tombstone", BooleanType)))
    val changes = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, null, false)), schema)
    val got = Merge.mergeInto(target, changes, "k", Seq("v"))
      .as[(Long, Option[String], String)].collect().toSeq
    assert(got == Seq((1L, None, "update")))
  }

  // ----------------------------------------------------------------- SCD2

  test("scd2: change suppression, interval chaining, open current row") {
    val obs = Seq(
      (7L, "A", 1L, 10L), (7L, "A", 2L, 11L), (7L, "B", 3L, 12L),
      (7L, "A", 4L, 13L),
      (8L, "X", 1L, 20L))
      .toDF("ent", "attr", "ts", "tb")
    val got = Scd2.history(obs, "ent", "attr", "ts", "tb")
      .select("ent", "version", "attr", "valid_from", "valid_to",
        "is_current", "n_obs")
      .as[(Long, Long, String, Long, Option[Long], Boolean, Long)]
      .collect().toSeq
    assert(got == Seq(
      (7L, 1L, "A", 1L, Some(3L), false, 2L),
      (7L, 2L, "B", 3L, Some(4L), false, 1L),
      (7L, 3L, "A", 4L, None, true, 1L),
      (8L, 1L, "X", 1L, None, true, 1L)))
  }

  // --------------------------------------------------------------- ZOrder

  /** Reference Morton code for the expression to match. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("zval matches the reference interleave bit-for-bit") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (2047L, 2047L),
      (1023L, 1L))
    val got = pts.toDF("x", "y")
      .select(ZOrder.zval(col("x"), col("y"), 11).as("z"))
      .as[Long].collect().toSeq
    assert(got == pts.map { case (x, y) => mortonRef(x, y, 11) })
  }

  test("clusterByZ files own small rectangles of the key space") {
    val o = Tables.orders(spark, TestSpark.sf).select(
      col("o_custkey").cast(LongType).as("x"),
      floor(col("o_totalprice") / 256.0).cast(LongType).as("y"))
    val parts = 16
    val boxes = ZOrder
      .clusterByZ(o, ZOrder.zval(col("x"), col("y"), 11), parts)
      .select(col("x"), col("y"), spark_partition_id().as("p"))
      .groupBy("p")
      .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1))
        .as("area"))
      .as[(Int, Long)].collect()
    val globalArea = (2048L * 2048L)
    val mean = boxes.map(_._2).sum.toDouble / boxes.length
    // random placement would give each partition the full bounding box;
    // curve segments must average well under a quarter of it
    assert(mean < globalArea / 4.0,
      s"mean z-partition box $mean vs global $globalArea")
  }

  // --------------------------------------------------------------- TF-IDF

  test("tfidf ranks a document's unique term above corpus-wide terms") {
    // tf(unique)=2/df=1 → 2,000,000 micro; tf(shared)=2/df=3 → 666,666:
    // rarity beats equal raw frequency (a tie here would sort by term)
    val docs = Seq(
      (1L, "shared shared unique unique"),
      (2L, "shared shared shared other"),
      (3L, "shared other other other"))
      .toDF("doc_id", "text")
    val got = TfIdf.topTerms(docs, k = 2)
      .select("doc_id", "term", "rank")
      .as[(Long, String, Int)].collect().toSeq
    assert(got.contains((1L, "unique", 1)))
    // df(unique)=1 beats df(shared)=3 even though tf(shared)=3 > tf(unique)
    val doc1 = got.filter(_._1 == 1L).map(_._2)
    assert(doc1 == Seq("unique", "shared"))
  }

  test("decontaminate drops normalized matches, not just byte-equal text") {
    val corpus = Seq((1L, "keep me"), (2L, "The  LEAKED, answer!"),
      (3L, "also kept")).toDF("doc_id", "text")
    val bench = Seq("the leaked answer").toDF("text")
    val got = graft.operators.TextDedup.decontaminate(corpus, bench)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 3L),
      "case/punct/spacing variants of benchmark text must be dropped")
  }

  // ---------------------------------------------------------- Bloom join

  test("bloom prune admits every true match and actually prunes") {
    val fact = Tables.lineitem(spark, TestSpark.sf)
    val dim = Tables.part(spark, TestSpark.sf).filter(col("p_size") <= 5)
    val pruned = BloomJoin.prune(fact, dim, "l_partkey", "p_partkey")
    val trueMatches = fact.join(dim,
      fact("l_partkey") === dim("p_partkey"), "left_semi").count()
    val prunedMatches = pruned.join(dim,
      pruned("l_partkey") === dim("p_partkey"), "left_semi").count()
    assert(prunedMatches == trueMatches, "bloom dropped a true match")
    assert(pruned.count() < fact.count(),
      "bloom filter pruned nothing on a selective dim")
  }

  test("bloom membership is exact-set-superset with tiny false-positive rate") {
    val dim = Seq.tabulate(200)(i => i.toLong * 7 + 1).toDF("key")
    val probeRange = spark.range(0, 10000).select(col("id").as("key"))
    val admitted = probeRange
      .crossJoin(broadcast(BloomJoin.bloomBits(dim, "key", 1 << 16, 5)))
      .filter(BloomJoin.mightContain("bits", "key", 1 << 16, 5))
      .select("key").as[Long].collect().toSet
    val members = (0 until 200).map(i => i.toLong * 7 + 1)
      .filter(_ < 10000).toSet
    assert(members.subsetOf(admitted), "false negative: impossible for bloom")
    val fp = (admitted -- members).size
    // m=65536, k=5, n=200 → theoretical FPR ≈ 2e-11; even 10 would scream
    assert(fp < 10, s"implausible false-positive count $fp")
  }
}
