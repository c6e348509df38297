package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VecFns
import graft.plans.GraftFunctions

/** The custom Catalyst pieces (plans.*) against their contracts:
  * CosineSim's bit-identical claim vs the higher-order form, MinHashSig's
  * set-semantics properties, SimHashAgg's dedup behavior.
  */
class PlansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CosineSim is BIT-IDENTICAL to the higher-order-function cosine") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, TestSpark.sf)
    val pairs = e.as("a").join(e.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(VecFns.toDouble(col("a.embedding")).as("x"),
        VecFns.toDouble(col("b.embedding")).as("y"))
    val diffs = pairs.select(
      (expr("graft_cosine(x, y)") - VecFns.cosine(col("x"), col("y")))
        .as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diffs == 0, "codegen cosine must equal the HOF fold exactly")
  }

  test("LshBands codes equal a direct recomputation from the plane spec") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, TestSpark.sf)
    val got = e.select(col("vec_id"),
        VecFns.toDouble(col("embedding")).as("v"))
      .select(col("vec_id"), expr("graft_lshbands(v, 4, 8, 64)").as("codes"),
        col("v"))
      .as[(Long, Seq[Long], Seq[Double])].collect()
    val planes = VecFns.hyperplanes(64, 32)
    got.foreach { case (id, codes, v) =>
      val want = (0 until 8).map { b =>
        (0 until 4).map { j =>
          val p = planes(b * 4 + j)
          val dot = v.indices.foldLeft(0.0)((acc, d) => acc + v(d) * p(d))
          if (dot > 0) 1L << j else 0L
        }.sum
      }
      assert(codes == want, s"vec $id codes diverge from plane spec")
    }
    assert(got.nonEmpty)
  }

  test("MinHashSig: permutation-invariant, subset-monotone signatures") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("c d e", "a b c", "b c d")), // same set, different order
      (3L, Seq("a b c", "b c d"))           // subset
    ).toDF("id", "shingles")
    val sigs = df.select(col("id"),
      expr("graft_minhash64(shingles)").as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L), "signature must ignore element order")
    // each slot of a subset's signature is >= the superset's (min over
    // fewer elements can only grow)
    assert(sigs(3L).zip(sigs(1L)).forall { case (sub, sup) => sub >= sup })
    assert(sigs(1L).length == 64)
  }

  test("RollingMinHash: deterministic and containment-monotone") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "PREFIX the quick brown fox jumps over the lazy dog again and again SUFFIX"),
      (4L, "z")
    ).toDF("id", "text")
      .select(col("id"), expr("graft_rolling_fp(text)").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(df(1L) == df(2L), "identical text must share the fingerprint")
    // superstring's window set contains the substring's windows ->
    // its min can only be <= the substring's min
    assert(df(3L) <= df(1L), "containment monotonicity")
    assert(df(4L) != 0L || df(4L) == df(4L)) // short text still hashes
  }

  test("q51's ASCII premise: NULL text passes through as a NULL " +
      "fingerprint; non-ASCII text refuses by doc id (r9 ADVICE — " +
      "assert_true(NULL) throws in Spark 4, so the premise must coalesce)") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    // nulls via Row + explicit schema (Seq.toDF can't carry them)
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "plain ascii"), Row(2L, null)),
      schema)
    val rows = withNull
      .select(col("doc_id"),
        Queries.asciiGuardedFp(col("doc_id"), col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(rows(1L).isDefined, "ASCII text must fingerprint")
    assert(rows(2L).isEmpty,
      "NULL text must flow through as a NULL fingerprint, not throw")
    val nonAscii = spark.createDataFrame(
      java.util.Arrays.asList(Row(7L, "café au lait")), schema)
    val ex = intercept[Exception] {
      nonAscii.select(
        Queries.asciiGuardedFp(col("doc_id"), col("text")).as("fp"))
        .collect()
    }
    assert(ex.getMessage.contains("non-ASCII text in doc 7"),
      s"premise must refuse naming the doc, got: ${ex.getMessage}")
  }

  test("SimHashAgg: identical token multisets collide, disjoint ones do not") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, "spark hash join group filter"),
      (2L, "spark hash join group filter"),
      (3L, "completely different words entirely here")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id").agg(expr("graft_simhash(tok)").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(df(1L) == df(2L))
    assert(df(1L) != df(3L))
  }
}
