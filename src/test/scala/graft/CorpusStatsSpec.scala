package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Unit coverage for the corpus-profiling additions (q126 Gopher rules,
  * q127 OLS fit): the gate queries prove corpus-scale oracle parity;
  * these pin the rule boundaries and the arithmetic conventions
  * (truncating integral division, degenerate-group NULLs) on
  * hand-computed micro-frames.
  */
class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------- gopherRules

  private def rules(rows: (Long, String)*) = CacheScope.withScope {
    Curation.gopherRules(rows.toDF("doc_id", "text"), minWords = 3,
        maxWords = 6)
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
  }

  test("gopherRules pins every rule boundary") {
    val keep = rules(
      // 1: 3 words (= minWords), mean len 3, all alpha, 2 stopwords → keep
      (1L, "the and cat"),
      // 2: word count below the floor
      (2L, "the and"),
      // 3: word count above the cap (7 > 6)
      (3L, "the and a of to in cat"),
      // 4: mean word length below 3 (chars 8 < 3·3)
      (4L, "the a cat"),
      // 5: mean word length above 10 (33 > 10·3)
      (5L, "the and abcdefghijklmnopqrstuvwxyz"),
      // 6: alpha fraction 3/4 < 4/5 (one numeric token)
      (6L, "the and cat 123"),
      // 7: alpha fraction exactly 4/5 (5·4 ≥ 4·5) → keep
      (7L, "the and cat dog 123"),
      // 8: only one distinct stopword (repeated 'the' dedupes)
      (8L, "the the cat"))
    assert(keep === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false,
      5L -> false, 6L -> false, 7L -> true, 8L -> false))
  }

  test("gopherRules emits exact integer rule inputs") {
    val r = CacheScope.withScope {
      Curation.gopherRules(Seq((9L, "the and cat 123"))
        .toDF("doc_id", "text")).collect().head
    }
    assert(r.getLong(1) === 4L) // n_words
    assert(r.getLong(2) === 12L) // word_chars (spaces dropped)
    assert(r.getLong(3) === 3L) // n_alpha_words ('123' fails ^[a-z]+$)
    assert(r.getLong(4) === 2L) // n_stop_kinds (the, and)
  }

  // --------------------------------------------------- linearFit

  private def fit(rows: (String, Long, Long)*) = CacheScope.withScope {
    Stats.linearFit(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getLong(4))).toMap
  }

  test("linearFit recovers an exact line with r² = 1") {
    // y = 2x + 3 over x = 1..5
    val got = fit((1L to 5L).map(x => ("a", x, 2 * x + 3)): _*)
    assert(got("a") === ((5L, 2000000L, 3000000L, 1000000L)))
  }

  test("linearFit truncates toward zero on negative slopes (DuckDB //)") {
    // x=(0,1,3), y=(5,3,1): num = 3·6−4·9 = −18, den = 3·10−16 = 14;
    // −18·10⁶/14 = −1285714.28…: truncation → −1285714 (floor would give
    // −1285715 and break oracle parity)
    val got = fit(("n", 0L, 5L), ("n", 1L, 3L), ("n", 3L, 1L))
    assert(got("n")._2 === -1285714L)
  }

  // ------------------------------------------------ expectations

  test("expectations: one-scan contract report with uniqueness") {
    import org.apache.spark.sql.{Row => R}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", StringType, true),
      StructField("amt", StringType, true)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](java.util.List.of(
        R("a", "1.0"), R("a", "2.0"), R(null, "x"), R("b", "-3.0"))),
      schema)
    val got = CacheScope.withScope {
      Stats.expectations(df, Seq(
        "null_id" -> col("id").isNull,
        "bad_amt" -> expr("try_cast(amt AS DOUBLE)").isNull,
        "neg_amt" -> (expr("try_cast(amt AS DOUBLE)") < 0),
        "never" -> lit(false)),
        uniqueKey = Some("id"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getBoolean(2)))).toMap
    }
    assert(got === Map(
      "null_id" -> ((1L, false)),
      "bad_amt" -> ((1L, false)),
      "neg_amt" -> ((1L, false)),
      "never" -> ((0L, true)),
      // 'a' twice among non-null keys; the null id is NOT a duplicate
      "duplicate_id" -> ((1L, false))))
  }

  test("expectations refuses non-identifier rule names (stack injection)") {
    intercept[IllegalArgumentException] {
      Stats.expectations(Seq((1L, 2L)).toDF("a", "b"),
        Seq("bad name', a) --" -> lit(true)))
    }
    // all-digit names parse inside stack() as INTEGER LITERALS (the
    // report would show the literal as the violation count) — refused
    intercept[IllegalArgumentException] {
      Stats.expectations(Seq((1L, 2L)).toDF("a", "b"),
        Seq("404" -> lit(true)))
    }
    // uniqueKey rides the same expr — same check
    intercept[IllegalArgumentException] {
      Stats.expectations(Seq((1L, 2L)).toDF("a", "b"),
        Seq("ok_rule" -> lit(true)), uniqueKey = Some("my col"))
    }
  }

  test("observedProfile emits NULL aggregates on an empty input") {
    val empty = Seq((1L, 1.0)).toDF("id", "amount").filter(lit(false))
    val r = Stats.observedProfile(empty).collect().head
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("observedProfile keeps NULLs on a non-empty all-NULL amount column") {
    // r7 ADVICE: the non-empty branch unboxed the observed null min/max
    // through asInstanceOf[Double], fabricating 0.0 aggregates — the
    // exact failure the empty branch's comment forbids. Nulls ride a
    // Row + explicit schema (CLAUDE.md), so the frame is built the same
    // way here.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val allNull = spark.createDataFrame(
      java.util.List.of(Row(1L, null), Row(2L, null)),
      StructType(Seq(StructField("id", LongType, false),
        StructField("amount", DoubleType, true))))
    val r = Stats.observedProfile(allNull).collect().head
    assert(r.getLong(0) === 2L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3),
      s"expected NULL min/max/sum, got $r")
  }

  test("linearFit yields NULL, not a divide error, on degenerate groups") {
    // constant x: den = 0 → all three quotients NULL
    val got = fit(("c", 2L, 1L), ("c", 2L, 9L))
    assert(got("c") === ((2L, null, null, null)))
    // constant y: slope/intercept defined (0, y), r² NULL (0/0)
    val gy = fit(("k", 1L, 7L), ("k", 2L, 7L))
    assert(gy("k") === ((2L, 0L, 7000000L, null)))
  }
}
