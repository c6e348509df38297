package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Unit coverage for the round-4 graph / retrieval / packing operators
  * (q84-q87). Each test checks the DISTRIBUTED plan against an
  * independent straight-line reference computed in plain Scala or a naive
  * single-partition Spark plan.
  */
class GraphAndRetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------- PageRank

  /** Straight-line reference: the identical integer fixed-point rounds
    * (Scala `/` on non-negative Longs == floor DIV).
    */
  private def simulate(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000000L).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((s, d) <- edges) in(d) += r(s) / outdeg(s)
      r = nodes.map(n => n -> (150000000L + 17L * in(n) / 20L)).toMap
    }
    r
  }

  test("PageRank matches the integer reference on a graph with a cycle, " +
      "a dangling sink, and a source") {
    // 1→2→3→1 cycle; 3→4 dangling sink (mass leaks, rank still computed);
    // 5→1 source (never receives mass beyond teleport)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 1L))
    val got = PageRank.ranks(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == simulate(edges, 3))
  }

  test("PageRank on a symmetric star gives all leaves equal rank") {
    val leaves = (2L to 6L)
    val edges = leaves.flatMap(l => Seq((1L, l), (l, 1L)))
    val got = PageRank.ranks(edges.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(leaves.map(got).toSet.size == 1, "leaves must tie exactly")
    assert(got(1L) > got(2L), "hub must outrank leaves")
    assert(got == simulate(edges, 4))
  }

  // -------------------------------------------------------------- Packing

  private def packDocs = {
    // deterministic irregular token counts, including budget-sized spikes
    (0L until 100L).map(i => (i, (i * 37 % 13) + 1)).toDF("id", "toks")
  }

  test("packByBudget equals the naive global-window cumsum") {
    val naive = packDocs
      .withColumn("cum_before", coalesce(
        sum(col("toks")).over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("shard", expr("cum_before DIV 17"))
      .select("id", "cum_before", "shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = CacheScope.withScope {
      Packing.packByBudget(packDocs, "id", "toks", budget = 17L, parts = 7)
        .select("id", "cum_before", "shard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(got == naive)
  }

  test("packByBudget is invariant to the range partition count") {
    def run(parts: Int) = CacheScope.withScope {
      Packing.packByBudget(packDocs, "id", "toks", budget = 23L, parts)
        .select("id", "shard")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(run(1) == run(4) && run(4) == run(13))
  }

  test("packByBudget shards are contiguous in the order key and " +
      "every shard except the last crosses its boundary with its last doc") {
    val budget = 29L
    val rows = CacheScope.withScope {
      Packing.packByBudget(packDocs, "id", "toks", budget, parts = 5)
        .select("id", "toks", "shard", "cum_before")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
    }
    // shard ids non-decreasing along the order key
    assert(rows.sliding(2).forall(p => p(0)._3 <= p(1)._3))
    // streaming-cut discipline: a non-final shard k ends because its last
    // doc pushes the running total past (k+1)·budget — NOT "every shard
    // sums ≥ budget" (a shard whose predecessor overshot inherits the
    // overshoot and can hold less than a full budget of its own tokens)
    val lastShard = rows.map(_._3).max
    for ((_, toks, shard, cb) <- rows.groupBy(_._3).map(_._2.maxBy(_._1))
        if shard != lastShard)
      assert(cb + toks >= (shard + 1) * budget,
        s"shard $shard must end by crossing its boundary")
  }

  // ----------------------------------------------------------------- BM25

  test("Bm25.topK matches the integer formula computed straight-line") {
    val docs = Seq(
      (1L, "a b a c"), (2L, "a a a a"), (3L, "b c d e"), (4L, "x y z w"))
    val query = Seq("a", "b")
    val got = Bm25.topK(docs.toDF("doc_id", "text"), query, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == bm25Reference(docs, query))
    assert(!got.map(_._1).contains(4L), "doc with no query terms absent")
  }

  /** Straight-line BM25 reference (same integer formula as the operator
    * scaladoc); shared by the hand-case and the randomized property.
    */
  private def bm25Reference(docs: Seq[(Long, String)], query: Seq[String])
      : Seq[(Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = docs.size.toLong
    val ad = toks.values.map(_.size.toLong).sum / n
    val dfm = query.map(q =>
      q -> toks.count(_._2.contains(q)).toLong).toMap
    docs.flatMap { case (id, _) =>
      val scores = query.flatMap { q =>
        val tf = toks(id).count(_ == q).toLong
        if (tf == 0) None
        else {
          val df = dfm(q); val dl = toks(id).size.toLong
          Some((1000000L * (2 * n - 2 * df + 1) * 44 * ad * tf) /
            ((2 * df + 1) * (20 * ad * tf + 6 * ad + 18 * dl)))
        }
      }
      if (scores.isEmpty) None
      else Some((id, scores.sum, scores.size.toLong))
    }.sortBy { case (id, s, _) => (-s, id) }
  }

  test("Bm25 matches the straight-line formula on random small corpora") {
    import org.scalacheck.{Gen, Prop}
    val vocab = Vector("a", "b", "c", "d", "e")
    val genCorpus = for {
      nDocs <- Gen.chooseNum(1, 10)
      docs <- Gen.listOfN(nDocs, Gen.chooseNum(1, 15)
        .flatMap(len => Gen.listOfN(len, Gen.oneOf(vocab))))
      qn <- Gen.chooseNum(1, 3)
      q <- Gen.pick(qn, vocab)
    } yield (docs.zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws.mkString(" ")) }, q.toSeq)
    scCheck("bm25-random")(Prop.forAll(genCorpus) { case (docs, query) =>
      val got = CacheScope.withScope {
        Bm25.topK(docs.toDF("doc_id", "text"), query, k = 50)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSeq
      }
      got == bm25Reference(docs, query).take(50)
    })
  }

  test("bigramScore matches a straight-line model on random corpora") {
    import org.scalacheck.{Gen, Prop}
    val vocab = Vector("a", "b", "c")
    val genCorpus = for {
      nDocs <- Gen.chooseNum(1, 8)
      docs <- Gen.listOfN(nDocs, Gen.chooseNum(1, 12)
        .flatMap(len => Gen.listOfN(len, Gen.oneOf(vocab))))
    } yield docs.zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws.mkString(" ")) }
    scCheck("bigram-random")(Prop.forAll(genCorpus) { docs =>
      val bis = docs.map { case (id, t) =>
        id -> t.split(" ").toSeq.sliding(2).filter(_.size == 2)
          .map(p => (p(0), p(1))).toSeq }
      val c12 = bis.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
      val c1 = c12.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
      val expected = bis.flatMap { case (id, bs) =>
        if (bs.isEmpty) None
        else Some((id, bs.size.toLong,
          bs.map(b => 1000000L * c12(b) / c1(b._1)).sum))
      }.sortBy(_._1)
      val got = CacheScope.withScope {
        LangModel.bigramScore(docs.toDF("doc_id", "text"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSeq
      }
      got == expected
    })
  }

  test("Bm25 on an empty corpus returns empty, not ANSI DIVIDE_BY_ZERO") {
    // the corpus-stats aggregate divides by count(1); with zero docs that
    // is NULL DIV 0, which ANSI mode turns into an error unless guarded
    val empty = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    assert(Bm25.topK(empty, Seq("spark"), k = 5).count() === 0L)
  }

  test("Bm25 rewards rarer terms: a unique term outscores a ubiquitous " +
      "one at equal tf and dl") {
    val docs = Seq((1L, "rare x"), (2L, "common x"), (3L, "common y"),
      (4L, "common z")).toDF("doc_id", "text")
    val got = Bm25.topK(docs, Seq("rare", "common"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) > got(2L))
  }

  // ------------------------------------------------------ bigram LM score

  test("LangModel.bigramScore matches the hand-computed MLE model and " +
      "drops bigram-less docs") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    // model: c(a,b)=3 c(b,a)=1 c(b,c)=1; c(a,·)=3 c(b,·)=2
    // doc1 = 1e6·3/3 + 1e6·1//2 + 1e6·3/3 + 1e6·1//2; doc2 = 1e6·3/3
    val got = LangModel.bigramScore(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 4L, 3000000L), (2L, 1L, 1000000L)))
  }

  // --------------------------------------------------------------- Redact

  test("Redact.pii scrubs emails and phones, is idempotent, and leaves " +
      "clean text alone") {
    val df = Seq(
      "write to jane.doe+x@mail.example.org today",
      "call +1-555-0199 or mail a@b.io",
      "no pii here at all",
      "<EMAIL> already redacted").toDF("s")
    val out = df.select(graft.functions.Redact.pii(col("s")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq(
      "write to <EMAIL> today",
      "call <PHONE> or mail <EMAIL>",
      "no pii here at all",
      "<EMAIL> already redacted"))
    val twice = df.select(graft.functions.Redact.pii(
      graft.functions.Redact.pii(col("s"))).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == out, "redaction must be idempotent")
  }

  // --------------------------------------------------------- repetition

  test("repetitionPpm: all-unique docs score 0, a fully looping doc " +
      "scores the exact closed form, short docs are absent") {
    val docs = Seq(
      (1L, "a b c d e"),          // 3 trigrams, all unique → 0
      (2L, "x y x y x y x y"),    // 6 trigrams, 2 distinct → 1e6*4/6
      (3L, "a b")).toDF("doc_id", "text") // < 3 tokens → absent
    val got = LangModel.repetitionPpm(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 3L, 0L), (2L, 6L, 666666L)))
  }

  // -------------------------------------------------- ngramDecontaminate

  test("ngramDecontaminate drops on a single shared n-gram, keeps " +
      "shorter overlaps and short docs") {
    val words = (1 to 20).map(i => s"w$i")
    val bench = Seq((100L, words.mkString(" "))).toDF("doc_id", "text")
    val corpus = Seq(
      // shares words 3..15 = one full 13-gram → dropped
      (1L, ("x " + words.slice(2, 15).mkString(" ") + " y")),
      // only a 12-gram overlap → kept
      (2L, ("x " + words.slice(2, 14).mkString(" ") + " y")),
      // fewer than 13 tokens total → structurally uncontaminable
      (3L, words.take(5).mkString(" ")),
      (4L, "entirely different tokens only")).toDF("doc_id", "text")
    val kept = graft.operators.TextDedup.ngramDecontaminate(corpus, bench)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L))
  }

  test("bloom-filtered ngram decontamination equals the exact path on " +
      "the planted fixture and at a deliberately tiny filter") {
    val words = (1 to 20).map(i => s"w$i")
    val bench = Seq((100L, words.mkString(" "))).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, ("x " + words.slice(2, 15).mkString(" ") + " y")),
      (2L, ("x " + words.slice(2, 14).mkString(" ") + " y")),
      (3L, words.take(5).mkString(" ")),
      (4L, "entirely different tokens only")).toDF("doc_id", "text")
    val exact = graft.operators.TextDedup
      .ngramDecontaminate(corpus, bench)
      .collect().map(_.getLong(0)).toSet
    // default sizing
    val bloom = graft.operators.TextDedup
      .ngramDecontaminateBloom(corpus, bench)
      .collect().map(_.getLong(0)).toSet
    assert(bloom == exact)
    // 64-bit filter: nearly every probe is a false POSITIVE — the exact
    // confirm join must still remove them all (losslessness does not
    // depend on filter quality, only cost does)
    val saturated = graft.operators.TextDedup
      .ngramDecontaminateBloom(corpus, bench, mBits = 64, k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(saturated == exact)
  }

  test("dedupClusters from a MATERIALIZED pair table equals the hermetic " +
      "live-join composition (the 100 TB reuse path)") {
    import graft.operators.Components
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("doc_a", "doc_b")
    val live = Components.dedupClusters(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val path = "/tmp/graft_test_pairs_reuse"
    pairs.write.mode("overwrite").parquet(path)
    val reused = Components.dedupClusters(spark.read.parquet(path))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(reused == live)
    assert(live == Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 3L), (21L, 20L, 3L), (22L, 20L, 3L)))
  }

  // ------------------------------------- randomized cross-checks (props)

  private def scCheck(name: String)(prop: org.scalacheck.Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, s"$name: $res")
  }

  test("PageRank equals the integer reference on random sparse digraphs") {
    import org.scalacheck.{Gen, Prop}
    val genEdges = for {
      n <- Gen.chooseNum(2, 12)
      m <- Gen.chooseNum(1, 25)
      es <- Gen.listOfN(m, for {
        s <- Gen.chooseNum(0, n - 1); d <- Gen.chooseNum(0, n - 1)
      } yield (s.toLong, d.toLong))
    } yield es.distinct // parallel edges out of scope for the reference
    scCheck("pagerank-random")(Prop.forAll(genEdges) { edges =>
      edges.isEmpty || {
        val got = PageRank.ranks(edges.toDF("src", "dst"), iters = 2)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == simulate(edges, 2)
      }
    })
  }

  test("packByBudget equals the naive cumsum for random sizes and budgets") {
    import org.scalacheck.{Gen, Prop}
    val genCase = for {
      n <- Gen.chooseNum(1, 80)
      budget <- Gen.chooseNum(1L, 50L)
      toks <- Gen.listOfN(n, Gen.chooseNum(0L, 60L)) // incl. 0 and >budget
    } yield (toks, budget)
    scCheck("packing-random")(Prop.forAll(genCase) { case (toks, budget) =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "toks")
      val naive = df.withColumn("cb", coalesce(
          sum(col("toks")).over(org.apache.spark.sql.expressions.Window
            .orderBy("id").rowsBetween(Long.MinValue, -1)), lit(0L)))
        .withColumn("shard", expr(s"cb DIV $budget"))
        .select("id", "shard").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = CacheScope.withScope {
        Packing.packByBudget(df, "id", "toks", budget, parts = 3)
          .select("id", "shard").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      got == naive
    })
  }

  // ------------------------------------------------------- weightedSample

  test("weightedSample keeps everything at 1e6 ppm, nothing at 0, and a " +
      "deterministic intermediate subset") {
    val df = (0L until 500L).toDF("id")
    assert(Sampling.weightedSample(df, "id", lit(1000000L)).count() == 500)
    assert(Sampling.weightedSample(df, "id", lit(0L)).count() == 0)
    val half1 = Sampling.weightedSample(df, "id", lit(500000L))
      .collect().map(_.getLong(0)).toSet
    val half2 = Sampling.weightedSample(df, "id", lit(500000L))
      .collect().map(_.getLong(0)).toSet
    assert(half1 == half2, "same weight ⇒ same sample, every run")
    assert(half1.nonEmpty && half1.size < 500)
    // monotone: raising the weight only ADDS rows (nested samples — the
    // property that makes hash-threshold sampling usable for mix tuning)
    val more = Sampling.weightedSample(df, "id", lit(750000L))
      .collect().map(_.getLong(0)).toSet
    assert(half1.subsetOf(more))
  }

  test("triangles: K4 + pendant counts exactly, orientation equals the " +
      "naive triple-join on a hashed random graph") {
    val spark = TestSpark.spark
    import spark.implicits._
    // K4 on {1,2,3,4}: 4 triangles, each node in 3; pendant 5 and the
    // triangle-free edge (5,6) must not appear at all
    val k4 = (for (u <- 1L to 4L; v <- (u + 1) to 4L) yield (u, v)) :+
      (4L, 5L) :+ (5L, 6L)
    val got = Triangles.perNodeTriangles(k4.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"K4 counts: got $got")
    // pseudo-random sparse graph: edge (i, j) kept by a hash predicate —
    // deterministic, no RNG state
    val verts = 60L
    val rnd = (for (u <- 1L until verts; v <- (u + 1) to verts)
      yield (u, v)).toDF("u", "v")
      .filter(pmod(xxhash64(col("u"), col("v")), lit(7L)) === 0)
    val oriented = Triangles.perNodeTriangles(rnd)
      .as[(Long, Long)].collect().toMap
    val e = rnd.cache()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e1.u") === col("e2.u") &&
        col("e1.v") < col("e2.v"))
      .join(e.as("e3"), col("e3.u") === col("e1.v") &&
        col("e3.v") === col("e2.v"))
      .select(explode(array(col("e1.u"), col("e1.v"), col("e2.v")))
        .as("node"))
      .groupBy("node").count()
      .as[(Long, Long)].collect().toMap
    e.unpersist()
    assert(oriented == naive && naive.nonEmpty,
      "degree-oriented counting must equal the naive triple-join")
  }

  test("coOccurrenceEdges: pairs match the naive self-join, and a " +
      "planted hot key fails LOUD at the cap instead of going quadratic") {
    val spark = TestSpark.spark
    import spark.implicits._
    // keys 1..20 each touch a hash-chosen handful of 15 items
    val inc = (for (k <- 1L to 20L; i <- 1L to 15L) yield (k, i))
      .toDF("key", "item")
      .filter(pmod(xxhash64(col("key"), col("item")), lit(3L)) === 0)
      .cache()
    val got = Triangles.coOccurrenceEdges(inc, minShared = 2,
      maxPerKey = 15).as[(Long, Long)].collect().toSet
    val naive = inc.as("a")
      .join(inc.as("b"), col("a.key") === col("b.key") &&
        col("a.item") < col("b.item"))
      .groupBy(col("a.item"), col("b.item"))
      .agg(countDistinct(col("a.key")).as("nk"))
      .filter(col("nk") >= 2)
      .select(col("a.item"), col("b.item"))
      .as[(Long, Long)].collect().toSet
    assert(got == naive && naive.nonEmpty,
      "map-side pair generation must equal the naive keyed self-join")
    // ONE hot key over the cap: the premise must surface as a loud
    // failure naming the key, not as silent quadratic work
    val hot = inc.unionByName(
      (1L to 40L).map(i => (99L, 1000L + i)).toDF("key", "item"))
    val ex = intercept[Exception] {
      Triangles.coOccurrenceEdges(hot, minShared = 2, maxPerKey = 15)
        .count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("coOccurrenceEdges premise")),
      s"expected the loud premise message, got: ${msgs(ex).mkString(" | ")}")
    inc.unpersist()
  }

  // ------------------------------------------------------------ k-core

  test("kCore peels cascades, keeps the dense kernel, refuses past bound") {
    // K4 on 1-4 (every node degree 3) + a pendant chain 4-5-6-7: the
    // chain peels end-in, one node per round (the cascading case), and
    // the 2-core is exactly the K4
    val k4 = for {
      u <- 1L to 4L; v <- 1L to 4L if u < v
    } yield (u, v)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L), (6L, 7L)))
      .toDF("u", "v")
    val got = CacheScope.withScope {
      KCore.kCore(edges, k = 2, maxRounds = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // an empty core converges to an empty frame, not an error
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    assert(CacheScope.withScope {
      KCore.kCore(path, k = 2, maxRounds = 8).count()
    } === 0L)
    // a cascade longer than maxRounds must refuse loudly from EITHER
    // phase (the oracle unrolls exactly maxRounds peels): the local
    // finish throws from inside its task, the distributed loop from the
    // driver — both must carry the shared message
    val long = (1L to 12L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("u", "v")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    Seq(1000000L, 0L).foreach { cutoff =>
      val ex = intercept[Exception] {
        CacheScope.withScope {
          KCore.kCore(long, k = 2, maxRounds = 2, localCutoff = cutoff)
            .count()
        }
      }
      assert(msgs(ex).exists(_.contains("did not converge")),
        s"cutoff $cutoff: ${msgs(ex).mkString(" | ")}")
    }
  }

  test("kCore canonicalizes orientation: both directions fed = one edge") {
    // r7 ADVICE: the dedup was an exact-tuple distinct, so a caller
    // passing (u,v) AND (v,u) double-counted every degree. K4 with
    // every edge in both orientations must still be exactly the 2-core
    // K4 with degree 3 (not 6), and a both-ways path must still have an
    // empty 2-core; self-loops are dropped, not counted as degree 2.
    val k4both = for {
      u <- 1L to 4L; v <- 1L to 4L if u != v
    } yield (u, v)
    val edges = (k4both ++ Seq((4L, 5L), (5L, 4L), (5L, 5L)))
      .toDF("u", "v")
    val got = CacheScope.withScope {
      KCore.kCore(edges, k = 2, maxRounds = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val pathBoth = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("u", "v")
    assert(CacheScope.withScope {
      KCore.kCore(pathBoth, k = 2, maxRounds = 8).count()
    } === 0L)
  }

  test("reliable checkpointing (spark.graft.checkpointDir) preserves " +
      "answers and actually writes checkpoints") {
    // the multi-executor story (r7 VERDICT #5): the iterative loops'
    // round checkpoints switch from executor-local to reliable via
    // config alone — same answers, and the directory must actually
    // receive checkpoint data (proof the reliable path engaged)
    val g = (1L to 300L)
      .map(i => ((i * 2654435761L % 1000000007L) % 40,
        (i * 40503L % 999999937L) % 40))
      .filter(p => p._1 != p._2).toSeq.toDF("u", "v")
    def run(): (Set[(Long, Long)], Set[(Long, Long)]) = CacheScope.withScope {
      val comps = Components.connectedComponents(g.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val core = KCore.kCore(g, k = 4, maxRounds = 32, localCutoff = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (comps, core)
    }
    val baseline = run()
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    spark.conf.set(Checkpoints.ConfKey, dir.toString)
    try {
      assert(run() === baseline)
      val walk = java.nio.file.Files.walk(dir)
      val written =
        try walk.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally walk.close() // walk holds directory handles open
      assert(written > 0, "no checkpoint files written — the reliable " +
        "path never engaged")
    } finally {
      spark.conf.unset(Checkpoints.ConfKey)
      graft.streaming.EventStreams.deleteStagingForTest(dir)
    }
  }

  test("kCore hybrid local finish equals the pure distributed peel") {
    // pseudo-random graph on 60 nodes (hash-derived, deterministic)
    val g = (1L to 400L)
      .map(i => ((i * 2654435761L % 1000000007L) % 60,
        (i * 40503L % 999999937L) % 60))
      .filter(p => p._1 != p._2).toSeq.toDF("u", "v")
    val (hybrid, pure) = CacheScope.withScope {
      val h = KCore.kCore(g, k = 4, maxRounds = 32)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val p = KCore.kCore(g, k = 4, maxRounds = 32, localCutoff = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (h, p)
    }
    assert(hybrid === pure && hybrid.nonEmpty)
  }

  test("components hybrid local finish equals the distributed loops " +
      "(both propagation and star alternation)") {
    // chains (adversarial diameter for hash-min) + a pseudo-random
    // clump + singleton-ish self-loop vertices, deterministic
    val chains = (0L until 120L).filter(i => (i + 4) % 40 != 0)
      .map(i => (i, i + 4))
    val clump = (1L to 200L)
      .map(i => (200 + (i * 2654435761L % 1000000007L) % 50,
        200 + (i * 40503L % 999999937L) % 50))
    val g = (chains ++ clump :+ (999L, 999L)).toDF("a", "b")
    CacheScope.withScope {
      val localStars = Components.connectedComponentsStars(g)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pureStars = Components.connectedComponentsStars(g,
          localCutoff = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(localStars === pureStars && localStars.nonEmpty)
      // hash-min on the clump-only graph (its diameter fits maxIter)
      val cg = (clump :+ (999L, 999L)).toDF("a", "b")
      val localProp = Components.connectedComponents(cg)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val pureProp = Components.connectedComponents(cg,
          localCutoff = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(localProp === pureProp && localProp.nonEmpty)
      // both families agree with each other on the shared graph
      assert(localProp === pureStars.filter(p =>
        localProp.map(_._1).contains(p._1)))
    }
  }

  // ----------------------------------------- containment decontamination

  test("containment ratio: graded scoring, positional-repeat dedupe") {
    val docs = Seq(
      // the benchmark item: 6 words -> 2 distinct 5-grams
      (3L, "alpha beta gamma delta eps zeta"),
      // covers ONE of the two grams -> 500000 ppm, at the threshold
      (10L, "alpha beta gamma delta eps other words beyond"),
      // repeats that gram positionally TWICE -> still 1 distinct shared
      (11L, "alpha beta gamma delta eps alpha beta gamma delta eps"),
      // shares nothing
      (12L, "unrelated text with five grams here today")
    ).toDF("doc_id", "text")
    val got = CacheScope.withScope {
      TextDedup.containmentDecontaminate(docs,
          docs.filter(col("doc_id") === 3L), n = 5, minPpm = 500000L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    }
    // bench doc flags itself at 10^6; docs 10 and 11 at exactly half
    assert(got === Set((3L, 2L, 1000000L), (10L, 1L, 500000L),
      (11L, 1L, 500000L)))
  }
}
