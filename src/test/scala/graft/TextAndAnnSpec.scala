package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TextFns, VecFns}
import graft.operators.{Ann, Pq, TextDedup}

/** North-star extension operators: text analysis, near-dup dedup (MinHash
  * LSH + SimHash), and embedding similarity search.
  */
class TextAndAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fingerprint is invariant to case, punctuation, and spacing") {
    val df = Seq("The  Quick,  Brown Fox!", "the quick brown fox")
      .toDF("text").select(TextFns.fingerprint(col("text")).as("f"))
    assert(df.as[String].collect().toSet.size == 1)
  }

  test("shingles: n tokens yield n-2 3-gram shingles (distinct)") {
    val df = Seq("a b c d e").toDF("text")
      .select(split(col("text"), " ").as("ws"))
      .select(TextFns.shingles(col("ws"), 3))
    assert(df.as[Seq[String]].collect().head ==
      Seq("a b c", "b c d", "c d e"))
  }

  test("langId: marker priority and unknown fallback") {
    val df = Seq("the cat and the hat", "el gato y la casa de que", "zzz qqq")
      .toDF("text")
      .select(TextFns.langId(split(col("text"), " ")).as("l"))
      .select(col("l.predicted_lang"))
    assert(df.as[String].collect().toSeq == Seq("en", "es", "unknown"))
  }

  test("MinHash-LSH near-dup equals exact O(n^2) Jaccard at sf0.001") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val lsh = TextDedup.jaccardPairsLsh(docs, threshold = 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // exact baseline: all-pairs via the same verify machinery with an
    // all-pairs candidate set
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val allPairs = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
    } yield (ids(i), ids(j))).toDF("doc_a", "doc_b")
    val shing = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(TextFns.shingles(col("ws"), 3)).as("shingle"))
    val sizes = shing.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val exact = allPairs
      .join(shing.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shing.as("sb"), col("doc_b") === col("sb.doc_id") &&
        col("sa.shingle") === col("sb.shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
      .filter(col("inter").cast("double") /
        (col("za.n") + col("zb.n") - col("inter")) >= 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
    assert(lsh.nonEmpty, "testdata should contain planted near-dups")
  }

  test("char-gram Jaccard prefix filter is lossless vs brute force") {
    val docs = Tables.documents(spark, TestSpark.sf)
    // Brute baseline: every pair, exact intersection on distinct gram
    // arrays. n=5 exercises the DENSE-vocab worst case (tiny gram space,
    // every gram frequent — the regime where a broken prefix bound would
    // actually lose pairs); n=12 is the registered gate configuration.
    for (n <- Seq(5, 12)) {
      def gramArr(c: org.apache.spark.sql.Column) =
        array_distinct(expr(
          s"transform(sequence(1, length(t) - ${n - 1}), " +
            s"i -> substring(t, i, $n))"))
      val ga = docs.filter(length(col("text")) >= n)
        .select(col("doc_id"), lower(col("text")).as("t"))
        .select(col("doc_id"), gramArr(col("t")).as("gs"))
      val brute = ga.as("a")
        .join(ga.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          size(array_intersect(col("a.gs"), col("b.gs"))).as("inter"),
          size(col("a.gs")).as("na"), size(col("b.gs")).as("nb"))
        .filter(lit(10) * col("inter") >=
          lit(7) * (col("na") + col("nb") - col("inter")))
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val filtered = TextDedup
        .charGramJaccardJoin(docs, n = n, thetaNum = 7, thetaDen = 10)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(filtered == brute, s"prefix filter lost/added pairs at n=$n")
      assert(filtered.nonEmpty, s"no qualifying pairs at n=$n — weak test")
    }
  }

  test("connected components agree with union-find on random graphs") {
    import graft.operators.Components
    // Deterministic LCG so failures reproduce; three densities around the
    // percolation threshold give a mix of many small and few giant
    // components. Reference answer: textbook union-find on the driver.
    var seed = 0x5DEECE66DL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    for (nEdges <- Seq(20, 60, 150)) {
      val n = 100
      val edges = Seq.fill(nEdges) {
        val x = nextInt(n); val y = nextInt(n - 1)
        (x.toLong, (if (y >= x) y + 1 else y).toLong) // no self-loops
      }
      val parent = Array.tabulate(n)(identity)
      def find(v: Int): Int = {
        var r = v; while (parent(r) != r) r = parent(r)
        var c = v
        while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (s, d) =>
        val (rs, rd) = (find(s.toInt), find(d.toInt))
        if (rs != rd) parent(math.max(rs, rd)) = math.min(rs, rd)
      }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val want = touched.map(v => v -> find(v.toInt).toLong).toMap
      val got = Components
        .connectedComponents(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      // union-find roots are minimal per component because unions always
      // point the larger root at the smaller — same canonical as hash-min
      assert(got == want, s"mismatch at $nEdges edges")
    }
  }

  test("connected components: chain, triangle, isolated edge, any col names") {
    import graft.operators.Components
    // 1-2-3-4-5 chain (diameter 4 — forces multiple propagation rounds,
    // a clique-ish near-dup cluster would converge in one), a 10-11-12
    // triangle, and an isolated 20-21 edge. Column names are positional.
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (21L, 20L))
      .toDF("left_id", "right_id")
    val got = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    assert(got == want)
  }

  test("star-contraction components agree with hash-min and union-find " +
      "on random sparse graphs") {
    import graft.operators.Components
    var seed = 0x2545F4914F6CDD1DL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    for (nEdges <- Seq(15, 60, 150)) {
      val n = 80
      val edges = Seq.fill(nEdges) {
        val x = nextInt(n); val y = nextInt(n - 1)
        (x.toLong, (if (y >= x) y + 1 else y).toLong)
      }.toDF("src", "dst")
      val viaStars = Components.connectedComponentsStars(edges)
        .as[(Long, Long)].collect().toMap
      val viaHashMin = Components.connectedComponents(edges)
        .as[(Long, Long)].collect().toMap
      assert(viaStars == viaHashMin, s"mismatch at $nEdges edges")
    }
  }

  test("star contraction converges on a chain whose diameter exceeds " +
      "hash-min's round bound; hash-min refuses it loudly") {
    import graft.operators.Components
    // a single 301-node path: diameter 300 ≫ hash-min's default 50-round
    // bound (one hop per round); the star alternation pointer-jumps it
    val chain = (0L until 300L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Components.connectedComponentsStars(chain)
      .as[(Long, Long)].collect()
    assert(got.length == 301 && got.forall(_._2 == 0L),
      "all chain nodes must collapse to component 0")
    // the r15 local union-find finish solves small graphs exactly, so
    // the hash-min refusal is now the OVER-CUTOFF path's contract —
    // pin it with the local finish forced off (localCutoff = 0), and
    // pin that the default path solves the same chain exactly instead
    val viaLocal = Components.connectedComponents(chain)
      .as[(Long, Long)].collect()
    assert(viaLocal.length == 301 && viaLocal.forall(_._2 == 0L),
      "the local finish must solve the long chain exactly")
    val refused = intercept[IllegalArgumentException] {
      Components.connectedComponents(chain, localCutoff = 0L).count()
    }
    assert(refused.getMessage.contains("did not converge"),
      s"hash-min must refuse the long chain, got: ${refused.getMessage}")
  }

  test("star-contraction components: chain, triangle, isolated edge, " +
      "self-loop vertex, any column names") {
    import graft.operators.Components
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (21L, 20L), (30L, 30L))
      .toDF("left_id", "right_id")
    val got = Components.connectedComponentsStars(edges)
      .as[(Long, Long)].collect().toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L,
      30L -> 30L)
    assert(got == want)
  }

  test("SimHash: exact copies collide; groups contain the planted copies") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val groups = TextDedup.simhashGroups(docs.unionByName(copies))
    val nCopied = docs.filter(col("doc_id") % 10 === 0).count()
    assert(groups.count() >= nCopied,
      "every planted exact copy must share its original's simhash")
  }

  test("cosine: known vectors") {
    val df = Seq((Array(1f, 0f), Array(0f, 1f)), (Array(1f, 1f), Array(1f, 1f)))
      .toDF("a", "b")
      .select(VecFns.cosine(VecFns.toDouble(col("a")),
        VecFns.toDouble(col("b"))).as("c"))
    val got = df.as[Double].collect()
    assert(math.abs(got(0)) < 1e-12 && math.abs(got(1) - 1.0) < 1e-12)
  }

  test("ANN IVF: valid ranked output with nonzero recall vs exact baseline") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val q = e.filter(col("vec_id") % 50 === 0)
    val ivf = Ann.ivfTopK(e, q, 5).as[(Long, Long, Int)].collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    val bruteSet = Ann.bruteTopK(e, q, 5).as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toSet
    val recall = ivf.count(r => bruteSet.contains((r._1, r._2))).toDouble /
      bruteSet.size
    // measured ~0.42 at 2 Lloyd rounds on sf0.001; 0.25 floor catches a
    // real regression while leaving noise headroom (review finding: the
    // old 0.05 floor would also have passed a catastrophic regression)
    assert(recall > 0.25, s"IVF recall $recall vs exact baseline")
  }

  test("ANN IVF exhaustive probe (nprobe = nCells) equals the exact " +
      "brute-force top-k — the q35 gate's premise") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val q = e.filter(col("vec_id") % 50 === 0)
    val ivf = Ann.ivfTopK(e, q, 5, nprobe = 8)
      .as[(Long, Long, Int)].collect().toSeq
    val brute = Ann.bruteTopK(e, q, 5).as[(Long, Long, Int)].collect().toSeq
    assert(ivf == brute && brute.nonEmpty,
      "with every cell probed, learned centroids must be output-invisible")
  }

  test("cross-polytope top-k: exhaustive probe equals brute; recall " +
      "monotone in probe count") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val q = e.filter(col("vec_id") % 50 === 0)
    val brute = Ann.bruteTopK(e, q, 5).as[(Long, Long, Int)].collect().toSeq
    val exhaustive = CacheScope.withScope {
      Ann.cpTopK(e, q, 5, probes = 128).as[(Long, Long, Int)].collect().toSeq
    }
    assert(exhaustive == brute && brute.nonEmpty,
      "with every cell probed, the cp partition must be output-invisible")
    val bruteSet = brute.map(r => (r._1, r._2)).toSet
    def recallAt(p: Int): Double = CacheScope.withScope {
      val got = Ann.cpTopK(e, q, 5, probes = p)
        .as[(Long, Long, Int)].collect()
      got.count(r => bruteSet.contains((r._1, r._2))).toDouble / bruteSet.size
    }
    val rs = Seq(1, 8, 32).map(recallAt)
    assert(rs == rs.sorted, s"recall must be non-decreasing in probes: $rs")
    assert(rs.last > 0.5, s"probe-32 recall ${rs.last} vs exact baseline")
    // the probe list enumerates DISTINCT cells and, at 2·d₂, covers
    // every cell exactly once (the exhaustive-gate premise); the far
    // half is the near half's sign complement in reverse-distance order
    graft.plans.GraftFunctions.register(spark)
    val cells = q.limit(1)
      .select(expr("graft_cplsh_probe(CAST(embedding AS ARRAY<DOUBLE>), " +
        "128, 64)").as("cs"))
      .as[Seq[Long]].head()
    assert(cells.distinct.size == 128 && cells.toSet == (0L until 128L).toSet,
      "exhaustive probe must enumerate all 2*d2 cells exactly once")
    assert(cells(127) == (cells(0) ^ 1L),
      "the farthest cell is the nearest cell's sign complement")
  }

  test("incremental dedup: equals the exact incoming-side pair set and " +
      "never emits corpus-corpus pairs") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    // corpus with INTERNAL duplicates (scaled copies at +200000): a
    // correct incremental pass must never surface them
    val base = e.select("vec_id", "embedding")
    val corpus = base.unionByName(base.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 200000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding")))
    // incoming: fresh ids + planted copies of corpus rows at +500000
    val incoming = base.filter(col("vec_id") % 9 === 1)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    val got = CacheScope.withScope {
      Ann.cosinePairsCpIncremental(corpus, incoming, 0.4)
        .as[(Long, Long)].collect().toSet
    }
    val corpusIds = corpus.select("vec_id").as[Long].collect().toSet
    val all = corpus.unionByName(incoming)
    val expected = Ann.cosinePairsBrute(all, 0.4)
      .as[(Long, Long)].collect().toSet[(Long, Long)]
      .filter(p => !(corpusIds(p._1) && corpusIds(p._2)))
    assert(got == expected,
      s"incremental pairs ${got.size} != exact incoming-side ${expected.size}")
    assert(got.forall { case (a, b) => !(corpusIds(a) && corpusIds(b)) },
      "corpus-corpus pairs must be structurally impossible")
    // the planted +500000 copies guarantee real incoming-corpus hits
    assert(got.exists { case (a, b) => corpusIds(a) || corpusIds(b) })
  }

  test("cp index artifact: a parquet-roundtripped index probed by a shard " +
      "equals the live incremental path and the exact restricted pair set") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val corpus = e.select("vec_id", "embedding")
    val incoming = e.filter(col("vec_id") % 9 === 1)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    val dir = "/tmp/graft_test_cpindex"
    CacheScope.withScope { Ann.writeCpIndex(corpus, dir, 0.4) }
    val got = CacheScope.withScope {
      Ann.cosinePairsCpIndexed(dir, incoming, 0.4)
        .as[(Long, Long)].collect().toSet
    }
    // the live path PINNED to the artifact's stored parameters must be
    // candidate-identical (identical k/bands ⇒ identical rotations ⇒
    // identical band rows — the equivalence the artifact contract rests
    // on); both must equal the exact incoming-side pair set
    val meta = spark.read.parquet(s"$dir/meta_0").head()
    val live = CacheScope.withScope {
      Ann.cosinePairsCpIncremental(corpus, incoming, 0.4,
        hashesPerBand = meta.getAs[Int]("k"),
        bands = meta.getAs[Int]("bands"))
        .as[(Long, Long)].collect().toSet
    }
    assert(got == live && got.nonEmpty,
      s"indexed probe ${got.size} != live incremental ${live.size}")
    val corpusIds = corpus.select("vec_id").as[Long].collect().toSet
    val expected = Ann.cosinePairsBrute(corpus.unionByName(incoming), 0.4)
      .as[(Long, Long)].collect().toSet[(Long, Long)]
      .filter(p => !(corpusIds(p._1) && corpusIds(p._2)))
    assert(got == expected,
      s"indexed probe ${got.size} != exact incoming-side ${expected.size}")
  }

  test("cp index artifact: parameter drift and id collisions refuse loudly") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val corpus = e.select("vec_id", "embedding")
    val incoming = e.filter(col("vec_id") % 9 === 1)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    val dir = "/tmp/graft_test_cpindex_drift"
    CacheScope.withScope { Ann.writeCpIndex(corpus, dir, 0.4) }
    // threshold drift: the stored band rows were sized for 0.4
    val te = intercept[IllegalArgumentException] {
      Ann.cosinePairsCpIndexed(dir, incoming, 0.7)
    }
    assert(te.getMessage.contains("threshold drift"))
    // target-miss drift: a tighter recall demand than the artifact's
    val me = intercept[IllegalArgumentException] {
      Ann.cosinePairsCpIndexed(dir, incoming, 0.4, targetMiss = 1e-6)
    }
    assert(me.getMessage.contains("target_miss drift"))
    // incoming id already present in the indexed corpus
    val ce = intercept[IllegalArgumentException] {
      CacheScope.withScope {
        Ann.cosinePairsCpIndexed(dir,
          incoming.unionByName(corpus.limit(1)), 0.4)
      }
    }
    assert(ce.getMessage.contains("already exist"))
    // duplicate ids WITHIN the shard
    val de = intercept[IllegalArgumentException] {
      CacheScope.withScope {
        Ann.cosinePairsCpIndexed(dir,
          incoming.unionByName(incoming.limit(1)), 0.4)
      }
    }
    assert(de.getMessage.contains("not one id space"))
    // and the LIVE path's union check (r9 ADVICE: the scaladoc claimed
    // an assertion that did not exist — now it does)
    val le = intercept[IllegalArgumentException] {
      CacheScope.withScope {
        Ann.cosinePairsCpIncremental(corpus, corpus.limit(1), 0.4)
      }
    }
    assert(le.getMessage.contains("not one id space"))
  }

  test("cp index append: appended epochs serve identically to a " +
      "monolithic build; torn epochs are invisible; parameter-currency " +
      "and id collisions refuse") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val corpus = e.select("vec_id", "embedding")
    val base = corpus.filter(col("vec_id") % 5 =!= 2)
    val grown = corpus.filter(col("vec_id") % 5 === 2)
    val incoming = e.filter(col("vec_id") % 9 === 1)
      .select((col("vec_id") + 500000L).as("vec_id"), col("embedding"))
    val mono = "/tmp/graft_test_cpindex_mono"
    val app = "/tmp/graft_test_cpindex_appended"
    CacheScope.withScope { Ann.writeCpIndex(corpus, mono, 0.4) }
    CacheScope.withScope {
      Ann.writeCpIndex(base, app, 0.4)
      Ann.appendCpIndex(app, grown)
    }
    // same final corpus, two construction paths — outputs must agree
    // even though the appended artifact's (k, bands) derive from the
    // BASE count (the banding recall bound is count-independent)
    val viaAppend = CacheScope.withScope {
      Ann.cosinePairsCpIndexed(app, incoming, 0.4)
        .as[(Long, Long)].collect().toSet
    }
    val viaMono = CacheScope.withScope {
      Ann.cosinePairsCpIndexed(mono, incoming, 0.4)
        .as[(Long, Long)].collect().toSet
    }
    assert(viaAppend == viaMono && viaAppend.nonEmpty,
      s"append-built ${viaAppend.size} != monolithic ${viaMono.size}")
    // TORN append: epoch=2 data lands with NO meta_2 — copies of the
    // epoch=1 vectors under fresh ids, which would pair with incoming
    // at cosine 1 IF served (the %45-residue overlap rows are the
    // same vectors). The probe must not change by a single pair.
    spark.read.parquet(s"$app/vectors/epoch=1")
      .select((col("vec_id") + 700000L).as("vec_id"), col("v"))
      .write.parquet(s"$app/vectors/epoch=2")
    spark.read.parquet(s"$app/bands/epoch=1")
      .select((col("vec_id") + 700000L).as("vec_id"), col("band_id"),
        col("code"))
      .write.parquet(s"$app/bands/epoch=2")
    val viaTorn = CacheScope.withScope {
      Ann.cosinePairsCpIndexed(app, incoming, 0.4)
        .as[(Long, Long)].collect().toSet
    }
    assert(viaTorn == viaAppend,
      "a torn epoch (data without meta_N) must be invisible to probes")
    // parameter currency: grow the corpus until the k-chooser derives
    // a different k than the artifact stored (the factor is DERIVED —
    // k is a step function of n, capped; the base here sits below the
    // cap so a flipping factor must exist) — append must refuse
    val n1 = spark.read.parquet(s"$app/meta_1").head()
      .getAs[Long]("corpus_count")
    val k1 = spark.read.parquet(s"$app/meta_1").head().getAs[Int]("k")
    val factor = Iterator(2, 4, 8, 16, 32, 64, 128, 256, 512)
      .find(f => graft.plans.CrossPolytope.chooseHashesPerBand(
        n1 * f, 0.4, 64, 1e-4) != k1)
    assert(factor.nonEmpty,
      s"test premise: no growth factor flips k from $k1 at n=$n1 — " +
        "base corpus too large (k at cap)?")
    val big = (0 until factor.get).map(i => corpus.select(
        (col("vec_id") + lit(1000000L * (i + 1))).as("vec_id"),
        col("embedding")))
      .reduce(_ unionByName _)
    val pe = intercept[IllegalArgumentException] {
      CacheScope.withScope { Ann.appendCpIndex(app, big) }
    }
    assert(pe.getMessage.contains("outgrown"))
    // an artifact built with EXPLICIT parameters skips the currency
    // check by design (pinning is how a pipeline sizes for planned
    // growth): the same frame that refused above must append cleanly
    val b1 = spark.read.parquet(s"$app/meta_1").head()
      .getAs[Int]("bands")
    val pinned = "/tmp/graft_test_cpindex_pinned"
    CacheScope.withScope {
      Ann.writeCpIndex(base, pinned, 0.4, hashesPerBand = k1, bands = b1)
      Ann.appendCpIndex(pinned, big)
    }
    val pm = spark.read.parquet(s"$pinned/meta_1").head()
    assert(pm.getAs[Int]("epoch") == 1 &&
      !pm.getAs[Boolean]("params_derived"))
    // id collision with the stored corpus refuses
    val ce = intercept[IllegalArgumentException] {
      CacheScope.withScope {
        Ann.appendCpIndex(app, corpus.limit(1))
      }
    }
    assert(ce.getMessage.contains("already exist"))
    // an artifact with no complete epoch refuses by name
    val ne = intercept[IllegalArgumentException] {
      Ann.cosinePairsCpIndexed("/tmp/graft_test_cpindex_nonexistent",
        incoming, 0.4)
    }
    assert(ne.getMessage.contains("no complete epoch"))
  }

  test("cp index search: threshold-floored top-k over the stored artifact " +
      "equals the exact floored baseline; drift and dup queries refuse") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val corpus = e.select("vec_id", "embedding")
    // planted scaled copies guarantee >= 0.4 hits (cosine ≈ 1 to their
    // source); the %50 originals exercise the query-id-in-corpus
    // self-exclusion path
    val queries = e.filter(col("vec_id") % 9 === 1)
      .select((col("vec_id") + 500000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      .unionByName(e.filter(col("vec_id") % 50 === 0)
        .select("vec_id", "embedding"))
    val dir = "/tmp/graft_test_cpindex_search"
    CacheScope.withScope { Ann.writeCpIndex(corpus, dir, 0.4) }
    val got = CacheScope.withScope {
      Ann.cpTopKIndexed(dir, queries, 5, 0.4)
        .as[(Long, Long, Int)].collect().toSeq.sorted
    }
    // exact baseline: rank among ALL corpus neighbors at sim >= the
    // floor — the contract the banded candidates must reproduce
    val qv = queries.select(col("vec_id").as("query_id"),
      VecFns.toDouble(col("embedding")).as("qv"))
    val cv = corpus.select(col("vec_id").as("neighbor_id"),
      VecFns.toDouble(col("embedding")).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val expected = cv.join(broadcast(qv),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", VecFns.cosine(col("qv"), col("cv")))
      .filter(col("sim") >= 0.4)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(got == expected && got.nonEmpty,
      s"indexed search ${got.size} rows != exact floored ${expected.size}")
    // drift refuses under THIS caller's name (the shared meta reader
    // is parameterized by who — r10 readCpMeta extraction)
    val te = intercept[IllegalArgumentException] {
      Ann.cpTopKIndexed(dir, queries, 5, 0.7)
    }
    assert(te.getMessage.contains("cpTopKIndexed: threshold drift"))
    // duplicate query ids would merge two result groups — refuse
    val de = intercept[IllegalArgumentException] {
      CacheScope.withScope {
        Ann.cpTopKIndexed(dir,
          queries.unionByName(queries.limit(1)), 5, 0.4)
      }
    }
    assert(de.getMessage.contains("within the query batch"))
  }

  test("PQ ADC: valid ranked output, recall vs exact baseline, determinism") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val q = e.filter(col("vec_id") % 50 === 0)
    val pq = Pq.adcTopK(e, q, 5)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect()
    assert(pq.nonEmpty)
    pq.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // embeddings are unit-norm ⇒ L2 ranking ≡ cosine ranking, so the
    // exact cosine top-k is the right baseline for ADC's L2 codes
    val bruteSet = Ann.bruteTopK(e, q, 5).as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toSet
    val recall = pq.count(r => bruteSet.contains((r._1, r._2))).toDouble /
      bruteSet.size
    assert(recall > 0.2, s"PQ recall $recall vs exact baseline")
    // integer ADC + fixed-point training ⇒ bit-stable across runs
    val again = Pq.adcTopK(e, q, 5)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect()
    assert(pq.toSeq == again.toSeq, "PQ output is not deterministic")
  }

  test("salted aggregation equals direct aggregation (algebraic identity)") {
    val ev = Tables.events(spark, TestSpark.sf)
    val salted = graft.operators.Skew
      .saltedStats(ev, "user_id", "value", "event_id")
      .as[(Long, Long, Double)].collect().toSet
    val direct = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("sum_value"))
      .as[(Long, Long, Double)].collect().toSet
    assert(salted == direct)
  }

  test("approx_percentile within 2% of the exact percentile") {
    val exact = Queries.all("q39_percentiles")(spark, TestSpark.sf)
      .select("l_returnflag", "p50_qty").as[(String, Double)]
      .collect().toMap
    // q39 is on l_quantity; compute the exact price median here for a
    // like-for-like comparison with q46's l_extendedprice sketch
    val exactPrice = Tables.lineitem(spark, TestSpark.sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .as[(String, Double)].collect().toMap
    val approx = Queries.all("q46_approx_percentile")(spark, TestSpark.sf)
      .select("l_returnflag", "p50").as[(String, Double)]
      .collect().toMap
    approx.foreach { case (flag, p) =>
      val e = exactPrice(flag)
      assert(math.abs(p - e) / e < 0.02, s"$flag: approx $p vs exact $e")
    }
    assert(exact.nonEmpty)
  }

  test("cosine pairs: blocked grid and banded LSH both equal the brute baseline") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val brute = Ann.cosinePairsBrute(e, 0.4)
      .as[(Long, Long)].collect().toSet
    val blocked = Ann.cosinePairsBlocked(e, 0.4, chunks = 4)
      .as[(Long, Long)].collect().toSet
    val lsh = Ann.cosinePairsLsh(e, 0.4)
      .as[(Long, Long)].collect().toSet
    assert(blocked == brute, "chunk-grid must lose/invent nothing")
    assert(lsh == brute,
      "threshold-derived banding must stay lossless at adversarial 0.4")
  }

  test("banding adapts to the threshold: fewer bands at realistic sims") {
    // the adversarial 0.4 gate gets MORE than the empirically-needed 35
    // bands; a realistic 0.7 run pays roughly half the old fixed 48
    assert(Ann.bandsForThreshold(0.4, 4) >= 48)
    assert(Ann.bandsForThreshold(0.7, 4) < 48 / 1.5)
    assert(Ann.bandsForThreshold(0.9, 4) < 15)
    // monotone: easier thresholds never need more bands
    val bs = Seq(0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95)
      .map(Ann.bandsForThreshold(_, 4))
    assert(bs == bs.sorted.reverse)
  }

  test("lshBucket refuses mixed-dimension vectors (null-poisoned dot trap)") {
    val mixed = spark.range(3).select(col("id").as("vec_id"),
      when(col("id") === 2,
        array((0 until 16).map(i => lit(i.toDouble)): _*))
        .otherwise(array((0 until 64).map(i => lit(i.toDouble)): _*))
        .as("v"))
    val ex = intercept[Exception] {
      mixed.select(VecFns.lshBucket(col("v"), 64, 4)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("declared 64-dimensional")))
  }

  test("LshBands refuses mixed-dimension corpora instead of silent recall loss") {
    graft.plans.GraftFunctions.register(spark)
    val mixed = spark.range(4).select(col("id").as("vec_id"),
      when(col("id") === 3,
        array((0 until 32).map(i => lit(i.toDouble)): _*))
        .otherwise(array((0 until 64).map(i => lit(i.toDouble)): _*))
        .as("v"))
    val ex = intercept[Exception] {
      mixed.select(expr("graft_lshbands(v, 4, 8, 64)")).collect()
    }
    assert(ex.getMessage.contains("mixed dimensions") ||
      Option(ex.getCause).exists(_.getMessage.contains("mixed dimensions")))
  }

  test("cosine pairs LSH at a realistic threshold: planted near-copies, few bands") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    // cosine is scale-invariant: a uniformly scaled copy is a planted
    // sim≈1.0 pair; the random base pairs sit far below the threshold
    val copies = e.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
    val corpus = e.select("vec_id", "embedding").unionByName(copies)
    val brute = Ann.cosinePairsBrute(corpus, 0.95)
      .as[(Long, Long)].collect().toSet
    val lsh = Ann.cosinePairsLsh(corpus, 0.95, planesPerBand = 4, bands = 16)
      .as[(Long, Long)].collect().toSet
    assert(lsh == brute)
    assert(brute.size >= e.count(), "every planted copy pair must be found")
  }

  test("cross-polytope pairs equal the brute baseline at adversarial 0.4 " +
      "with derived parameters") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val brute = Ann.cosinePairsBrute(e, 0.4)
      .as[(Long, Long)].collect().toSet
    val cp = CacheScope.withScope {
      Ann.cosinePairsCp(e, 0.4).as[(Long, Long)].collect().toSet
    }
    assert(cp == brute,
      "derived cross-polytope banding must stay lossless at 0.4")
  }

  test("cross-polytope pairs at a realistic threshold: planted " +
      "near-copies, explicit k=2") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val copies = e.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
    val corpus = e.select("vec_id", "embedding").unionByName(copies)
    val brute = Ann.cosinePairsBrute(corpus, 0.95)
      .as[(Long, Long)].collect().toSet
    val cp = CacheScope.withScope {
      Ann.cosinePairsCp(corpus, 0.95, hashesPerBand = 2)
        .as[(Long, Long)].collect().toSet
    }
    assert(cp == brute)
    assert(brute.size >= e.count(), "every planted copy pair must be found")
  }

  test("cross-polytope at 0.7 on the stress construction: signed-" +
      "permutation copies, lossless vs brute") {
    // the Stress emb corpus in miniature: every 10th vector duplicated
    // (within-copy cosine exactly 1), 3 copies under per-copy signed
    // permutations (orthogonal — cross-copy cosines collapse to the
    // random tail). cp with derived parameters must equal brute at 0.7,
    // the production threshold the stress row measures.
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select("vec_id", "embedding")
    val planted = e.unionByName(e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding")))
    val corpus = (0 until 3).map { k =>
      planted.select((col("vec_id") + lit(k * 100000000L)).as("vec_id"),
        expr(
          s"""transform(sequence(0, 63), i ->
             |  CAST((CASE WHEN pmod(hash(i, $k), 2) = 0
             |        THEN 1.0 ELSE -1.0 END) *
             |  element_at(embedding, ((i + ${7 * k}) % 64) + 1) AS FLOAT))"""
            .stripMargin).as("embedding"))
    }.reduce(_ unionByName _)
    val brute = Ann.cosinePairsBrute(corpus, 0.7)
      .as[(Long, Long)].collect().toSet
    val cp = CacheScope.withScope {
      Ann.cosinePairsCp(corpus, 0.7).as[(Long, Long)].collect().toSet
    }
    assert(cp == brute,
      s"cp lost/invented pairs at 0.7: ${cp.size} vs brute ${brute.size}")
    assert(brute.size >= e.count() * 3 / 10,
      "the planted within-copy duplicate pairs must be present")
  }

  test("cross-polytope machinery: FHT is orthogonal up to √n, band " +
      "derivation monotone, k grows with corpus size, bulk collides " +
      "near-uniformly") {
    import graft.plans.CrossPolytope
    // FHT orthogonality: <Hx, Hy> = n·<x, y> exactly (integer inputs)
    val n = 64
    val rnd = new scala.util.Random(7)
    val x = Array.fill(n)(rnd.nextInt(9).toDouble - 4)
    val y = Array.fill(n)(rnd.nextInt(9).toDouble - 4)
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (p, q) => p * q }.sum
    val d0 = dot(x, y)
    val hx = x.clone(); val hy = y.clone()
    CrossPolytope.fht(hx, n); CrossPolytope.fht(hy, n)
    assert(dot(hx, hy) === d0 * n,
      "unnormalized FHT must scale inner products by exactly n")
    // collision probability is monotone in the threshold, and the bulk
    // (cosine 0) probability sits near the uniform 1/(2n) over 128 cells
    val p4 = CrossPolytope.collisionProb(0.4, 64)
    val p7 = CrossPolytope.collisionProb(0.7, 64)
    val p9 = CrossPolytope.collisionProb(0.9, 64)
    val pBulk = CrossPolytope.collisionProb(0.0, 64)
    assert(p4 < p7 && p7 < p9, s"p must rise with cosine: $p4 $p7 $p9")
    assert(pBulk > 0.5 / 128 && pBulk < 4.0 / 128,
      s"bulk collision $pBulk should be near-uniform over 2·64 cells")
    // band counts: monotone decreasing in threshold at fixed k
    val bs = Seq(0.4, 0.6, 0.7, 0.9).map(CrossPolytope.bandsFor(_, 1, 64))
    assert(bs == bs.sorted.reverse, s"bands must fall with threshold: $bs")
    // k selection: tiny corpora pick k=1, large corpora pick larger k
    val kSmall = CrossPolytope.chooseHashesPerBand(500L, 0.7, 64)
    val kLarge = CrossPolytope.chooseHashesPerBand(1000000L, 0.7, 64)
    assert(kSmall >= 1 && kLarge > kSmall,
      s"k must grow with corpus size: n=500 -> $kSmall, n=1e6 -> $kLarge")
  }

  test("cross-polytope refuses mixed-dimension corpora") {
    graft.plans.GraftFunctions.register(spark)
    val mixed = spark.range(4).select(col("id").as("vec_id"),
      when(col("id") === 3,
        array((0 until 32).map(i => lit(i.toDouble)): _*))
        .otherwise(array((0 until 64).map(i => lit(i.toDouble)): _*))
        .as("v"))
    val ex = intercept[Exception] {
      mixed.select(expr("graft_cplsh(v, 1, 8, 64)")).collect()
    }
    assert(ex.getMessage.contains("mixed dimensions") ||
      Option(ex.getCause).exists(_.getMessage.contains("mixed dimensions")))
  }

  test("LSH band buckets are capped: degenerate identical corpus stays linear") {
    graft.plans.GraftFunctions.register(spark)
    // 1000 byte-identical docs: every band bucket collapses to ONE bucket
    // of 1000 — uncapped, the band self-join is O(n²)=499500 pairs; the
    // cap-100 hash salt spreads it over 10 slices, bounding candidates
    // near 10 × C(100,2) ≈ 49.5k (multinomial slice sizes wobble a bit)
    val sigs = spark.range(1000)
      .select(col("id").as("doc_id"),
        split(lit("alpha beta gamma delta epsilon zeta"), " ").as("ws"))
      .select(col("doc_id"), TextFns.shingles(col("ws"), 3).as("sh"))
      .select(col("doc_id"), expr("graft_minhash64(sh)").as("sig"))
    val cand = TextDedup.lshCandidates(sigs,
      bands = 16, r = 4, bucketCap = 100)
    val n = cand.count()
    assert(n < 120000, s"candidates must stay ~n×cap/2, not O(n²): $n")
    assert(n > 10000, s"slices must still pair internally: $n")
  }

  test("ANN: brute top-k is exact; LSH returns valid ranked subsets") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val q = e.filter(col("vec_id") % 50 === 0)
    val brute = Ann.bruteTopK(e, q, 5)
    val perQuery = brute.groupBy("query_id").count().as[(Long, Long)]
      .collect().toMap
    assert(perQuery.values.forall(_ == 5))
    val lsh = Ann.lshTopK(e, q, 5).as[(Long, Long, Int)].collect()
    val bruteSet = brute.as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toSet
    // every LSH hit is a real neighbor pair; ranks are contiguous from 1
    lsh.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    assert(lsh.nonEmpty)
    val recall = lsh.count(r => bruteSet.contains((r._1, r._2))).toDouble /
      bruteSet.size
    assert(recall > 0.0) // random 64-d data: buckets thin the candidates

    // multi-probe: widening the probe radius can only ADD candidates,
    // so recall is monotone in probeHamming...
    def recallAt(ph: Int): Double = {
      val rows = Ann.lshTopK(e, q, 5, probeHamming = ph)
        .as[(Long, Long, Int)].collect()
      rows.count(r => bruteSet.contains((r._1, r._2))).toDouble /
        bruteSet.size
    }
    val r0 = recallAt(0)
    val r2 = recallAt(2)
    assert(r0 === recall, "probeHamming = 0 must be the classic probe")
    assert(r2 >= r0, s"multi-probe recall regressed: probe2 $r2 < probe0 $r0")
    // ...and probing every bucket (probeHamming = nPlanes) IS the exact
    // brute-force answer — the q25 gate projection (rank-exact, not
    // just recall 1.0)
    val exhaustive = Ann.lshTopK(e, q, 5, probeHamming = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(exhaustive === brute.as[(Long, Long, Int)].collect().toSet)
  }

  test("boilerplate removal: planted header deleted everywhere, " +
      "clean docs untouched, sub-threshold repeats kept, " +
      "all-boilerplate doc survives empty") {
    import graft.operators.Curation
    val hdr = Curation.header
    // 12 carrier docs (>= minDocs=10), 8 clean, a sub-threshold segment
    // in 3 docs, and one doc that IS the header alone
    val rows = (0L until 12L).map(i => (i, s"$hdr alpha beta doc$i")) ++
      (12L until 20L).map(i => (i, s"plain content words doc$i")) ++
      (20L until 23L).map(i =>
        (i, "rare repeated ten word segment shared by just three docs")) :+
      (23L, hdr)
    val docs = rows.toDF("doc_id", "text")
    val out = Curation.removeBoilerplate(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 24, "every input doc must survive as a row")
    (0L until 12L).foreach { i =>
      assert(out(i).getAs[String]("clean_text") == s"alpha beta doc$i" &&
        out(i).getAs[Int]("dropped_segments") == 1,
        s"doc $i: exactly the header segment must be dropped")
    }
    (12L until 23L).foreach { i =>
      assert(out(i).getAs[Int]("dropped_segments") == 0,
        s"doc $i: clean and sub-threshold docs must be untouched")
    }
    assert(out(23L).getAs[String]("clean_text") == "" &&
      out(23L).getAs[Int]("kept_segments") == 0,
      "an all-boilerplate doc must survive with empty text, not vanish")
  }

  test("shared runs: diagonal islands find exact run lengths, split " +
      "runs count separately, sub-n overlap is invisible") {
    val A = (1 to 13).map(i => s"a$i").mkString(" ")
    val B = (1 to 14).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$A cee $B"),
      (2L, s"$A dee $B"),
      // 12 shared tokens only — below n, must be invisible
      (3L, (1 to 12).map(i => s"a$i").mkString(" ") + " zz " +
        (1 to 12).map(i => s"y$i").mkString(" ")))
      .toDF("doc_id", "text")
    val runs = TextDedup.sharedRuns(docs, n = 13)
      .as[(Long, Long, Long, Long)].collect()
    assert(runs.toSeq == Seq((1L, 2L, 14L, 2L)),
      s"expected one pair, max run 14, two islands; got ${runs.toSeq}")
    // gate-shape sanity at sf0.001: every planted twin pair surfaces
    // with exactly its 25-token run
    val base = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("text"))
    val twins = base.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(array_join(slice(split(col("text"), " "), 1, 25), " "),
          lit(" twin"), col("doc_id").cast("string"),
          lit(" filler padding words here to break any accidental run"))
          .as("text"))
    val out = TextDedup.sharedRuns(base.unionByName(twins))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // the planted run is min(25, doc length): short docs clamp the slice
    val wantLens = base.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .as[(Long, Int)].collect()
    wantLens.foreach { case (d, nw) =>
      val want = math.min(25, nw).toLong
      if (want >= 13)
        assert(out.get((d, d + 1000000L)).contains(want),
          s"twin of $d: expected a $want-token run, got " +
            out.get((d, d + 1000000L)))
      else assert(!out.contains((d, d + 1000000L)),
        s"twin of $d shares < 13 tokens and must be invisible")
    }
  }

  test("CMS heavy hitters: lossless vs naive GROUP BY, candidates are " +
      "a superset (one-sided error), tiny sketch still exact") {
    import graft.operators.Sketches
    val words = Tables.documents(spark, TestSpark.sf)
      .select(explode(split(col("text"), " ")).as("word"))
    val naive = words.groupBy("word").count()
      .filter(col("count") >= 50).as[(String, Long)].collect().toSet
    val got = Sketches.heavyHitters(words, 50L)
      .as[(String, Long)].collect().toSet
    assert(got == naive, "CMS+confirm must equal the naive answer")
    assert(got.nonEmpty)
    // a deliberately saturated 8-cell sketch: every word collides, the
    // candidate set degrades to ~everything, the confirm still prunes it
    // to the exact answer — correctness never depends on sizing
    val tiny = Sketches.heavyHitters(words, 50L, w = 8, d = 2)
      .as[(String, Long)].collect().toSet
    assert(tiny == naive, "a saturated sketch must still confirm exactly")
  }

  test("curation funnel: per-source cap holds, ranks contiguous, " +
      "quality non-increasing within source, no unknown-lang survivors") {
    import graft.operators.Curation
    val out = Curation
      .curateCorpus(Tables.documents(spark, TestSpark.sf),
        minTokens = 10, capPerSource = 3)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("predicted_lang") != "unknown"))
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val ranked = rows.sortBy(_.getAs[Int]("q_rank"))
      assert(ranked.length <= 3, s"$src: cap exceeded")
      assert(ranked.map(_.getAs[Int]("q_rank")).toSeq ==
        (1 to ranked.length), s"$src: ranks must be contiguous from 1")
      val qs = ranked.map(_.getAs[Double]("quality_score")).toSeq
      assert(qs.zip(qs.drop(1)).forall { case (a, b) => a >= b },
        s"$src: quality must be non-increasing in rank")
    }
  }

  test("blockedEditPairs: equals the unblocked quadratic join on a " +
      "mixed fixture, and a skewed prefix block fails LOUD at the cap") {
    val names = Seq(
      (1L, "alpha-store-001"), (2L, "alpha-store-002"), // dist 1
      (3L, "alpha-store-0xx"),                          // dist 2 to both
      (4L, "beta-store-0001"), (5L, "beta-store-0002"),
      (6L, "gamma-warehouse"), (7L, "delta-warehouse")  // diff blocks
    ).toDF("id", "name").cache()
    val got = TextDedup.blockedEditPairs(names, prefixLen = 5,
      maxDist = 2, maxBlock = 10L)
      .as[(Long, Long, Int)].collect().toSet
    // oracle: the naive unblocked quadratic join, then the SAME block
    // restriction — blocking is a recall contract, not a distance one
    val naive = names.as("a").join(names.as("b"),
        col("a.id") < col("b.id") &&
          substring(col("a.name"), 1, 5) === substring(col("b.name"), 1, 5))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.name"), col("b.name")).as("d"))
      .filter(col("d") <= 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == naive && naive.nonEmpty,
      s"blocked join must equal the naive blocked form: $got vs $naive")
    // every name in ONE prefix block, block > cap: must fail naming the
    // size, never silently run the quadratic DP
    val skew = (1L to 12L).map(i => (i, f"same-prefix-$i%03d"))
      .toDF("id", "name")
    val ex = intercept[Exception] {
      TextDedup.blockedEditPairs(skew, prefixLen = 5, maxDist = 2,
        maxBlock = 10L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("blockedEditPairs premise")),
      s"expected the loud premise, got: ${msgs(ex).mkString(" | ")}")
    names.unpersist()
  }

  /** Naive oracle for the blocked edit-distance contract: quadratic
    * same-prefix join + levenshtein filter.
    */
  private def naiveEditPairs(names: org.apache.spark.sql.DataFrame,
      prefixLen: Int, maxDist: Int): Set[(Long, Long, Int)] =
    names.as("a").join(names.as("b"),
        col("a.id") < col("b.id") &&
          substring(col("a.name"), 1, prefixLen) ===
            substring(col("b.name"), 1, prefixLen))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.name"), col("b.name")).as("d"))
      .filter(col("d") <= maxDist)
      .as[(Long, Long, Int)].collect().toSet

  test("segmentedEditPairs: equals the blocked contract on a mixed " +
      "fixture, on the hot-prefix block blockedEditPairs refuses, and " +
      "across short/long suffix pairs") {
    // the same mixed fixture blockedEditPairs is pinned on
    val mixed = Seq(
      (1L, "alpha-store-001"), (2L, "alpha-store-002"),
      (3L, "alpha-store-0xx"),
      (4L, "beta-store-0001"), (5L, "beta-store-0002"),
      (6L, "gamma-warehouse"), (7L, "delta-warehouse")
    ).toDF("id", "name").cache()
    val gotMixed = CacheScope.withScope {
      TextDedup.segmentedEditPairs(mixed, prefixLen = 5, maxDist = 2)
        .as[(Long, Long, Int)].collect().toSet
    }
    val expMixed = naiveEditPairs(mixed, 5, 2)
    assert(gotMixed === expMixed && expMixed.nonEmpty)
    mixed.unpersist()
    // EVERY name in one hot prefix block — the case blockedEditPairs
    // refuses at its cap, the segment path must simply handle
    val hot = (1L to 60L).map(i => (i, f"same-item-$i%03d"))
      .toDF("id", "name").cache()
    intercept[Exception] {
      TextDedup.blockedEditPairs(hot, prefixLen = 5, maxDist = 2,
        maxBlock = 10L).count()
    }
    val gotHot = CacheScope.withScope {
      TextDedup.segmentedEditPairs(hot, prefixLen = 5, maxDist = 2)
        .as[(Long, Long, Int)].collect().toSet
    }
    val expHot = naiveEditPairs(hot, 5, 2)
    assert(gotHot === expHot && expHot.size > 100,
      s"hot block: ${gotHot.size} vs ${expHot.size}")
    hot.unpersist()
    // suffixes straddling the segmentability floor (len < maxDist+1
    // can't host non-empty segments): short×short pairs ride the
    // dedicated path, short×long pairs ride the long path's unfloored
    // probe side — parity must hold across all three combinations
    val mixedLen = Seq(
      (1L, "abcde"), (2L, "abcdex"), (3L, "abcdexy"), (4L, "abcdexz"),
      (5L, "abcdexyzw"), (6L, "abcdeqrst"), (7L, "abcdexyzwv")
    ).toDF("id", "name").cache()
    val gotLen = CacheScope.withScope {
      TextDedup.segmentedEditPairs(mixedLen, prefixLen = 5, maxDist = 2)
        .as[(Long, Long, Int)].collect().toSet
    }
    val expLen = naiveEditPairs(mixedLen, 5, 2)
    // the fixture must exercise short×short AND short×long matches
    assert(expLen.contains((1L, 2L, 1)) && expLen.contains((3L, 5L, 2)))
    assert(gotLen === expLen)
    mixedLen.unpersist()
  }

  test("segmentedEditPairs: both premises refuse loud, naming the size") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // five identical suffixes: every segment key collides 5×5 — the
    // hottest-key premise must name the 25-candidate volume
    val sameSuf = (1L to 5L).map(i => (i, "same-suffixXYZ"))
      .toDF("id", "name")
    val ex1 = intercept[Exception] {
      CacheScope.withScope {
        TextDedup.segmentedEditPairs(sameSuf, prefixLen = 5, maxDist = 2,
          maxKeyPairs = 1L).count()
      }
    }
    assert(msgs(ex1).exists(_.contains("segmentedEditPairs premise")),
      s"expected the key-volume premise, got: ${msgs(ex1).mkString(" | ")}")
    // two sub-(maxDist+1)-char suffixes in one block trip the short cap
    val shorts = Seq((1L, "abcde"), (2L, "abcdex")).toDF("id", "name")
    val ex2 = intercept[Exception] {
      CacheScope.withScope {
        TextDedup.segmentedEditPairs(shorts, prefixLen = 5, maxDist = 2,
          maxShortBlock = 1L).count()
      }
    }
    assert(msgs(ex2).exists(_.contains("segmentedEditPairs premise")),
      s"expected the short-block premise, got: ${msgs(ex2).mkString(" | ")}")
  }

  test("segmentedEditPairs: empty premise aggregates mean PASS, not throw") {
    // an empty aggregate (no short suffixes — the COMMON corpus shape,
    // exactly the customer gate corpus) observes NULL in the premise
    // frame, and assert_true(NULL) THROWS in Spark 4 — the conditions
    // ride coalesce(cond, true) so "no rows" is a trivially-held
    // premise even at a cap of 1, never a refusal
    val longOnly = Seq((1L, "abcde-suffix-01"), (2L, "abcde-suffix-02"))
      .toDF("id", "name")
    val got = CacheScope.withScope {
      TextDedup.segmentedEditPairs(longOnly, prefixLen = 5, maxDist = 2,
        maxShortBlock = 1L).as[(Long, Long, Int)].collect().toSet
    }
    assert(got === Set((1L, 2L, 1)))
    // a fully empty input returns an empty frame from BOTH paths
    val empty = longOnly.filter(lit(false))
    assert(CacheScope.withScope {
      TextDedup.segmentedEditPairs(empty, prefixLen = 5, maxDist = 2)
        .count()
    } === 0L)
    // blockedEditPairs shares the hardening: empty input = empty output
    assert(CacheScope.withScope {
      TextDedup.blockedEditPairs(empty, prefixLen = 5, maxDist = 2,
        maxBlock = 10L).count()
    } === 0L)
  }

  private def spansOf(rows: Seq[(Long, String)], w: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    // Row + explicit schema so a NULL text survives construction
    // (the CLAUDE.md test-frame rule)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t) =>
        org.apache.spark.sql.Row(id, t) }), schema)
    CacheScope.withScope {
      TextDedup.duplicateSpans(df, w = w)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    }
  }

  test("duplicateSpans: a shared substring marks both docs' maximal " +
      "span at its own offset") {
    // "abcdefgh" verbatim in both docs (doc 2 at offset 2): all five
    // w=4 windows duplicate, merging into ONE span per doc covering
    // exactly the shared characters
    val got = spansOf(Seq(1L -> "abcdefgh", 2L -> "xxabcdefghyy",
      3L -> "qqqqzzzz", 4L -> null.asInstanceOf[String]), w = 4)
    assert(got === Set(
      (1L, 1L, 1L, 8L, 5L),
      (2L, 1L, 3L, 10L, 5L)))
  }

  test("duplicateSpans: start-gap == w merges, start-gap == w+1 splits " +
      "(and within-doc-only repetition is never marked)") {
    // docs 13/14 share "abcd" and "efgh" but differ in the middle, so
    // only those two windows duplicate: doc 13's starts (1, 5) sit at
    // gap w=4 -> ONE bridged span [1,8]; doc 14's starts (1, 6) sit at
    // gap 5 -> TWO spans. doc 20 repeats "mnop" twice WITHIN itself
    // only (disjoint alphabet from every other doc) -> cross-doc
    // count 1, no rows.
    val got = spansOf(Seq(13L -> "abcdefgh", 14L -> "abcdXefgh",
      20L -> "mnopmnop"), w = 4)
    assert(got === Set(
      (13L, 1L, 1L, 8L, 2L),
      (14L, 1L, 1L, 4L, 1L), (14L, 2L, 6L, 9L, 1L)))
  }

  private def removalOf(rows: Seq[(Long, String)], w: Int)
      : Map[Long, (Long, Long, Long, Long, String)] = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t) =>
        org.apache.spark.sql.Row(id, t) }), schema)
    CacheScope.withScope {
      TextDedup.removeDuplicateSpans(df, w = w)
        .collect().map { r =>
          r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1),
            if (r.isNullAt(2)) -1L else r.getLong(2),
            r.getLong(3), r.getLong(4),
            if (r.isNullAt(5)) null else r.getString(5)))
        }.toMap
    }
  }

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(
      s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("decontaminateSpans: benchmark-overlapping windows are cut from " +
      "EVERY corpus doc (no owner), matching is verbatim-case, clean " +
      "docs pass through, and benchmark docs never appear in output") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = true)))
    def frame(rows: Seq[(Long, String)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, t) =>
        org.apache.spark.sql.Row(id, t) }), schema)
    // benchmark holds 'abcdefgh'; corpus docs 1 AND 2 quote it (both
    // cut — decontamination has no min-id owner exemption, unlike
    // q150); doc 3 shares 'ABCD' only case-insensitively (kept —
    // verbatim-case); doc 4 clean; doc 5 NULL
    val corpus = frame(Seq(1L -> "xxabcdefghyy", 2L -> "abcdefgh",
      3L -> "zzABCDefghzz".toLowerCase.toUpperCase, // 'ZZABCDEFGHZZ'
      4L -> "nothing shared here", 5L -> null.asInstanceOf[String]))
    val bench = frame(Seq(100L -> "ppabcdefghqq"))
    val got = CacheScope.withScope {
      TextDedup.decontaminateSpans(corpus, bench, w = 4)
        .collect().map { r =>
          r.getLong(0) -> ((if (r.isNullAt(1)) -1L else r.getLong(1),
            if (r.isNullAt(2)) -1L else r.getLong(2),
            r.getLong(3), r.getLong(4),
            if (r.isNullAt(5)) null else r.getString(5)))
        }.toMap
    }
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L),
      "output covers exactly the corpus docs")
    assert(got(1L) == ((12L, 4L, 1L, 8L, md5Of("xxyy"))))
    assert(got(2L) == ((8L, 0L, 1L, 8L, md5Of(""))),
      "a doc that IS a benchmark quote is cut in full — no owner keeps")
    assert(got(3L) == ((12L, 12L, 0L, 0L, md5Of("ZZABCDEFGHZZ"))),
      "case-different text is NOT a match (verbatim-case contract)")
    assert(got(4L)._3 == 0L && got(5L) == ((-1L, -1L, 0L, 0L, null)))
  }

  test("removeDuplicateSpans: non-owner copies are cut to the expected " +
      "reconstructed strings; owner, unrelated, short and NULL docs " +
      "pass through") {
    // doc 1 owns 'abcdefgh' (min id) -> untouched; doc 2's offset copy
    // cut to 'xxyy'; doc 5 shares only 'abcd' and 'efgh' (gap 5 > w=4)
    // -> TWO ranges, cleaned to the single middle char 'X'; doc 7
    // repeats 'mnop' only within itself -> never marked
    val got = removalOf(Seq(1L -> "abcdefgh", 2L -> "xxabcdefghyy",
      3L -> "qqqqzzzz", 4L -> null.asInstanceOf[String],
      5L -> "abcdXefgh", 6L -> "ab", 7L -> "mnopmnop"), w = 4)
    assert(got === Map(
      1L -> ((8L, 8L, 0L, 0L, md5Of("abcdefgh"))),
      2L -> ((12L, 4L, 1L, 8L, md5Of("xxyy"))),
      3L -> ((8L, 8L, 0L, 0L, md5Of("qqqqzzzz"))),
      4L -> ((-1L, -1L, 0L, 0L, null)),
      5L -> ((9L, 1L, 2L, 8L, md5Of("X"))),
      6L -> ((2L, 2L, 0L, 0L, md5Of("ab"))),
      7L -> ((8L, 8L, 0L, 0L, md5Of("mnopmnop")))))
  }

  test("removeDuplicateSpans: matching is verbatim-case, a cut at pos 1 " +
      "leaves a legal empty leading segment, and a doc cut in full " +
      "survives as the empty string") {
    // 'ABCDEFGH' (upper) never matches doc 30's lower copy; docs
    // 31/32 share lower 'abcdefgh' exactly — doc 32 IS the shared
    // text, so its cleaned string is '' (md5 of empty), cut [1,8]
    val got = removalOf(Seq(30L -> "abcdefghzz", 31L -> "ABCDEFGH",
      32L -> "abcdefgh"), w = 8)
    assert(got(31L) === ((8L, 8L, 0L, 0L, md5Of("ABCDEFGH"))))
    assert(got(30L) === ((10L, 10L, 0L, 0L, md5Of("abcdefghzz"))))
    assert(got(32L) === ((8L, 0L, 1L, 8L, md5Of(""))))
  }

  test("duplicateSpans: q149 shape at sf0.001 — spans exist, lie inside " +
      "their docs, and never overlap within a doc") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val spans = CacheScope.withScope {
      TextDedup.duplicateSpans(docs, w = 60)
        .join(docs.select(col("doc_id"), length(col("text")).as("len")),
          Seq("doc_id"))
        .as[(Long, Long, Long, Long, Long, Int)].collect().toSeq
    }
    assert(spans.nonEmpty, "the planted near-dup corpus must share spans")
    spans.foreach { case (doc, _, s, e, nw, len) =>
      assert(s >= 1 && e <= len && e - s + 1 >= 60 && nw >= 1,
        s"span ($s,$e) breaks doc $doc bounds (len $len)")
    }
    spans.groupBy(_._1).values.foreach { ds =>
      ds.sortBy(_._3).sliding(2).foreach {
        case Seq((_, _, _, e1, _, _), (_, _, s2, _, _, _)) =>
          // maximality: the merge rule leaves no two spans whose
          // windows could have joined (next start > prev end + 1)
          assert(s2 > e1 + 1, "adjacent spans should have merged")
        case _ => ()
      }
    }
  }
}
