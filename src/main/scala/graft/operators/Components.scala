package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Checkpoints.RoundCheckpoint

/** Connected components over an undirected edge set — the step that turns
  * pairwise near-duplicate PAIRS (q26/q52/q69) into per-document GROUP
  * assignments, which is what a dedup pipeline actually keeps: one
  * canonical doc per component, everything else dropped.
  *
  * Algorithm: hash-min label propagation. Every vertex starts labeled
  * with its own id; each round it takes the min of its own label and its
  * neighbors' labels; a fixpoint means every vertex carries the min id of
  * its component. Rounds needed = max component DIAMETER, which for
  * near-dup clusters is small (they are near-cliques: members are all
  * mutually similar, so 2-3 rounds converge). For adversarial long-chain
  * graphs at 100 TB the published fix is alternation of large-star /
  * small-star contractions (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC 2014) with O(log n) rounds; the
  * propagation loop below keeps the same API so that swap stays local.
  *
  * LINEAGE TRUNCATION, not caching: an iterative loop built with
  * `.cache()` keeps the full logical plan of every round — and of the
  * edge PRODUCER. When the producer is a whole similarity join (q70
  * feeds q69's prefix-filtered join in here; q81 feeds the MinHash-LSH
  * pipeline), every downstream action pays seconds of DRIVER CPU just
  * re-canonicalizing that tree for cache lookup: measured at sf0.1, a
  * `count()` on the cached, fully materialized result frame still took
  * ~2.5 s, and each consumer of the result re-paid it (q81's emit step:
  * ~6 s of pure planning). `localCheckpoint` materializes each frame
  * AND replaces its plan with a leaf (`LogicalRDD`), so per-round and
  * downstream planning cost is constant — the same reason GraphFrames
  * checkpoints its iterative lineages. On a multi-executor cluster,
  * set `spark.graft.checkpointDir` ([[graft.Checkpoints]]) and every
  * round checkpoints RELIABLY (HDFS/object-store-backed) instead, so
  * executor loss is survivable mid-computation — the swap is a config,
  * not a code edit, and the spec pins answer parity under it; the
  * frames involved are O(vertices-in-edges), tiny next to the corpus
  * either way.
  * Superseded rounds' checkpoint blocks are reclaimed by Spark's
  * ContextCleaner once the frames are unreferenced (referenceTracking
  * is on by default); at most the edge set plus two label frames are
  * ever strongly referenced here.
  *
  * Per round: one shuffle (neighbor-min aggregate, map-side combined) +
  * one join back to labels, materialized by the eager checkpoint; the
  * convergence probe is a `limit(1)` count on the just-materialized leaf
  * (a Pregel-style halting vote over a precomputed change flag — no
  * second join, no data collect).
  */
object Components {

  /** Exact single-task components finish (r15 optimization — the
    * [[KCore]] hybrid's precedent applied to both component loops):
    * union-find with MIN-ID ROOTS over a small edge iterator — every
    * union links the larger root under the smaller, so each root IS
    * its component's minimum id and the emitted (id, comp) labels are
    * exactly the loops' fixpoint (the oracles compute true closure, so
    * this is output-identical, not an approximation). Runs ON an
    * executor via mapPartitions over a 1-partition repartition — no
    * collect. Why it pays: at gate scale the loops' cost is almost
    * entirely FIXED per-round job overhead (q96's ~12 star rounds are
    * 4 shuffles + a checkpoint + a convergence probe each over a
    * 15k-edge frame); one task replaces all of it. At 100 TB the edge
    * set of a similarity-pair graph is small next to the corpus but
    * can exceed one task — the distributed loops remain the over-cutoff
    * path, same as KCore's peel.
    */
  private def localMinLabels(
      it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (c != r) { val n = parent.getOrElse(c, c); parent.update(c, r); c = n }
      r
    }
    it.foreach { case (u, v) =>
      parent.getOrElseUpdate(u, u)
      parent.getOrElseUpdate(v, v)
      val ru = find(u)
      val rv = find(v)
      if (ru != rv) {
        if (ru < rv) parent.update(rv, ru) else parent.update(ru, rv)
      }
    }
    parent.keys.toArray.iterator.map(v => (v, find(v)))
  }

  /** @param edges two-column frame; column names are taken positionally
    *              (first = one endpoint, second = the other)
    * @param localCutoff max symmetrized edges handed to the single-task
    *                    union-find finish (0 forces the distributed
    *                    loop — the spec uses it to prove phase parity)
    * @return (id, component) — component is the min id reachable
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50,
      localCutoff: Long = 1000000L): DataFrame = {
    val Seq(a, b) = edges.columns.toSeq.take(2).map(col)
    // Symmetrize in ONE pass (explode of both directions per row), not a
    // UNION of two selects: union branches are separate plan subtrees, so
    // an expensive uncached edge producer would execute once PER BRANCH
    // before the checkpoint materializes. The eager localCheckpoint runs
    // the producer exactly once and truncates its plan out of the loop.
    val sym = edges.select(explode(array(
        struct(a.cast("long").as("src"), b.cast("long").as("dst")),
        struct(b.cast("long").as("src"), a.cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .roundCheckpoint()

    // HYBRID finish: sym is already materialized (the checkpoint), so
    // the count is one cheap job; under the cutoff a single union-find
    // task replaces every propagation round (identical labels — see
    // [[localMinLabels]]). Every vertex appears as a src of sym, so
    // the local emit covers the same vertex universe as the loop.
    if (localCutoff > 0 && sym.count() <= localCutoff) {
      val spark = edges.sparkSession
      import spark.implicits._
      return sym.as[(Long, Long)].repartition(1)
        .mapPartitions(localMinLabels)
        .toDF("id", "comp")
    }

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .roundCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("nid"))
        .agg(min(col("comp")).as("ncomp"))
      // chg inline: a label only ever DECREASES, so "this round changed
      // something" ⇔ some neighbor-min undercuts the current label.
      val next = labels
        .join(neighborMin, col("id") === col("nid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp")))
            .as("comp"),
          (coalesce(col("ncomp"), col("comp")) < col("comp")).as("chg"))
        .roundCheckpoint()
      val changed = next.filter(col("chg")).limit(1).count()
      labels = next.drop("chg")
      converged = changed == 0
      iter += 1
    }
    // Non-convergence must fail LOUD: returning the part-propagated
    // labels would be a silently wrong answer (components larger than
    // maxIter hops would split). maxIter bounds the diameter, and real
    // near-dup clusters converge in 2-3 rounds — hitting the bound means
    // the graph shape assumption broke, not that the answer is "close".
    require(converged,
      s"connectedComponents did not converge within $maxIter rounds — " +
        "component diameter exceeds the bound (use " +
        "connectedComponentsStars for adversarial-diameter graphs)")
    labels
  }

  /** Cluster assignment from a pair table: the (doc_id, canonical_id,
    * cluster_size) shape a dedup pipeline keeps, factored out of the q70
    * gate so a REAL deployment can feed it a MATERIALIZED pair table
    * (q69's / q26's output written once, read here) instead of
    * recomputing the similarity join — at 100 TB the join is hours of
    * work and its pairs are the natural checkpoint artifact. The gate
    * queries stay hermetic by composing this with the live join; the
    * production path is `dedupClusters(spark.read.parquet(pairsPath))`.
    *
    * Input: two columns, positional (doc_a, doc_b). Output columns are
    * the q70 contract; only documents that appear in some pair appear
    * (singletons never entered the pair table).
    */
  def dedupClusters(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val comps = connectedComponents(pairs, maxIter)
    val sizes = comps.groupBy(col("comp"))
      .agg(count(lit(1)).as("cluster_size"))
    comps.join(sizes, Seq("comp"))
      .select(col("id").as("doc_id"), col("comp").as("canonical_id"),
        col("cluster_size"))
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR
    * contractions (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014 — the public construction this file's scaladoc
    * has promised since round 3): the adversarial-DIAMETER path.
    * [[connectedComponents]]'s hash-min propagation needs one round per
    * hop of component diameter — right for near-clique dedup graphs
    * (2-3 rounds), hopeless for a 10⁶-node chain. The star alternation
    * contracts by pointer-jumping instead, converging in O(log² n) rounds
    * worst case and ~log₂(diameter) in practice, each round a constant
    * number of edge-sized keyed shuffles.
    *
    * One round (edges kept canonically oriented src > dst, distinct):
    *
    *  - large-star(u): m = min(Γ(u) ∪ {u}); every STRICTLY LARGER
    *    neighbor v > u re-attaches to m. As dataframes: symmetrize, one
    *    map-combined min aggregate per u, join back, filter v > u, emit
    *    (v, m). Output stays oriented (m ≤ u < v) and never grows: one
    *    output edge per input directed edge with v > u = the input
    *    undirected count.
    *  - small-star(u): on the oriented view, m = min(Γ⁻(u) ∪ {u}) over
    *    the SMALLER-OR-EQUAL neighbors; they and u re-attach to m. Same
    *    aggregate+join shape; output (v, m) for v ≠ m plus (u, m).
    *
    * The fixpoint of both operations is a forest of stars whose centers
    * are the component minima — each round's output is localCheckpoint'd
    * (same lineage-truncation argument as the propagation loop above).
    * Convergence is the DEFINITIONAL star-forest test, one small
    * aggregate per round instead of a two-sided set diff: the oriented
    * edge set is a star forest iff no vertex appears as both a src and a
    * dst AND every src carries exactly one dst (depth-1 functional
    * forest), and a star forest is a fixpoint of both operations (large-
    * star re-emits every (leaf, center) edge unchanged; small-star maps
    * each single-center group to itself). The same single-dst property
    * is what licenses the label extraction below to read each star edge
    * as (id → component) without aggregation.
    *
    * Scale: per round, two min-aggregates and two joins over the current
    * edge set — all keyed, all map-side combinable, no explode beyond the
    * initial symmetrize, edge count monotonically non-increasing after
    * the first round. This is the published 100 TB-scale algorithm for
    * graphs whose diameter is not bounded by construction.
    *
    * @return (id, comp) over every vertex incident to an input edge —
    *         the same contract as [[connectedComponents]].
    */
  def connectedComponentsStars(edges: DataFrame,
      maxIter: Int = 40, localCutoff: Long = 1000000L): DataFrame = {
    val Seq(a, b) = edges.columns.toSeq.take(2).map(col)
    // vertex universe from the RAW edges (self-loops contribute their
    // endpoint even though the star loop drops the loop edge itself) —
    // mirrors the propagation path's vertex definition
    val verts = edges
      .select(explode(array(a.cast("long"), b.cast("long"))).as("id"))
      .distinct()
      .roundCheckpoint()
    var cur = edges
      .filter(a.cast("long") =!= b.cast("long"))
      .select(greatest(a.cast("long"), b.cast("long")).as("src"),
        least(a.cast("long"), b.cast("long")).as("dst"))
      .distinct()
      .roundCheckpoint()
    val nEdges = cur.count()
    // HYBRID finish (see [[localMinLabels]]): under the cutoff one
    // union-find task replaces the whole alternation — q96's ~12
    // rounds at gate scale are pure fixed per-round overhead. The
    // emitted labels include roots (id == comp); the left join below
    // coalesces identically either way.
    if (nEdges > 0 && localCutoff > 0 && nEdges <= localCutoff) {
      val spark = edges.sparkSession
      import spark.implicits._
      val labels = cur.as[(Long, Long)].repartition(1)
        .mapPartitions(localMinLabels)
        .toDF("id", "comp")
      return verts.join(labels, Seq("id"), "left")
        .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    }
    var iter = 0
    var converged = nEdges == 0L // a loop-free edgeless graph is done
    while (!converged && iter < maxIter) {
      // large-star over the symmetric view
      val sym = cur.select(col("src").as("u"), col("dst").as("v"))
        .union(cur.select(col("dst").as("u"), col("src").as("v")))
      val lmin = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      // m ≤ u < v ⇒ output is already oriented (src > dst), loop-free.
      // localCheckpoint: `large` feeds BOTH the small-star min aggregate
      // and the re-attach join below — uncached, the large-star join
      // (the round's dominant work) would execute once per consumer
      val large = sym.join(lmin, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
        .distinct()
        .roundCheckpoint()
      // small-star on the oriented output: per src u, m = min over its
      // (strictly smaller) dst neighbors; u and every dst ≠ m re-attach.
      // Both output rows per edge come from ONE explode pass (the
      // union-of-two-branches form executed the small-star join once
      // per branch — this file's own hash-min scaladoc warns union
      // branches are separate plan subtrees)
      val smin = large.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val next = large.join(smin, Seq("src"))
        .select(explode(array(
          when(col("dst") =!= col("m"),
            struct(col("dst").as("src"), col("m").as("dst"))),
          struct(col("src").as("src"), col("m").as("dst")))).as("e"))
        .filter(col("e").isNotNull)
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .distinct()
        .roundCheckpoint()
      // star-forest probe: a vertex that is both endpoint kinds, or a
      // src with two dsts, falsifies the fixpoint; one map-combined
      // aggregate over the (small) edge frame, probed via limit(1)
      val offenders = next
        .select(col("src").as("v"), lit(1L).as("s"), lit(0L).as("d"))
        .union(next
          .select(col("dst").as("v"), lit(0L).as("s"), lit(1L).as("d")))
        .groupBy(col("v"))
        .agg(sum(col("s")).as("ns"), sum(col("d")).as("nd"))
        .filter(col("ns") > 1 || (col("ns") > 0 && col("nd") > 0))
      converged = offenders.limit(1).count() == 0
      cur = next
      iter += 1
    }
    require(converged,
      s"connectedComponentsStars did not converge within $maxIter " +
        "rounds — O(log² n) bounds this for any graph; raise maxIter")
    val labels = cur.select(col("src").as("id"), col("dst").as("comp"))
    verts.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }
}
