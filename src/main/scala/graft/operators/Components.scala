package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * swap `localCheckpoint` for reliable `checkpoint()` (HDFS-backed) if
  * executor loss must be survivable mid-computation; the frames involved
  * are O(vertices-in-edges), tiny next to the corpus either way.
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

  /** @param edges two-column frame; column names are taken positionally
    *              (first = one endpoint, second = the other)
    * @return (id, component) — component is the min id reachable
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
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
      .localCheckpoint()

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
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
        .localCheckpoint()
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
        "component diameter exceeds the bound (use large-star/small-star " +
        "for adversarial-diameter graphs)")
    labels
  }
}
