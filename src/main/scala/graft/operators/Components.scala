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
  * Per round: one shuffle (neighbor-min aggregate, map-side combined) +
  * one join back to labels. The convergence probe materializes at most
  * ONE changed row (`limit(1)` before the count) — it is a Pregel-style
  * halting vote, not a data collect; each round's label frame is cached
  * (iterative lineage — Spark would otherwise re-execute the whole prior
  * chain per round) and the superseded frame is unpersisted eagerly, so
  * at most two label frames are ever live regardless of round count.
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
    // an expensive uncached edge producer (q70 feeds the whole q69
    // similarity join in here) would execute once PER BRANCH before the
    // cache ever fills.
    val sym = graft.CacheScope.scoped(
      edges.select(explode(array(
          struct(a.cast("long").as("src"), b.cast("long").as("dst")),
          struct(b.cast("long").as("src"), a.cast("long").as("dst"))))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst")))

    var labels = graft.CacheScope.scoped(
      sym.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id")))
    // Prime the caches in ONE job before the loop (Pregel-style init
    // barrier): the first round's probe otherwise materializes the
    // vertex init and the neighbor-min aggregate as SIBLING stages that
    // each recompute the still-uncached edge lineage concurrently — for
    // an expensive edge producer (q70 feeds the whole q69 similarity
    // join in here) the cache-fill race duplicates seconds of upstream
    // work. Measured at sf0.1: 13.5 s → ~9 s for the q70 gate query.
    labels.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("nid"))
        .agg(min(col("comp")).as("ncomp"))
      val next = graft.CacheScope.scoped(labels
        .join(neighborMin, col("id") === col("nid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp")))
            .as("comp")))
      val changed = next.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.comp") =!= col("o.comp"))
        .limit(1).count()
      labels.unpersist(false) // superseded; scope release tolerates this
      labels = next
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
