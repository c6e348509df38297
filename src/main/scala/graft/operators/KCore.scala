package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition — iterative degree peeling (Batagelj–Zaveršnik
  * by rounds), completing the graph family (components, PageRank,
  * triangles): the k-core is the maximal subgraph where every node keeps
  * degree ≥ k, the standard "dense kernel vs stragglers" cut for
  * community cores and spam/bot-cluster mining.
  *
  * Shape per round: one edge-sized keyed aggregation (degrees via
  * explode of both endpoints, map-side combinable) + two LEFT SEMI joins
  * re-filtering the edge list — no collect, no node-indexed driver
  * state. `localCheckpoint` truncates the per-round lineage exactly as
  * the [[Components]] loops do. Rounds are data-dependent (each round
  * must drop ≥ 1 node or the loop has converged), so the loop carries a
  * LOUD `maxRounds` premise: the oracle unrolls exactly that many peel
  * rounds, and a graph whose cascade runs longer must refuse rather than
  * gate-diff (measured on this corpus: fixpoint in 2 rounds at sf0.01,
  * 23 at sf0.1 — adversarial chains can cascade O(nodes), in which case
  * raise the bound on both sides or switch to the O(m) sequential peel
  * per partition-core).
  *
  * Convergence probe = edge-count equality: an under-k node always loses
  * incident edges when dropped, so an unchanged edge count proves every
  * surviving degree ≥ k.
  */
object KCore {

  /** (node, core_degree) for the k-core of `edges` ((u, v) undirected,
    * deduped here); empty result if the core is empty.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 32): DataFrame = {
    require(k >= 1, "k must be positive")
    require(maxRounds >= 1, "maxRounds must be positive")
    var e = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v")).distinct().localCheckpoint()
    var nEdges = e.count()
    var round = 0
    var converged = nEdges == 0L
    while (!converged && round < maxRounds) {
      val keep = e.select(explode(array(col("u"), col("v"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
      val next = e
        .join(keep.select(col("n").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("n").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint()
      val nNext = next.count()
      converged = nNext == nEdges || nNext == 0L
      e = next
      nEdges = nNext
      round += 1
    }
    require(converged, s"$k-core peel did not converge within $maxRounds " +
      "rounds — the oracle unrolls exactly that many; raise the bound on " +
      "both sides for deeper cascades")
    e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("core_degree"))
      .orderBy(col("node"))
  }
}
