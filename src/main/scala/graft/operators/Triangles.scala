package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node triangle counting — the local clustering signal behind
  * community detection and spam/bot neighborhoods, completing the graph
  * family (q70/q96 components, q87 PageRank) with the canonical
  * wedge-closure problem.
  *
  * Scale shape (Suri & Vassilvitskii, WWW 2011): counting wedges on the
  * RAW graph explodes at hot vertices (a degree-d node makes C(d,2)
  * wedges — a celebrity vertex alone can exceed the rest of the graph).
  * DEGREE ORIENTATION fixes it structurally: point every edge from its
  * lower-(degree, id) endpoint to the higher one; the orientation is
  * acyclic, every triangle keeps exactly ONE source vertex (its minimum
  * in that order), and each wedge is built only at that source — so
  * wedge volume is Σ C(outdeg, 2) with outdeg ≤ O(√m) for ANY degree
  * distribution, the published bound. Joins: wedge build keyed on the
  * source, closure keyed on the (b, c) edge — both equi-shuffles,
  * skew-bounded by the orientation itself.
  */
object Triangles {

  /** (node, n_triangles) for every node of `edges` ((u, v), u < v,
    * distinct) that closes at least one triangle. The edge frame is read
    * by the degree count, the orientation, and the closure probe —
    * pinned per CLAUDE.md's self-join rule.
    */
  def perNodeTriangles(edges: DataFrame): DataFrame = {
    val e = graft.CacheScope.scoped(
      edges.select(col("u"), col("v")).distinct())
    val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient by (degree, id): a = the strictly-smaller endpoint in that
    // total order, so the orientation is acyclic and deterministic
    val oriented = graft.CacheScope.scoped(e
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"),
        Seq("u"))
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"),
        Seq("v"))
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("o"))
      .select(col("o.a").as("a"), col("o.b").as("b")))
    val wedges = oriented.as("x")
      .join(oriented.as("y"), col("x.a") === col("y.a") &&
        col("x.b") < col("y.b"))
      .select(col("x.a").as("a"), col("x.b").as("w1"),
        col("y.b").as("w2"))
    // the closing edge (w1, w2) appears oriented in SOME direction; both
    // u<v and the wedge's w1<w2 are id-orders, but orientation is by
    // (degree, id) — probe the undirected id-ordered edge set instead
    val triangles = wedges
      .join(e, (col("u") === least(col("w1"), col("w2")) &&
        col("v") === greatest(col("w1"), col("w2"))), "left_semi")
    triangles
      .select(explode(array(col("a"), col("w1"), col("w2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }
}
