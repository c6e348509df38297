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

  /** Co-occurrence edge derivation from a (key, item) incidence frame:
    * all (u, v) item pairs (u < v) sharing at least `minShared` distinct
    * keys. Incidence is grouped by key (ONE keyed shuffle), each key's
    * pairs are generated MAP-SIDE from the sorted distinct-item array
    * (one row per (key, pair) by construction — count(*) IS the
    * distinct-key count, no expand+dedup), then a map-combinable count.
    *
    * PREMISE, loud (r5 VERDICT): pair volume per key is C(k, 2) — a
    * single hot key (a part bought by 100k customers) would emit ~5G
    * pairs and dominate the job silently. `maxPerKey` bounds it; the
    * assert threads through the USED array column (a free-standing
    * check column would be pruned and never run), so a violating key
    * fails the job with its id instead of going quadratic. Keys above
    * the cap are a MODELING decision (drop, sample, or CMS-prefilter —
    * REPORT.md discusses the options), never a silent cost.
    */
  def coOccurrenceEdges(incidence: DataFrame, minShared: Int,
      maxPerKey: Int): DataFrame = {
    require(maxPerKey >= 2, "maxPerKey must be at least 2")
    val byKey = incidence.groupBy(col("key"))
      .agg(sort_array(collect_set(col("item"))).as("cs"))
      .filter(size(col("cs")) >= 2)
    val capped = byKey.select(
      when(assert_true(size(col("cs")) <= maxPerKey,
        concat(lit(s"coOccurrenceEdges premise: key exceeds $maxPerKey " +
          "items (C(k,2) pair bound): key "), col("key").cast("string"),
          lit(" has "), size(col("cs")).cast("string"))).isNull,
        col("cs")).as("cs"))
    capped
      .select(explode(flatten(transform(col("cs"), (x, i) =>
        transform(slice(col("cs"), i + lit(2), size(col("cs"))),
          y => struct(x.as("u"), y.as("v")))))).as("pr"))
      .groupBy(col("pr.u").as("u"), col("pr.v").as("v"))
      .agg(count(lit(1)).as("np"))
      .filter(col("np") >= minShared).select("u", "v")
  }

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
