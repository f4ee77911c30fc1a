package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Triangle counting via degree-ordered edge orientation (Suri &
  * Vassilvitskii, "Counting triangles and the curse of the last
  * reducer", WWW 2011).
  *
  * The naive wedge join (every edge pair sharing an endpoint) costs
  * Σ deg(v)² — one celebrity hub makes it quadratic. Orienting each
  * undirected edge from its lower-(degree, id) endpoint to the higher
  * one caps every out-degree at O(√m), so the wedge join is bounded by
  * Σ outdeg(v)² = O(m^1.5) REGARDLESS of skew: the hub receives edges
  * instead of emitting them, and the "last reducer" never sees its
  * full neighborhood. Every step is a keyed aggregate or equi-join —
  * wedge generation is equi on the pivot node, triangle closure is a
  * LEFT SEMI equi-join on the (src, dst) pair — so the plan shuffles
  * three times total and broadcasts nothing that grows with the graph.
  */
object Triangles {

  /** Canonicalize an edge list to undirected simple form:
    * `src < dst`, self-loops dropped, duplicates collapsed.
    */
  def canonical(edges: DataFrame, srcCol: String = "src",
                dstCol: String = "dst"): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("src"),
        greatest(col(srcCol), col(dstCol)).as("dst"))
      .filter(col("src") =!= col("dst") &&
        col("src").isNotNull && col("dst").isNotNull)
      .distinct()

  /** Count triangles of the canonicalized (see [[canonical]]) edge
    * list. Returns a 1-row frame `(n_nodes, n_edges, n_wedges,
    * n_triangles, gcc)` where `n_wedges = Σ C(deg v, 2)` (unordered
    * paths of length 2) and `gcc` is the global clustering coefficient
    * `3·triangles / wedges`, rounded to 6 places.
    */
  def count(edges: DataFrame): DataFrame = {
    val e = canonical(edges)
    // degree per node — one keyed agg over both endpoints
    val deg = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .groupBy("node").agg(F.count(lit(1)).as("deg"))
    // orient by (deg, id): lower endpoint emits, higher receives
    val oriented = e
      .join(deg.withColumnRenamed("node", "src")
        .withColumnRenamed("deg", "ds"), "src")
      .join(deg.withColumnRenamed("node", "dst")
        .withColumnRenamed("deg", "dd"), "dst")
      .select(
        when(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")),
          col("src")).otherwise(col("dst")).as("lo"),
        when(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")),
          col("dst")).otherwise(col("src")).as("hi"))
    // wedges from the low vertex: (a->b, a->c) with b before c in the
    // orientation order — equi self-join on the pivot. The b<c side
    // constraint needs (deg, id) order again, but within one pivot's
    // out-neighborhood ANY total order dedups wedges — use node id.
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.lo") === col("e2.lo") && col("e1.hi") < col("e2.hi"))
      .select(col("e1.hi").as("b"), col("e2.hi").as("c"))
    // closure: the (b, c) edge exists — checked against the CANONICAL
    // (id-ordered) edge set, since the wedge's (b, c) is id-ordered by
    // the self-join constraint while the orientation is (deg, id)-ordered.
    val closing = e.select(col("src").as("b"), col("dst").as("c"))
    val tri = wedges // b < c by the self-join constraint, matching `e`
      .join(closing, Seq("b", "c"), "left_semi")
      .agg(F.count(lit(1)).as("n_triangles"))
    val stats = deg.agg(
      F.count(lit(1)).as("n_nodes"),
      (sum("deg") / 2).cast("long").as("n_edges"),
      sum(expr("deg * (deg - 1) / 2")).cast("long").as("n_wedges"))
    // two 1-row frames — the cross join is ×1 by construction
    stats.crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(lit(3.0) * col("n_triangles") /
          greatest(col("n_wedges"), lit(1L)), 6).as("gcc"))
  }
}
