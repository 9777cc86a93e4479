package graft.operators.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed triangle counting with DEGREE-ORDERED edge orientation
  * (the standard skew bound: orienting every edge from its lower-
  * (degree, id) endpoint to the higher one caps any node's out-degree
  * at O(√m), so the wedge self-join cannot explode on a hub node the
  * way a naive neighbor join does — Suri & Vassilvitskii 2011's
  * observation, relationally).
  *
  * Pipeline: canonical undirected edges → per-node degrees → oriented
  * edges (lower → higher by (deg, id)) → wedges by a self-join on the
  * oriented SOURCE (bounded fan-out) → a triangle per wedge whose
  * closing edge exists (one equi-join against the oriented set; the
  * closing edge is oriented d1 → d2 by construction, so one probe
  * direction suffices). Per-node counts explode each triangle to its
  * three corners; the local clustering coefficient divides by the
  * node's wedge count deg·(deg−1)/2 — all integer arithmetic until one
  * final divide, so the DuckDB oracle replays everything exactly.
  *
  * No reference counterpart; classic-OLAP/graph extension per the
  * builder prompt.
  */
object Triangles {

  /** (node, degree, n_tri, clustering) for every node of the graph;
    * `clustering` = 2·n_tri/(deg·(deg−1)), 0.0 when deg < 2, rounded
    * 6dp. Input edges are undirected; self-loops and duplicates (in
    * either direction) are dropped.
    */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val oriented = e
      .join(deg.select(col("node").as("u"), col("degree").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("degree").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("d"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("dv"))
          .otherwise(col("du")).as("dd"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // wedges (s; d1 < d2 in orientation order) — fan-out bounded by the
    // oriented out-degree, i.e. O(sqrt(m)) per node. r20 (guide §2.3/§2.4):
    // adjacency-list formulation — ONE source-keyed aggregation collects
    // each node's oriented out-neighbors sorted by (deg, id), and ordered
    // pairs stream out of a posexplode+slice generator pair — replacing
    // the self-join that shuffled the oriented table twice. The (dd, d)
    // struct sort equals the old join's orientation-order condition, so
    // the wedge multiset is identical; nested generators keep per-row
    // memory O(out-degree), never O(out-degree²).
    val wedges = oriented.groupBy(col("s"))
      .agg(sort_array(collect_list(struct(col("dd"), col("d")))).as("__ws__"))
      .select(col("s"), col("__ws__"),
        posexplode(col("__ws__")).as(Seq("__i__", "__w1__")))
      .select(col("s"), col("__w1__.d").as("d1"),
        explode(expr("slice(__ws__, __i__ + 2, size(__ws__))")).as("__w2__"))
      .select(col("s"), col("d1"), col("__w2__.d").as("d2"))
    val tris = wedges.join(oriented.select(col("s").as("d1"), col("d").as("d2")),
      Seq("d1", "d2"))
    val perCorner = tris
      .select(explode(array(col("s"), col("d1"), col("d2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(perCorner, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(when(col("degree") < 2, lit(0.0))
          .otherwise((coalesce(col("n_tri"), lit(0L)) * 2).cast("double") /
            (col("degree") * (col("degree") - 1))), 6).as("clustering"))
  }
}
