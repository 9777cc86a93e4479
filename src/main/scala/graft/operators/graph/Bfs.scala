package graft.operators.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source BFS hop distance — min hops from ANY seed to every
  * reachable node, the graph primitive behind "distance from the spam
  * seed set" trust propagation (TrustRank-style cutoffs), blast-radius
  * queries, and bounded-neighborhood feature extraction.
  *
  * Level-synchronous frontier expansion: hop h joins the frontier
  * against the edge table (one equi-join shuffle on the node key),
  * anti-joins the already-settled set (BFS settles a node at its first
  * visit — that IS its min distance), and appends the new layer. The
  * settled and frontier frames are `localCheckpoint`ed per hop with
  * RDD-level release of the previous round ([[graft.LoopFrames]]);
  * iterations are bounded by `maxHops`, and the loop exits early the
  * moment a frontier comes back empty. At 100 TB each hop costs one
  * frontier-sized shuffle — the canonical distributed BFS shape; swap
  * localCheckpoint for reliable checkpoints on a real cluster.
  *
  * Determinism: hop counts are integers and the settled set per level is
  * a set union — order-free, hash-exact at any executor count; a
  * recursive CTE with UNION (distinct) semantics replays it (the p107
  * oracle takes MIN(d) per node over all bounded walks, which equals the
  * BFS level).
  *
  * No reference counterpart; graph-analytics extension per the builder
  * prompt.
  */
object Bfs {

  /** (node, dist) for every node within `maxHops` of a seed; seeds come
    * back at dist 0 (even seeds absent from the edge table). Follows
    * edges src→dst as given; set `undirected` to mirror them first.
    * Seeds are deduplicated.
    */
  def hopDistance(edges: DataFrame, srcCol: String, dstCol: String,
                  seeds: DataFrame, seedCol: String,
                  maxHops: Int, undirected: Boolean = false): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val e0 = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
    val e = (if (undirected) e0.union(e0.select(col("v").as("u"), col("u").as("v")))
             else e0)
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // a null seed is not a node: drop it rather than emit (null, 0)
      // LoopFrames.checkpoint, not plain localCheckpoint: settled and
      // layer get UNIONED each hop, and preserved origin constraints on
      // checkpointed frames can crash Union.rewriteConstraints
      var settled = graft.LoopFrames.checkpoint(
        seeds.select(col(seedCol).as("node"))
          .where(col("node").isNotNull).distinct()
          .withColumn("dist", lit(0)))
      var frontier = settled
      var hop = 0
      while (hop < maxHops) {
        hop += 1
        val layer = graft.LoopFrames.checkpoint(
          e.join(frontier.select(col("node").as("u")), "u")
            .select(col("v").as("node")).distinct()
            .join(settled.select(col("node")), Seq("node"), "left_anti")
            .withColumn("dist", lit(hop)))
        if (layer.isEmpty) {
          graft.LoopFrames.release(layer)
          if (frontier ne settled) graft.LoopFrames.release(frontier)
          return settled
        }
        val prevSettled = settled
        val prevFrontier = frontier
        settled = graft.LoopFrames.checkpoint(prevSettled.unionByName(layer))
        frontier = layer
        graft.LoopFrames.release(prevSettled)
        if (prevFrontier ne prevSettled) graft.LoopFrames.release(prevFrontier)
      }
      if (frontier ne settled) graft.LoopFrames.release(frontier)
      settled
    } finally e.unpersist(false)
  }
}
