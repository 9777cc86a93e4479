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
  * frontier-sized shuffle — the canonical distributed BFS shape; set
  * `graft.checkpoint.dir` for reliable checkpoints on a real cluster.
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

  /** PER-SEED BFS distances — (seed, node, dist) for every seed and
    * every node within `maxHops` of it: [[hopDistance]]'s loop with the
    * seed label riding in the frontier key, so different seeds' waves
    * expand independently in ONE fixpoint (state and shuffle are
    * Σ per-seed reachability — size the seed SAMPLE accordingly; this
    * is the bounded-radius, sampled-seed regime, not all-pairs).
    */
  def hopDistanceLabeled(edges: DataFrame, srcCol: String, dstCol: String,
                         seeds: DataFrame, seedCol: String,
                         maxHops: Int, undirected: Boolean = false): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    val e0 = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
    val e = (if (undirected) e0.union(e0.select(col("v").as("u"), col("u").as("v")))
             else e0)
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var settled = graft.LoopFrames.checkpoint(
        seeds.select(col(seedCol).as("seed"))
          .where(col("seed").isNotNull).distinct()
          .withColumn("node", col("seed"))
          .withColumn("dist", lit(0)))
      var frontier = settled
      var hop = 0
      while (hop < maxHops) {
        hop += 1
        val layer = graft.LoopFrames.checkpoint(
          e.join(frontier.select(col("seed"), col("node").as("u")), "u")
            .select(col("seed"), col("v").as("node")).distinct()
            .join(settled.select(col("seed"), col("node")),
              Seq("seed", "node"), "left_anti")
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

  /** Sampled harmonic centrality in exact integer fixed-point:
    * `harmonic_fp(v) = Σ_seeds (10¹² div dist(seed, v))` over seeds at
    * positive distance, the bounded-radius estimate of Marchiori–
    * Latora harmonic centrality from a seed SAMPLE (the practical
    * regime at scale — exact closeness needs all-pairs). Integer
    * floor-division keeps the sum order-free, so output is hash-exact
    * at any executor count and the p123 oracle replays it as
    * `SUM(10¹² // d)` over a bounded recursive walk. Nodes no sampled
    * seed reaches are absent; a larger `maxHops` only ADDS far-seed
    * terms (each ≤ 10¹²/maxHops).
    *
    * CONTRACT BOUND (ADVICE r16): terms are ≤ 10¹² each and sum into a
    * Long, so a node reachable from more than ~9.2 million seeds
    * (Long.MaxValue / 10¹² ≈ 9.22e6) could overflow `harmonic_fp`. This
    * operator is the SAMPLED-seed regime — seed samples are orders of
    * magnitude below that — and the all-node regime belongs to the HLL
    * neighborhood-function sketch ([[NeighborhoodFunction]]), not here;
    * callers passing > 9e6 seeds are rejected up front rather than
    * allowed to wrap silently.
    */
  def harmonicCentrality(edges: DataFrame, srcCol: String, dstCol: String,
                         seeds: DataFrame, seedCol: String,
                         maxHops: Int, undirected: Boolean = false): DataFrame = {
    val unit = 1000000000000L
    val nSeeds = seeds.select(col(seedCol)).where(col(seedCol).isNotNull)
      .distinct().count()
    require(nSeeds <= Long.MaxValue / unit, // ~9.22e6
      s"harmonicCentrality: $nSeeds seeds could overflow the Long " +
        "fixed-point sum (bound ~9.2e6); sample the seeds, or use the " +
        "HLL neighborhood sketch (NeighborhoodFunction) for all-node centrality")
    hopDistanceLabeled(edges, srcCol, dstCol, seeds, seedCol, maxHops, undirected)
      .filter(col("dist") > 0)
      .groupBy(col("node"))
      // `div`, never `/` — long / long is DOUBLE division in Spark SQL
      .agg(sum(expr(s"${unit}L div cast(dist as bigint)")).as("harmonic_fp"))
  }
}
