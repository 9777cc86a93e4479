package graft.operators.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-core decomposition (membership for a fixed k) by synchronous
  * peeling: repeatedly delete every node whose degree among the still-
  * alive nodes is < k; the fixpoint is the k-core (Seidman 1983) — the
  * standard "dense cohesive subgraph" screen before community/centrality
  * passes, and a cheap spam-graph filter in web curation (link farms
  * live in high cores, long tails don't).
  *
  * Each round is two alive-set semi-joins on the edge endpoints plus one
  * hash aggregation — equi-joins only, no windows, no cartesian; the
  * edge table is persisted once and reused. The alive frame is
  * `localCheckpoint`ed per round with RDD-level release of the previous
  * frame ([[graft.LoopFrames]], house rule for iterative loops). Rounds
  * are bounded by the peel depth (how many "onion layers" sit below the
  * core), which is tiny for real graphs — `maxIter` fails loudly rather
  * than looping; at 100 TB swap localCheckpoint for reliable checkpoints
  * and the loop shape is unchanged, with per-round cost one shuffle of
  * the surviving edges.
  *
  * Determinism: pure integer set/degree arithmetic — the fixpoint is
  * unique (peeling order cannot change it), so output is hash-exact at
  * any executor count, and a bounded SQL unroll of the same rounds
  * replays it (the p106 oracle).
  *
  * No reference counterpart; graph-analytics extension per the builder
  * prompt.
  */
object KCore {

  /** Nodes of the k-core with their within-core degrees.
    *
    * @param edges directed edge list; both directions are added and
    *              deduplicated internally (pass an undirected pair list
    *              as-is), self-loops dropped
    * @return (node, deg) — deg counts distinct core neighbors
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
          maxIter: Int = 30): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxIter >= 1, "maxIter must be >= 1")
    val e0 = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
    val e = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var alive = e.select(col("u").as("node")).distinct()
        .withColumn("deg", lit(-1L)).localCheckpoint(true)
      var n0 = alive.count()
      var iter = 0
      while (iter < maxIter) {
        val next = e
          .join(alive.select(col("node").as("u")), "u")
          .join(alive.select(col("node").as("v")), "v")
          .groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= k)
          .localCheckpoint(true)
        val n1 = next.count()
        graft.LoopFrames.release(alive)
        alive = next
        iter += 1
        if (n1 == n0) {
          // fixpoint: nobody was peeled this round, so `deg` is the
          // within-core degree
          return alive
        }
        n0 = n1
      }
      // n0 is monotone decreasing, so non-convergence in maxIter rounds
      // means the peel is still stripping layers — a bound set too low,
      // not a data error
      throw new IllegalStateException(
        s"k-core peel did not converge in $maxIter rounds (alive=$n0)")
    } finally e.unpersist(false)
  }
}
