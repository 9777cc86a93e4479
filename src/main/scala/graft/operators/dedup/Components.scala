package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph (a_id, b_id) by
  * min-label propagation WITH pointer-doubling: each round every node
  * adopts the smallest label among itself and its neighbors, then
  * shortcuts to its label's label (`label := label(label)`), which halves
  * chain lengths — O(log diameter) rounds, each a couple of equi-joins,
  * convergence checked. The 25-round bound therefore covers any component
  * diameter up to ~2^25 before failing loudly.
  */
object Components {

  /** (id, label) for every id appearing in `pairs`; label = component min. */
  def labels(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).cache()
    var cached = labels // the frame actually persisted (labels may be a projection of it)
    try {
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < 25) {
        val nbrMin = edges.join(labels.select(col("id").as("dst"), col("label")), "dst")
          .groupBy(col("src").as("id")).agg(min("label").as("nbr_min"))
        // `prev` rides along so convergence is a filter over `next` rather
        // than an extra join back to the previous labels (one fewer
        // shuffle per round)
        val propagated = labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"), col("label").as("prev"),
            least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        // pointer doubling: follow the label one more hop
        val next = propagated.as("x")
          .join(propagated.select(col("id").as("label"), col("label").as("ll")).as("y"),
            Seq("label"), "left")
          .select(col("id"), col("prev"),
            least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
          .cache()
        changed = next.filter(col("label") =!= col("prev")).count()
        cached.unpersist()
        cached = next
        labels = next.select(col("id"), col("label"))
        iter += 1
      }
      require(changed == 0, "component labeling did not converge in 25 doubling rounds")
      // Cache (and materialize) the id/label projection itself before
      // releasing the loop's working frame, so the caller's .unpersist() on
      // the returned DataFrame actually frees the storage — returning a
      // projection of `cached` would make that unpersist a silent no-op and
      // pin the extra `prev` column until clearCache.
      val out = labels.cache()
      out.count() // materialize: the loop lineage is about to lose its cache
      cached.unpersist()
      out
    } finally edges.unpersist()
  }
}
