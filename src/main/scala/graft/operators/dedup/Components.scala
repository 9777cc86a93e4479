package graft.operators.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph (a_id, b_id) by
  * iterative min-label propagation: each node repeatedly adopts the
  * smallest label among itself and its neighbors — O(component diameter)
  * rounds, each one equi-join + aggregation, convergence checked.
  * Near-dup components are shallow (duplicates of a common ancestor), so
  * this converges in a few rounds; the 25-round bound catches pathological
  * chains loudly instead of looping.
  */
object Components {

  /** (id, label) for every id appearing in `pairs`; label = component min. */
  def labels(pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).cache()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 25) {
      val nbrMin = edges.join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("id")).agg(min("label").as("nbr_min"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .cache()
      changed = next.join(labels.select(col("id"), col("label").as("prev")), "id")
        .filter(col("label") =!= col("prev")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    require(changed == 0, "component labeling did not converge in 25 rounds")
    edges.unpersist()
    labels
  }
}
