package graft.operators.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (builder prompt: "salting for skew"; AQE's
  * skew-join split handles sort-merge joins automatically, but salting is
  * still the tool for skewed AGGREGATIONS over high-cardinality payloads
  * and for joins AQE cannot split).
  */
object Skew {

  /** Salted join of a skewed `big` side against a `small` side on
    * `keyCols`: the big side gets a random salt in [0, saltFactor), the
    * small side is replicated once per salt value, and the join runs on
    * (key, salt) — a hot key's rows spread over `saltFactor` partitions
    * instead of one. Replication cost: |small| × saltFactor, so keep the
    * small side dimension-sized.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left join types only, got '$joinType' — " +
        "right/full outer would emit unmatched small-side rows once PER SALT")
    val saltedBig = big.withColumn("__salt__",
      (rand(42) * saltFactor).cast("int"))
    val saltedSmall = small.withColumn("__salt__",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, keyCols :+ "__salt__", joinType)
      .drop("__salt__")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * aggregate on (key, salt), then final aggregate on the key. Use for
    * algebraic aggregates (sum/count/min/max) whose partial results
    * combine; the partial shuffle spreads a hot key over `saltFactor`
    * reducers. (Catalyst's own partial aggregation already does this for
    * most plans — this helper exists for explicitly forcing the split
    * when a custom expression defeats partial pushdown.)
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    df.withColumn("__salt__", (rand(42) * saltFactor).cast("int"))
      .groupBy((keyCols :+ "__salt__").map(col): _*)
      .agg(sum(col(valueCol)).as("__partial__"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial__")).as(s"sum_$valueCol"))
  }
}
