package graft.operators.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted average over IRREGULAR samples (the financial TWAP /
  * telemetry duty-cycle query): each sample's value holds until the
  * next sample (step interpolation), so
  * `twap = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_N − t₁)` per key; the last sample
  * carries no weight (no duration). A plain AVG over-weights bursts of
  * rapid samples — the whole point of the operator.
  *
  * Numeric discipline: weights are exact micros longs and values are
  * cast DECIMAL(12,2) (the repo's money convention), so the weighted
  * sum is EXACT decimal arithmetic — order-independent under any
  * partitioning, replayed digit-for-digit by the oracle — with a
  * single double divide at the end. Equal timestamps are ordered by
  * `tieCol`; an intra-tie step gets zero duration, but WHICH value
  * pairs with the next real duration depends on the order, so the tie
  * column is the determinism contract.
  *
  * Scale shape: one key-window (lead), one key aggregation with
  * map-side combine. No joins.
  *
  * No reference counterpart; builder-prompt events-analytics extension.
  */
object Twap {

  /** (key, n_samples, twap): twap null for single-sample keys (zero
    * span).
    */
  def compute(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
              tieCol: Option[String] = None): DataFrame = {
    df.select((col(keyCol).as("k") +:
        unix_micros(col(tsCol).cast("timestamp")).as("tu") +:
        col(valCol).as("v") +: tieCol.map(col).toSeq): _*)
      .withColumn("nxt", lead(col("tu"), 1).over(
        Window.partitionBy(col("k")).orderBy(
          (col("tu") +: tieCol.map(col).toSeq): _*)))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("v").cast("decimal(12,2)") *
          (col("nxt") - col("tu")).cast("decimal(20,0)")).as("wsum"),
        (max(col("tu")) - min(col("tu"))).as("span"))
      .select(col("k"), col("n_samples"),
        when(col("span") > 0,
          round(col("wsum").cast("double") / col("span"), 6)).as("twap"))
  }
}
