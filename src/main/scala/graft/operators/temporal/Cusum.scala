package graft.operators.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sided CUSUM changepoint / drift detection (Page 1954) over keyed
  * event series — the batch complement of the streaming EWMA anomaly
  * monitor ([[graft.streaming.Stateful]] `ewmaAnomalies`): EWMA flags
  * single outliers, CUSUM accumulates evidence and fires on small
  * PERSISTENT shifts of the mean (a 5% error-rate drift no single point
  * reveals).
  *
  * Textbook recurrences
  *   s⁺ᵢ = max(0, s⁺ᵢ₋₁ + (xᵢ − μ − κ)),   s⁻ᵢ = max(0, s⁻ᵢ₋₁ + (μ − κ − xᵢ))
  * are "inherently sequential", but each has the classic closed form
  *   s⁺ᵢ = Sᵢ − min(0, min_{j≤i} Sⱼ)   with S = prefix sum of (x − μ − κ)
  * (and symmetrically for s⁻), so the whole detector becomes ONE ordered
  * prefix sum + running min per key — plain window functions, no UDF, no
  * recursion, no driver state.
  *
  * Exactness IS the scale story: x is cast to DECIMAL(18,2) (the house
  * recipe for 2-dec measurements) and μ, κ, h enter as decimal literals,
  * so every prefix sum is EXACT integer-scaled arithmetic — the result
  * does not depend on summation order, which means a monster key can be
  * upgraded to the SequencePack-style two-phase distributed prefix sum
  * without changing a single output bit (impossible for a double-typed
  * CUSUM, where any re-chunking reorders IEEE adds). The DuckDB oracle
  * replays the same decimal algebra verbatim. Rows order by
  * (tsCol, idCol) within a key — idCol breaks timestamp ties so the scan
  * order is total.
  *
  * No reference counterpart; builder-prompt time-series extension.
  */
object Cusum {

  private def dec(x: Double): Column =
    lit(new java.math.BigDecimal(x.toString))

  /** Per-row CUSUM statistics and alarms.
    *
    * @param target    in-control mean μ (2-dp)
    * @param slack     allowance κ — drift smaller than κ never accumulates
    * @param threshold alarm level h on either side
    * @return (keyCol, idCol, x, s_pos, s_neg, alarm) in scan order
    */
  def detect(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
             valCol: String, target: Double, slack: Double,
             threshold: Double): DataFrame = {
    require(slack >= 0, "slack must be >= 0")
    require(threshold > 0, "threshold must be > 0")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = col(valCol).cast("decimal(18,2)")
    val zero = dec(0.0)
    val dPos = x - dec(target) - dec(slack)
    val dNeg = dec(target) - dec(slack) - x
    df.withColumn("__sp__", sum(dPos).over(w))
      .withColumn("__sn__", sum(dNeg).over(w))
      .withColumn("__mp__", least(zero, min(col("__sp__")).over(w)))
      .withColumn("__mn__", least(zero, min(col("__sn__")).over(w)))
      .withColumn("s_pos", (col("__sp__") - col("__mp__")).cast("double"))
      .withColumn("s_neg", (col("__sn__") - col("__mn__")).cast("double"))
      .withColumn("alarm",
        col("s_pos") > lit(threshold) || col("s_neg") > lit(threshold))
      .select(col(keyCol), col(idCol), col(valCol).as("x"),
        col("s_pos"), col("s_neg"), col("alarm"))
  }

  /** Only the alarm rows — the usual consumption shape. */
  def alarms(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
             valCol: String, target: Double, slack: Double,
             threshold: Double): DataFrame =
    detect(df, keyCol, tsCol, idCol, valCol, target, slack, threshold)
      .filter(col("alarm"))
}
