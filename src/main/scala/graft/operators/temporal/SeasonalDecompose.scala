package graft.operators.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition of per-key regular time
  * series — `value = trend + seasonal + residual` (the moving-average
  * decomposition of Kendall/Stuart; what statsmodels'
  * `seasonal_decompose` computes, re-expressed as two window passes).
  *
  * Semantics, for period `p` over an integer time index `t`:
  *  - **trend** is the centered moving average: for odd `p` the plain
  *    p-point mean; for even `p` the standard 2×MA (half weight on the
  *    two endpoints), so the average stays centered on `t`. A row's
  *    trend is defined only when its FULL window exists (no partial
  *    averages at series edges or across gaps — RANGE frames on `t`
  *    mean a missing index shrinks the window's row count and the
  *    completeness check nulls the trend, rather than silently
  *    averaging a lopsided window).
  *  - **seasonal** is the per-(key, phase) mean of the detrended value,
  *    `phase = t mod p` (the "seasonal index" of the phase). It is NOT
  *    mean-centered across phases: centering would add a cross-phase
  *    reduction of non-integral doubles whose summation order differs
  *    between engines, for a constant that callers can subtract
  *    themselves if they want sum-to-zero indices.
  *  - **residual** = value − trend − seasonal, null wherever trend is.
  *
  * Numeric discipline (cross-engine bit-exactness): all sums run over
  * `2p·v` and window sums of `v` — INTEGRAL doubles whenever the input
  * values are integral (counts), so every partial sum is exact and
  * order-independent; the only rounding happens in the final three
  * divisions, which are single IEEE ops on identical inputs in any
  * engine. Non-integral inputs still decompose correctly, just without
  * the order-independence guarantee.
  *
  * Scale shape: ONE shuffle on the series key for both trend windows
  * (same partition+order → one sort, both frames computed in the same
  * window stage), then ONE shuffle on (key, phase) for the seasonal
  * mean — no joins, no driver state, no per-key collect. A key's cost
  * is linear in its length; skew = one long series, which is inherent
  * to per-series decomposition.
  *
  * No reference counterpart; builder-prompt events-analytics extension.
  */
object SeasonalDecompose {

  /** Decompose `valCol` over integer index `tCol` per `keyCol`.
    * Output: key, t, v (double), trend, seasonal, resid.
    */
  def decompose(df: DataFrame, keyCol: String, tCol: String, valCol: String,
                period: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val p = period
    val h = p / 2
    val v = col(valCol).cast("double")
    val wFull = Window.partitionBy(keyCol).orderBy(col(tCol).cast("long"))
      .rangeBetween(-h, h)
    // even p: endpoints at ±h get half weight — sum[t-h..t+h] +
    // sum[t-h+1..t+h-1] = x_{t-h} + x_{t+h} + 2·(middle), i.e. the 2×MA
    // numerator over 2p, with no lag/lead (which would break on gaps)
    val trendNum: Column =
      if (p % 2 == 0) {
        val wMid = Window.partitionBy(keyCol).orderBy(col(tCol).cast("long"))
          .rangeBetween(-(h - 1), h - 1)
        sum(v).over(wFull) + sum(v).over(wMid)
      } else sum(v).over(wFull) * 2d
    val required = if (p % 2 == 0) p + 1 else p
    val complete = count(v).over(wFull) === required
    val scaled = df
      .withColumn("__v__", v)
      .withColumn("__tn__", when(complete, trendNum))
      .withColumn("__phase__", pmod(col(tCol).cast("long"), lit(p.toLong)))
    val wPhase = Window.partitionBy(col(keyCol), col("__phase__"))
    // avg(2p·v − trend_num)/(2p) = mean of (v − trend) over the phase;
    // the numerator stays integral for integral v
    val seasonal = avg(lit(2d * p) * col("__v__") - col("__tn__")).over(wPhase) /
      (2d * p)
    scaled
      .withColumn("trend", col("__tn__") / (2d * p))
      .withColumn("seasonal", seasonal)
      .withColumn("resid", col("__v__") - col("trend") - col("seasonal"))
      .drop("__tn__", "__phase__")
      .withColumnRenamed("__v__", "v")
  }
}
