package graft.operators.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation (the product-limit estimator) over
  * right-censored durations — the churn/conversion-lag curve behind
  * "how long until a signup converts / a user churns", with subjects who
  * never experienced the event entering as CENSORED at their observation
  * bound instead of being dropped (dropping them is the classic bias).
  *
  *   S(t_i) = Π_{j ≤ i} (1 − d_j / n_j)
  *
  * over distinct event times t_j, with d_j events at t_j and n_j subjects
  * still at risk (duration ≥ t_j, censored included).
  *
  * Plan shape: ONE groupBy over the duration axis (map-side combinable
  * counts of subjects and events per duration), then the at-risk counts
  * and the product-limit fold are windows over that axis — whose length
  * is the number of DISTINCT durations, bounded by the caller's
  * quantization (hours/days), NOT by subject count. A 10⁹-subject cohort
  * reduces to a few-hundred-row curve before any window runs; the
  * windows' single-partition cost is proportional to the curve, which is
  * the output anyway.
  *
  * Determinism: the survival product is computed as exp(Σ ln(1 − d/n))
  * in duration order — a fixed fold both engines replay identically;
  * 6-dp rounding sits far above the ~1e-13 cross-engine libm drift of a
  * few hundred ln/exp terms (the p26/p42 precedent). Counts are exact.
  *
  * No reference counterpart; builder-prompt analytics extension.
  */
object Survival {

  /** @param subjects one row per subject: (durCol: integral duration in
    *                 the caller's quantized unit, eventCol: 1 = event
    *                 observed at durCol, 0 = censored at durCol)
    * @return (durCol, n_risk, d, survival) — one row per EVENT time,
    *         in duration order
    */
  def kaplanMeier(subjects: DataFrame, durCol: String,
                  eventCol: String): DataFrame = {
    val perDur = subjects
      .filter(col(durCol).isNotNull)
      .groupBy(col(durCol))
      .agg(count(lit(1)).as("__m__"),
        sum(when(col(eventCol) === 1, 1L).otherwise(0L)).as("d"))
    // at-risk = everyone whose duration is >= t: a reversed running sum
    val wRisk = Window.orderBy(col(durCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSurv = Window.orderBy(col(durCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDur
      .withColumn("n_risk", sum(col("__m__")).over(wRisk))
      .filter(col("d") > 0)
      // a time where EVERY at-risk subject dies zeroes the curve from
      // there on; keep it out of the log (DuckDB's LN(0) is an error,
      // Spark's a silent -Inf) and force the output to 0 instead
      .withColumn("__dead__",
        max(when(col("n_risk") === col("d"), 1).otherwise(0)).over(wSurv))
      .withColumn("survival", when(col("__dead__") === 1, lit(0.0))
        .otherwise(round(exp(sum(
          log(when(col("n_risk") === col("d"), lit(1.0))
            .otherwise((col("n_risk") - col("d")).cast("double") /
              col("n_risk").cast("double")))).over(wSurv)), 6)))
      .select(col(durCol), col("n_risk"), col("d"), col("survival"))
      .orderBy(col(durCol))
  }
}
