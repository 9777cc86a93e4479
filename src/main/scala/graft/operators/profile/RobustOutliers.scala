package graft.operators.profile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection via the modified z-score
  * (Iglewicz & Hoaglin 1993): med = median, MAD = median(|x − med|),
  * flag |0.6745·(x − med)/MAD| > `threshold` (default 3.5). Unlike a
  * mean/stddev rule, a burst of outliers cannot mask itself by
  * inflating the spread estimate — the 50% breakdown point is the
  * reason this is the standard data-quality screen.
  *
  * Determinism: medians interpolate at exact midpoints ((a+b)/2-style
  * lerp is an exact IEEE op on the 2-decimal money doubles this runs
  * over), so med/MAD — and therefore every threshold comparison — are
  * bit-identical cross-engine; the DuckDB oracle replays the identical
  * two-level median.
  *
  * Scale shape: two grouped percentile aggregates (each one shuffle
  * with a per-group sort buffer — the inherent cost of EXACT medians;
  * swap in approx_percentile for the sketch-sized 100 TB variant) and
  * two broadcast joins of #groups-row tables. A group's buffer is its
  * own row count — same caveat as any exact per-group quantile.
  *
  * No reference counterpart; builder-prompt data-quality extension.
  */
object RobustOutliers {

  /** (key, n, med, mad, n_outliers) per group; groups with MAD = 0
    * flag nothing (degenerate spread).
    */
  def summary(df: DataFrame, keyCol: String, valCol: String,
              threshold: Double = 3.5): DataFrame = {
    val base = df.select(col(keyCol).as("k"), col(valCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val med = base.groupBy(col("k")).agg(expr("percentile(v, 0.5)").as("med"))
    val dev = base.join(broadcast(med), "k")
      .withColumn("ad", abs(col("v") - col("med")))
    val stats = dev.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), max(col("med")).as("med"),
        expr("percentile(ad, 0.5)").as("mad"))
    val outs = dev
      .join(broadcast(stats.select(col("k"), col("mad"))), "k")
      .filter(col("mad") > 0 &&
        abs(lit(0.6745) * (col("v") - col("med")) / col("mad")) > threshold)
      .groupBy(col("k")).agg(count(lit(1)).as("n_outliers"))
    stats.join(outs, Seq("k"), "left")
      .select(col("k"), col("n"), round(col("med"), 6).as("med"),
        round(col("mad"), 6).as("mad"),
        coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
  }
}
