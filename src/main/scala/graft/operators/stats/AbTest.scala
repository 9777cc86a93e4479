package graft.operators.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-proportion A/B test — the experimentation readout: per-variant
  * trials/successes/rates, absolute difference, and the pooled
  * two-proportion z-statistic
  * `z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b))`. The z-score (not a
  * p-value) is deliberate: converting needs Φ/erf, whose libm varies
  * across engines — the z threshold (±1.96, ±2.58) is the decision
  * anyway, and on exact integer counts every op here is a fixed IEEE
  * sequence, bit-replayable.
  *
  * Scale shape: one groupBy(variant) count aggregate — two rows out of
  * any input size; everything after is constant work.
  *
  * No reference counterpart; builder-prompt experimentation extension.
  */
object AbTest {

  /** One row: (n_a, k_a, n_b, k_b, p_a, p_b, diff, z); z null when a
    * variant is empty or the pooled rate is degenerate (0 or 1).
    */
  def zTest(df: DataFrame, variantCol: String, successCol: String,
            a: String, b: String): DataFrame = {
    val agg = df.filter(col(variantCol).isin(a, b))
      .groupBy(col(variantCol).as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(successCol).cast("boolean"), 1L).otherwise(0L)).as("k"))
    val wide = agg.agg(
      coalesce(max(when(col("variant") === a, col("n"))), lit(0L)).as("n_a"),
      coalesce(max(when(col("variant") === a, col("k"))), lit(0L)).as("k_a"),
      coalesce(max(when(col("variant") === b, col("n"))), lit(0L)).as("n_b"),
      coalesce(max(when(col("variant") === b, col("k"))), lit(0L)).as("k_b"))
    wide.select(col("n_a"), col("k_a"), col("n_b"), col("k_b"),
        (col("k_a").cast("double") / col("n_a")).as("p_a"),
        (col("k_b").cast("double") / col("n_b")).as("p_b"),
        ((col("k_a") + col("k_b")).cast("double") /
          (col("n_a") + col("n_b"))).as("pp"))
      .select(col("n_a"), col("k_a"), col("n_b"), col("k_b"),
        round(col("p_a"), 6).as("p_a"), round(col("p_b"), 6).as("p_b"),
        round(col("p_a") - col("p_b"), 6).as("diff"),
        when(col("n_a") > 0 && col("n_b") > 0 &&
          col("pp") > 0 && col("pp") < 1,
          round((col("p_a") - col("p_b")) /
            sqrt(col("pp") * (lit(1.0) - col("pp")) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6))
          .as("z"))
  }
}
