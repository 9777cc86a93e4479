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

  /** CUPED variance reduction (Deng et al. 2013): adjust each unit's
    * metric by its PRE-EXPERIMENT covariate, `y' = y − θ·(x − x̄)` with
    * the pooled `θ = cov(x,y)/var(x)` — the standard way to shrink an
    * experiment's confidence intervals without touching the treatment
    * effect (E[y'] per variant shifts both arms identically).
    *
    * Exactness: metric and covariate are 2-dec measurements → cents
    * (BIGINT); all five moment sums (Σx, Σy, Σxx, Σxy, Σyy) accumulate
    * as DECIMAL(38,0) integers — order-free — and θ, ρ² and the
    * adjusted means are fixed sequences of double ops on those exact
    * integers, so the whole readout replays digit-for-digit. One
    * groupBy(variant) + one 1-row pooled aggregate of any unit count.
    *
    * @param units one row per experimental unit:
    *              (variantCol, metricCol y, covCol x)
    * @return per-variant (variant, n, mean_y, mean_y_cuped) plus the
    *         pooled theta and rho2 (the expected variance-reduction
    *         fraction) repeated on each row, 6 dp
    */
  def cuped(units: DataFrame, variantCol: String, metricCol: String,
            covCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val base = units.select(col(variantCol).as("variant"),
      (col(metricCol).cast("decimal(18,2)") * 100).cast(d38).as("yc"),
      (col(covCol).cast("decimal(18,2)") * 100).cast(d38).as("xc"))
    val pooled = base.agg(
      count(lit(1)).as("n"),
      sum(col("xc")).as("sx"), sum(col("yc")).as("sy"),
      sum(col("xc") * col("xc")).as("sxx"),
      sum(col("xc") * col("yc")).as("sxy"),
      sum(col("yc") * col("yc")).as("syy"))
      .select(col("n"),
        ((col("n").cast(d38) * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n").cast(d38) * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("theta"),
        (col("sx").cast("double") / (lit(100.0) * col("n").cast("double")))
          .as("mean_x_pooled"),
        (((col("n").cast(d38) * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n").cast(d38) * col("sxx") - col("sx") * col("sx")).cast("double")) *
          ((col("n").cast(d38) * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n").cast(d38) * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("rho2"))
    val perVariant = base.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_v"), sum(col("yc")).as("syv"),
        sum(col("xc")).as("sxv"))
    perVariant.crossJoin(broadcast(pooled))
      .select(col("variant"), col("n_v").as("n"),
        round(col("syv").cast("double") /
          (lit(100.0) * col("n_v").cast("double")), 6).as("mean_y"),
        round(col("syv").cast("double") / (lit(100.0) * col("n_v").cast("double")) -
          col("theta") * (col("sxv").cast("double") /
            (lit(100.0) * col("n_v").cast("double")) - col("mean_x_pooled")), 6)
          .as("mean_y_cuped"),
        round(col("theta"), 6).as("theta"),
        round(col("rho2"), 6).as("rho2"))
      .orderBy(col("variant"))
  }
}
