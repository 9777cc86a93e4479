package graft.operators.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift measures between two samples — the data-quality
  * complement of [[graft.operators.temporal.Cusum]] (which watches a mean
  * over TIME, these compare two WHOLE distributions — last week's corpus
  * vs this week's, treatment vs control, crawl A vs crawl B):
  *
  *   - [[ks]]: the two-sample Kolmogorov-Smirnov statistic
  *     `D = max_v |F_A(v) − F_B(v)|`, computed EXACTLY — the ECDF gap at
  *     each value is the integer `|cumA·m − cumB·n|`, so the max is an
  *     integer comparison and D = gap/(n·m) is one double division at the
  *     end. No approximation, no float ordering anywhere.
  *   - [[psi]]: the population stability index over `nBuckets` equal-width
  *     buckets spanning the POOLED [min, max] in exact cents arithmetic
  *     (integer-div bucketing), with add-one smoothing so empty buckets
  *     stay finite: `PSI = Σ (p_i − q_i)·ln(p_i/q_i)` — the standard
  *     <0.1 / <0.25 / ≥0.25 drift bands.
  *
  * Plan shape: each measure is one groupBy over values/buckets (map-side
  * combinable) + windows over the DISTINCT-VALUE axis (KS) or the bucket
  * axis (PSI) — both bounded by the value domain, not the sample sizes;
  * a billion rows reduce before any window runs.
  *
  * Determinism: KS is exact integers end-to-end; PSI's counts and bucket
  * edges are exact integers, the ln terms fold per-bucket and round to
  * 6 dp (the p26/p42 grain). Values are 2-dec measurements (the house
  * cents recipe).
  *
  * No reference counterpart; builder-prompt data-quality extension.
  */
object DistDrift {

  /** One row: (n_a, n_b, d_num, d) with `d = d_num/(n_a·n_b)` — the exact
    * two-sample KS statistic (gap ECDFs compared as integers; n_a·n_b
    * must fit a BIGINT, i.e. samples up to ~3·10⁹ each).
    */
  def ks(df: DataFrame, sideCol: String, valueCol: String,
         a: String, b: String): DataFrame = {
    val vals = df.filter(col(sideCol).isin(a, b) && col(valueCol).isNotNull)
      .select((col(valueCol).cast("decimal(18,2)") * 100).cast("bigint").as("vc"),
        when(col(sideCol) === a, 1L).otherwise(0L).as("ia"),
        when(col(sideCol) === b, 1L).otherwise(0L).as("ib"))
    val perV = vals.groupBy(col("vc"))
      .agg(sum(col("ia")).as("ca"), sum(col("ib")).as("cb"))
    val tot = perV.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val w = Window.orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perV
      .withColumn("cumA", sum(col("ca")).over(w))
      .withColumn("cumB", sum(col("cb")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        abs(col("cumA") * col("n_b") - col("cumB") * col("n_a")).as("gap"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("gap")).as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        // an empty side has no ECDF: d is null, not a 0/0 NaN
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("d_num").cast("double") /
            (col("n_a") * col("n_b")).cast("double"), 6)).as("d"))
  }

  /** PSI over equal-width buckets of the pooled range, add-one smoothed.
    * Output: one row (n_a, n_b, psi) — plus per-bucket detail via
    * [[psiBuckets]].
    */
  def psi(df: DataFrame, sideCol: String, valueCol: String,
          a: String, b: String, nBuckets: Int = 10): DataFrame = {
    val detail = psiBuckets(df, sideCol, valueCol, a, b, nBuckets)
    detail.agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
      round(sum(col("term")), 6).as("psi"))
  }

  /** Per-bucket PSI detail: (bucket, c_a, c_b, n_a, n_b, term) with
    * `term = (p − q)·ln(p/q)` on add-one-smoothed rates, 9 dp per term
    * (the final [[psi]] sum re-rounds to 6).
    */
  def psiBuckets(df: DataFrame, sideCol: String, valueCol: String,
                 a: String, b: String, nBuckets: Int = 10): DataFrame = {
    require(nBuckets > 1, "need at least 2 buckets")
    val vals = df.filter(col(sideCol).isin(a, b) && col(valueCol).isNotNull)
      .select((col(valueCol).cast("decimal(18,2)") * 100).cast("bigint").as("vc"),
        when(col(sideCol) === a, 1L).otherwise(0L).as("ia"),
        when(col(sideCol) === b, 1L).otherwise(0L).as("ib"))
    val mm = vals.agg(min(col("vc")).as("lo"), max(col("vc")).as("hi"),
      sum(col("ia")).as("n_a"), sum(col("ib")).as("n_b"))
    vals.crossJoin(broadcast(mm))
      // integer-div bucketing over the pooled exact-cents range; the +1
      // on the span puts hi itself in the last bucket without a LEAST
      .withColumn("bucket",
        expr(s"(vc - lo) * $nBuckets div (hi - lo + 1)"))
      .groupBy(col("bucket"))
      .agg(sum(col("ia")).as("c_a"), sum(col("ib")).as("c_b"),
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
      .withColumn("__p__", (col("c_a") + 1).cast("double") /
        (col("n_a") + nBuckets).cast("double"))
      .withColumn("__q__", (col("c_b") + 1).cast("double") /
        (col("n_b") + nBuckets).cast("double"))
      .withColumn("term",
        round((col("__p__") - col("__q__")) * log(col("__p__") / col("__q__")), 9))
      .select(col("bucket"), col("c_a"), col("c_b"),
        col("n_a"), col("n_b"), col("term"))
      .orderBy(col("bucket"))
  }
}
