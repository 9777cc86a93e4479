package graft.operators.sampling

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temperature-based multilingual/domain resampling (the alpha-sampling
  * of XLM-R [Conneau et al. 2020] and mT5 [Xue et al. 2021]): draw a
  * corpus of ~`targetRows` documents where domain d is sampled with
  * probability q_d ∝ p_d^alpha (p_d = the domain's share of the corpus).
  * alpha < 1 flattens the distribution — low-resource languages are
  * up-sampled, the head language down-sampled — the standard fix for
  * head-language domination in multilingual pre-training; alpha = 1 is
  * proportional (a plain uniform subsample), alpha = 0 is uniform over
  * domains.
  *
  * Mechanics: one map-combined `groupBy(domain).count()` (key space =
  * #domains, model-sized by contract — a mixture with more domains than
  * fits on the driver is mis-specified), then the per-domain expected
  * copy count r_d = targetRows * q_d / n_d is computed driver-side,
  * rounded to 6 dp (so an SQL oracle reproducing the same arithmetic
  * lands on the identical double), and handed to [[CorpusMix.mix]] —
  * rows emit floor(r_d) copies plus one more iff the shared portable
  * md5 draw u < frac(r_d). E[rows from d] = targetRows * q_d exactly;
  * the whole resampling pass after the tiny count agg is ZERO-shuffle
  * (scan → project → explode), deterministic in row identity alone, so
  * a 100 TB run reproduces bit-for-bit under any partitioning, retry,
  * or AQE re-plan.
  *
  * No reference counterpart; builder-prompt training-data-pipeline
  * extension (published method: XLM-R §3.1, mT5 §3.2).
  *
  * Output = input rows (resampled) + `copy_idx` (1..copies) from
  * [[CorpusMix.mix]], so intentional up-sampling survives downstream
  * exact dedup keyed on (id, copy_idx).
  */
object TemperatureMix {

  /** The per-domain expected-copy rates, exposed for tests/oracles:
    * r_d = round6(targetRows * (n_d/N)^alpha / Σ_e (n_e/N)^alpha / n_d). */
  def rates(df: DataFrame, domainCol: String, alpha: Double,
            targetRows: Long): Map[String, Double] = {
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0, 1]")
    require(targetRows > 0, "targetRows must be positive")
    val raw = df.groupBy(col(domainCol).cast("string").as("__d__"))
      .agg(count(lit(1)).as("__n__"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(raw.forall(_._1 != null),
      s"TemperatureMix: domain column '$domainCol' contains nulls — " +
        "filter or fill them before resampling (CorpusMix's explicit contract)")
    val counts = raw.sortBy(_._1) // fixed summation order → reproducible doubles
    require(counts.nonEmpty, "TemperatureMix on an empty corpus")
    val n = counts.map(_._2).sum.toDouble
    val z = counts.map { case (_, c) => math.pow(c / n, alpha) }.sum
    counts.map { case (d, c) =>
      d -> BigDecimal(targetRows * math.pow(c / n, alpha) / z / c.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  def resample(df: DataFrame, domainCol: String, idCol: String,
               alpha: Double = 0.3, targetRows: Long = 1000L,
               seed: Long = 42L): DataFrame = {
    val r = rates(df, domainCol, alpha, targetRows)
    require(r.values.forall(_ <= 1000),
      "temperature mix would up-sample a domain >1000x — raise alpha or " +
        "lower targetRows")
    // defaultWeight=0: a domain unseen at fit time (impossible here, the
    // fit IS this df) contributes nothing rather than leaking through
    CorpusMix.mix(df, domainCol, r, idCol, seed, defaultWeight = 0.0)
  }
}
