package graft.operators.sampling

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-weighted corpus mixing — the re-sampling step of a training-data
  * pipeline ("web at 0.1x, books at 2.5x, default 1x"). Weight w per
  * domain: every row is emitted floor(w) times plus one more with
  * probability frac(w), so E[copies] = w exactly — down-sampling (w < 1),
  * up-sampling (w > 1), and dropping (w = 0) fall out of the same rule.
  *
  * The Bernoulli draw is NOT rand(): u = (first 8 md5 hex digits of
  * "id:seed") / 2^32, a pure per-row codegen'd expression. That makes the
  * sample deterministic in the row's identity alone — independent of
  * partitioning, cluster size, task retries, and AQE re-plans, so a 100 TB
  * run reproduces bit-for-bit on any layout and an incremental re-run
  * makes the same keep/drop call for every previously-seen row. No
  * shuffle anywhere: the plan is scan -> project -> generate (explode).
  *
  * Output adds `copy_idx` (1..copies) so downstream exact-dedup keyed on
  * (id, copy_idx) does not collapse intentional up-sampling.
  */
object CorpusMix {

  def mix(df: DataFrame, domainCol: String, weights: Map[String, Double],
          idCol: String, seed: Long = 42L,
          defaultWeight: Double = 1.0): DataFrame = {
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0,
      "corpus-mix weights must be >= 0")
    require(weights.values.forall(_ <= 1000) && defaultWeight <= 1000,
      "corpus-mix weight > 1000x is almost certainly a typo and would " +
        "explode output volume")
    val wExpr = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, v)) =>
      when(col(domainCol) === lit(k), lit(v)).otherwise(acc)
    }
    // uniform [0,1) from the row id ([[CorpusShuffle.draw]], the one
    // shared portable construction)
    val u = CorpusShuffle.draw(idCol, seed)
    df.withColumn("__w__", wExpr)
      .withColumn("__copies__",
        (floor(col("__w__")) +
          when(u < (col("__w__") - floor(col("__w__"))), 1).otherwise(0))
          .cast("int"))
      .filter(col("__copies__") >= 1)
      // long-typed sequence bounds => bigint copy_idx (a generator can't be
      // nested under a cast, so the type comes from the bounds)
      .withColumn("copy_idx",
        explode(sequence(lit(1L), col("__copies__").cast("bigint"))))
      .drop("__w__", "__copies__")
  }
}
