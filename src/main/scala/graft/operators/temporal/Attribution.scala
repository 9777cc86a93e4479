package graft.operators.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution — the step up from p75's last-touch
  * as-of: every touchpoint inside the lookback window gets a share of the
  * conversion under three standard credit models, computed side by side
  * (marketing teams diff them, so one pass producing all three beats
  * three runs):
  *   - `linear`:   1/n to each of the n touches;
  *   - `position`: U-shaped 40/20/40 — first 0.4, last 0.4, middles split
  *     0.2/(n−2); n=1 → 1.0, n=2 → 0.5 each;
  *   - `decay`:    weight 1/(1 + Δhours) to each touch, normalized per
  *     conversion (hyperbolic decay: rational in exact integers — a
  *     `pow`-based exponential would hit libm variance cross-engine).
  * Conversions with no in-window touch credit `direct` with 1.0 in every
  * model.
  *
  * Determinism at scale: per-touch credits round to 6 dp, then every
  * AGGREGATION runs in exact integer units — credits as 1e6-scaled
  * BIGINT, credited revenue as credit_micro × value_cents (BIGINT) — so
  * channel totals are order-free and replay digit-for-digit however the
  * shuffle lands. The decay normalizer itself is a ratio of two
  * 1e9-scaled BIGINTs (half-up), never a float window sum, for the same
  * reason. Plan shape: one user-keyed range join conv×touch (bounded by
  * the lookback), two windows keyed by the conversion, one final
  * (model, channel) aggregation.
  *
  * No reference counterpart; builder-prompt analytics extension.
  */
object Attribution {

  /** @return (model, channel, n_credit, value_credit) — n_credit is the
    *         credited conversion count, value_credit the credited revenue,
    *         both exact sums of 6-dp per-touch credits.
    */
  def multiTouch(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, valueCol: String,
                 touchTypes: Seq[String], convType: String,
                 lookbackDays: Int = 3): DataFrame = {
    require(touchTypes.nonEmpty && lookbackDays > 0,
      "need touch types and a positive lookback")
    // per-conversion surrogate: two conversions by one user at the SAME
    // timestamp must keep separate credit windows — keyed on (u, cts)
    // alone they'd share one partition, n would double-count and each
    // conversion's credits would sum to ~0.5 (ADVICE r14). row_number
    // over (cts, cents) is deterministic up to full-duplicate rows,
    // which are symmetric anyway.
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u"), col(tsCol).as("cts"),
        (col(valueCol).cast("decimal(18,2)") * 100).cast("bigint").as("cents"))
      .withColumn("cid", row_number().over(
        Window.partitionBy(col("u")).orderBy(col("cts"), col("cents"))))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("u"), col(tsCol).as("tts"),
        col(typeCol).as("channel"))
    val joined = conv.join(touch,
      conv("u") === touch("u") && col("tts") <= col("cts") &&
        col("tts") >= col("cts") - expr(s"INTERVAL $lookbackDays DAYS"))
      .select(conv("u"), col("cid"), col("cts"), col("cents"), col("tts"),
        col("channel"))
    val wC = Window.partitionBy(col("u"), col("cid"))
    val wO = wC.orderBy(col("tts"), col("channel"))
    val base = joined
      .withColumn("n", count(lit(1)).over(wC))
      .withColumn("rn", row_number().over(wO))
      // hyperbolic decay weight as a 1e9-scaled integer (half-up), so the
      // per-conversion normalizer is an exact integer sum
      .withColumn("w9", floor(
        lit(1.0) / (lit(1.0) +
          (unix_micros(col("cts")) - unix_micros(col("tts"))).cast("double") /
            lit(3.6e9)) * lit(1e9) + lit(0.5)).cast("bigint"))
      .withColumn("sw9", sum(col("w9")).over(wC))
    val credited = base
      .withColumn("linear", round(lit(1.0) / col("n").cast("double"), 6))
      .withColumn("position",
        when(col("n") === 1, lit(1.0))
          .when(col("n") === 2, lit(0.5))
          .when(col("rn") === 1 || col("rn") === col("n"), lit(0.4))
          .otherwise(round(lit(0.2) / (col("n") - 2).cast("double"), 6)))
      .withColumn("decay", round(
        col("w9").cast("double") / col("sw9").cast("double"), 6))
    val models = Seq("linear", "position", "decay")
    val touched = models.map { m =>
      credited.select(lit(m).as("model"), col("channel"),
        round(col(m) * 1e6).cast("bigint").as("cm"),
        (round(col(m) * 1e6).cast("bigint") * col("cents")).as("vm"))
    }.reduce(_ unionByName _)
    // conversions with no in-window touch: 'direct', full credit per model
    import events.sparkSession.implicits._
    val direct = conv
      .join(joined.select(col("u"), col("cid")).distinct(),
        Seq("u", "cid"), "left_anti")
      .crossJoin(models.toDF("model"))
      .select(col("model"), lit("direct").as("channel"),
        lit(1000000L).as("cm"), (lit(1000000L) * col("cents")).as("vm"))
    touched.unionByName(direct)
      .groupBy(col("model"), col("channel"))
      .agg((sum(col("cm")).cast("double") / 1e6).as("n_credit"),
        (sum(col("vm")).cast("double") / 1e8).as("value_credit"))
      .orderBy(col("model"), col("channel"))
  }
}
