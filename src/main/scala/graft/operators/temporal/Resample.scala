package graft.operators.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-interval time-series resampling with a DENSE per-key bucket
  * axis — the downsample-and-gap-fill step of telemetry/metrics prep
  * (pandas' `resample`, TimescaleDB's `time_bucket_gapfill`,
  * re-expressed as three declarative stages).
  *
  * Stages: (1) bucket each row to floor(ts / interval) and aggregate per
  * (key, bucket) — ONE shuffle, partial-aggregated map-side; (2) build
  * each key's dense bucket axis with `sequence(min, max, step)` exploded
  * from the per-key min/max row — the axis is generated, never scanned,
  * so its cost is output-sized ((span/interval) rows per key), not
  * input-sized; (3) left-join the axis to the aggregates on (key,
  * bucket) — both sides already hash-partition on the same keys — and
  * fill the holes: `zero`/`null` are per-row `coalesce`, `ffill`
  * carries the last seen value forward with `last(_, ignoreNulls)` over
  * the per-key bucket order (a window per key, never global).
  *
  * 100 TB note: the only input-sized exchange is the bucket aggregation
  * in stage 1, which is exactly the shuffle any GROUP BY would pay. One
  * key spanning years at 1 s granularity makes ITS axis large — that is
  * inherent to gap-filling (the output really has those rows), and it
  * stays distributed because the explode happens on the key's row, not
  * the driver.
  *
  * No reference counterpart; builder-prompt north-star extension.
  */
object Resample {

  /** Bucket ts down to a whole multiple of `intervalSec`, keeping the
    * timestamp type (micros arithmetic — exact for any interval that is
    * a whole number of seconds).
    */
  def bucket(ts: Column, intervalSec: Long): Column = {
    // integer-only floor-to-multiple (x - pmod(x, step)): Column `/` is
    // double division and a double round-trip near a bucket boundary is
    // exactly the off-by-one an oracle would catch
    val us = unix_micros(ts)
    val step = intervalSec * 1000000L
    timestamp_micros(us - pmod(us, lit(step)))
  }

  /** `aggs`: output column name -> aggregate over the bucket's rows.
    * `fill`: "null" (leave holes NULL), "zero" (coalesce numeric holes
    * to 0), or "ffill" (carry the previous bucket's value forward; the
    * leading holes before a key's first value stay NULL only when the
    * axis starts before any data — it never does here, since the axis
    * spans [min, max]).
    */
  def resample(df: DataFrame, keyCols: Seq[String], tsCol: String,
               intervalSec: Long, aggs: Seq[(String, Column)],
               fill: String = "null",
               bucketCol: String = "bucket"): DataFrame = {
    require(intervalSec > 0, "resample interval must be positive")
    require(keyCols.nonEmpty, "resample needs at least one key column")
    require(Set("null", "zero", "ffill")(fill),
      s"fill must be null|zero|ffill, got '$fill'")
    val keys = keyCols.map(col)
    val stepUs = intervalSec * 1000000L

    val agged = df
      .withColumn(bucketCol, bucket(col(tsCol), intervalSec))
      .groupBy(keys :+ col(bucketCol): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }.toSeq: _*)

    // dense axis: one row per key carrying (min, max), exploded to the
    // full bucket range — generated output, no second scan of df
    val axis = agged
      .groupBy(keys: _*)
      .agg(min(unix_micros(col(bucketCol))).as("__mn__"),
        max(unix_micros(col(bucketCol))).as("__mx__"))
      .select(keys :+ explode(sequence(col("__mn__"), col("__mx__"),
        lit(stepUs))).as("__bus__"): _*)
      .withColumn(bucketCol, timestamp_micros(col("__bus__")))
      .drop("__bus__")

    val joined = axis.join(agged, keyCols :+ bucketCol, "left")
    fill match {
      case "null" => joined
      case "zero" =>
        aggs.map(_._1).foldLeft(joined) { (d, n) =>
          d.withColumn(n, coalesce(col(n), lit(0))) }
      case "ffill" =>
        val w = Window.partitionBy(keys: _*)
          .orderBy(col(bucketCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        aggs.map(_._1).foldLeft(joined) { (d, n) =>
          d.withColumn(n, last(col(n), ignoreNulls = true).over(w)) }
    }
  }

  /** Trailing-window anomaly score over an (already resampled or
    * otherwise regular) series: z = (v − mean) / stddev of the
    * `lookback` rows BEFORE the current one, per key. NULL until the
    * trailing window has ≥ 2 rows or while it has zero variance (a
    * constant baseline admits no z-score), so warm-up rows never fire a
    * detector. The variance is computed EXPLICITLY from sum / sum-of-
    * squares window aggregates rather than `stddev(...)` — over integer
    * inputs those sums are exact, making the score a fixed sequence of
    * double ops that any engine reproduces bit-for-bit (the property the
    * q45 oracle pins); `stddev`'s internal accumulation order is
    * engine-private. Per-key windows only — distributed like every other
    * window here, never a global sort.
    */
  def anomalyScore(df: DataFrame, keyCols: Seq[String], orderCol: String,
                   valueCol: String, lookback: Int,
                   outCol: String = "z_score"): DataFrame = {
    require(lookback >= 2, "anomaly lookback must be >= 2")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol)).rowsBetween(-lookback, -1)
    val v = col(valueCol).cast("double")
    val n = count(v).over(w).cast("double")
    val s = sum(v).over(w)
    val ss = sum(v * v).over(w)
    val mean = s / n
    val variance = (ss - n * mean * mean) / (n - 1)
    df.withColumn(outCol,
      when(count(v).over(w) >= 2 && variance > 0,
        (v - mean) / sqrt(variance)))
  }
}
