package graft.operators.profile

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic distributed histograms — the engine's binning surface.
  *
  * `equiWidth`: fixed-width bins over [min, max] — one min/max
  * aggregate broadcast back, then a scan-speed floor-division bin and
  * one bucket aggregation. Fully order-independent (identical IEEE
  * division per row), bit-replayable.
  *
  * `equiDepth`: equal-POPULATION bins without `ntile` — the global
  * ordered window ntile needs would funnel the whole table through ONE
  * task at 100 TB (the [[graft.operators.text.PerplexityBuckets]]
  * lesson, generalized). Instead: (1) a value-grain histogram
  * `groupBy(v).count` — the only input-sized shuffle, key space
  * bounded by DISTINCT VALUES, not rows (pre-round heavy-cardinality
  * doubles upstream, same contract as PerplexityBuckets' 4dp grain);
  * (2) a cumulative count over that aggregate (a window over the
  * value-grain table — tiny relative to input, and the one
  * deliberately non-distributed step); (3) the j-th cutoff is the
  * smallest v with cum ≥ ⌈N·j/n⌉ (integer ceiling arithmetic — no
  * float thresholds); (4) buckets assign at the VALUE level by
  * counting cutoffs strictly below v — ties-by-value stay together
  * (ntile's arbitrary tie split is both engine-unportable and
  * semantically wrong for repeated values). Bucket populations are
  * equal up to value ties.
  *
  * Output for both: (bucket, lo, hi, n) — lo/hi are DATA extrema
  * inside the bucket for equiDepth, bin EDGES for equiWidth.
  */
object Histogram {

  def equiWidth(df: DataFrame, valCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val base = df.select(col(valCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val mm = base.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    base.crossJoin(broadcast(mm))
      .withColumn("bucket",
        when(col("mx") === col("mn"), lit(0)).otherwise(
          least(floor((col("v") - col("mn")) /
            ((col("mx") - col("mn")) / nBuckets)).cast("int"),
            lit(nBuckets - 1))))
      .groupBy(col("bucket"))
      .agg(max(col("mn")).as("mn"), max(col("mx")).as("mx"),
        count(lit(1)).as("n"))
      .select(col("bucket"),
        round(col("mn") + col("bucket") * ((col("mx") - col("mn")) / nBuckets), 6)
          .as("lo"),
        round(col("mn") + (col("bucket") + 1) * ((col("mx") - col("mn")) / nBuckets), 6)
          .as("hi"),
        col("n"))
  }

  def equiDepth(df: DataFrame, valCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    val base = df.select(col(valCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val h = base.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val cum = h.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("v"))))
    val total = h.agg(sum(col("cnt")).as("n"))
    // cutoff_j = min v with cum >= ceil(N*j/n), j = 1..n-1 (exact integer
    // thresholds); nBuckets-1 rows -> bounded driver collect, the same
    // model-state posture as ClusterSample's centroid Literal
    val cuts = total
      .select(explode(sequence(lit(1), lit(nBuckets - 1))).as("j"), col("n"))
      .select(col("j"), expr(s"(n * j + $nBuckets - 1) div $nBuckets").as("t"))
      .join(cum, cum("cum") >= col("t"))
      .groupBy(col("j")).agg(min(col("v")).as("c"))
      .orderBy(col("j")).collect().map(_.getDouble(1))
    // empty input -> no cutoffs; a bare array() literal is NullType and
    // breaks the lambda's comparison, so type the empty case explicitly
    val cutArr: Column =
      if (cuts.isEmpty) array().cast("array<double>")
      else array(cuts.map(lit(_)).toIndexedSeq: _*)
    h.withColumn("bucket", size(filter(cutArr, c => c < col("v"))))
      .groupBy(col("bucket"))
      .agg(round(min(col("v")), 6).as("lo"), round(max(col("v")), 6).as("hi"),
        sum(col("cnt")).as("n"))
  }
}
