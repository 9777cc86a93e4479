package graft.operators.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.VParquet

/** Incremental corpus statistics — running row counts, null counts, and
  * approximate distinct cardinalities per tracked column, maintained in
  * O(new batch) instead of O(corpus): the state is a tiny vparquet table
  * of one MERGEABLE HLL sketch per column (Spark's DataSketches
  * `hll_sketch_agg`/`hll_union`), so ingesting a day's batch into a
  * 100 TB corpus updates the global distinct counts without rescanning
  * a byte of history. The same mergeability is what makes the batch
  * pass itself one map-side-combinable aggregation (sketches combine on
  * the mappers; the shuffle carries #cols sketches, not rows).
  *
  * Atomicity + idempotence ride on the vparquet manifest log (same
  * discipline as [[graft.operators.dedup.SignatureStore]]): each update
  * is ONE overwrite commit, and a `batchId` maps onto the store's
  * (txnAppId, txn) watermark so re-submitting an already-applied batch
  * is a storage-level no-op — exactly-once stats under at-least-once
  * ingestion.
  *
  * Sketch columns must be HLL-supported types (integral / string /
  * binary); cast doubles first. Estimates are exact while a column's
  * cardinality is small (sketch still in exact mode) and ~±2 % beyond.
  * No reference counterpart; builder-prompt north-star extension.
  */
object CorpusStats {

  /** One row per tracked column for this batch alone:
    * (col_name, n_rows, n_nonnull, sketch). `lgK` sizes the sketch
    * (2^lgK registers): the default 12 is exact to a few hundred
    * distincts then ~±2 %; raise it (max 21) to push the exact range
    * and tighten the error at the cost of a (still tiny) state row.
    * Sketches only union with equal lgK, so pick it once per store.
    */
  def batchStats(batch: DataFrame, cols: Seq[String],
                 lgK: Int = 12): DataFrame = {
    require(cols.nonEmpty, "corpus-stats needs at least one column")
    val aggs = count(lit(1)).as("__n__") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      hll_sketch_agg(col(c), lit(lgK)).as(s"__sk_$c")))
    val row = batch.agg(aggs.head, aggs.tail: _*).cache()
    try cols.map(c => row.select(
        lit(c).as("col_name"),
        col("__n__").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"),
        col(s"__sk_$c").as("sketch")))
      .reduce(_ unionAll _)
      .localCheckpoint(true) // materialize off the cached agg row
    finally row.unpersist(false)
  }

  /** Merge this batch into the state at `statePath` (one atomic commit)
    * and return the updated [[summary]]. `batchId`, when given, makes the
    * update idempotent across re-submissions.
    */
  def update(batch: DataFrame, cols: Seq[String], statePath: String,
             batchId: Option[String] = None, lgK: Int = 12): DataFrame = {
    val spark = batch.sparkSession
    val fresh = batchStats(batch, cols, lgK)
    val merged = VParquet.latestVersion(spark, statePath) match {
      case None => fresh
      case Some(_) =>
        val old = VParquet.loadVersion(spark, statePath, None, None)
          .select(col("col_name"), col("n_rows").as("__on__"),
            col("n_nonnull").as("__onn__"), col("sketch").as("__osk__"))
        old.join(fresh, Seq("col_name"), "full_outer")
          .select(col("col_name"),
            (coalesce(col("__on__"), lit(0L)) +
              coalesce(col("n_rows"), lit(0L))).as("n_rows"),
            (coalesce(col("__onn__"), lit(0L)) +
              coalesce(col("n_nonnull"), lit(0L))).as("n_nonnull"),
            when(col("__osk__").isNull, col("sketch"))
              .when(col("sketch").isNull, col("__osk__"))
              .otherwise(hll_union(col("__osk__"), col("sketch")))
              .as("sketch"))
    }
    VParquet.write(merged, statePath, overwrite = true,
      txn = batchId.map(_ => 1L),
      txnAppId = batchId.map(id => s"corpus-stats:$id"))
    summary(spark, statePath)
  }

  /** Current totals: (col_name, n_rows, n_nonnull, approx_distinct). */
  def summary(spark: SparkSession, statePath: String): DataFrame =
    summaryAt(spark, statePath, None)

  /** Totals as of an earlier state version — each [[update]] is one
    * vparquet commit, so the stats history is time-travelable for free.
    */
  def summaryAt(spark: SparkSession, statePath: String,
                version: Option[Long]): DataFrame =
    VParquet.loadVersion(spark, statePath, version, None)
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        coalesce(hll_sketch_estimate(col("sketch")), lit(0L))
          .as("approx_distinct"))
      .orderBy("col_name")

  /** Version-over-version drift: per tracked column, rows/nonnull/
    * distinct added between two state versions (`to` = None for
    * latest) — "what did the last week of ingestion add to corpus
    * cardinality" without touching the corpus. Distinct growth is the
    * difference of HLL estimates, so it carries the sketches' ~±2 %
    * beyond the exact range.
    */
  def drift(spark: SparkSession, statePath: String, fromVersion: Long,
            toVersion: Option[Long] = None): DataFrame = {
    val a = summaryAt(spark, statePath, Some(fromVersion))
      .select(col("col_name"), col("n_rows").as("__ar__"),
        col("n_nonnull").as("__an__"), col("approx_distinct").as("__ad__"))
    summaryAt(spark, statePath, toVersion)
      .join(a, Seq("col_name"), "left")
      .select(col("col_name"),
        (col("n_rows") - coalesce(col("__ar__"), lit(0L))).as("rows_added"),
        (col("n_nonnull") - coalesce(col("__an__"), lit(0L))).as("nonnull_added"),
        (col("approx_distinct") - coalesce(col("__ad__"), lit(0L)))
          .as("distinct_added"))
      .orderBy("col_name")
  }
}
