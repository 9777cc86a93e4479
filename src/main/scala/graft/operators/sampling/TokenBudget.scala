package graft.operators.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sampling — "take exactly the first B tokens' worth of
  * the (deterministically shuffled) corpus": the whole-document prefix
  * of the [[CorpusShuffle]] order whose cumulative cost fits the budget.
  * This is how a mixture recipe turns "weights" into "exactly 50 B
  * tokens of web + 10 B of code": cap each component by token budget,
  * not row count.
  *
  * The cutoff needs a GLOBAL running sum in shuffle order, and the naive
  * `sum over (order by key)` window is a single-partition sort at scale.
  * Instead, the same two-phase distributed prefix sum as
  * [[graft.operators.text.SequencePack]]: range-repartition on the draw
  * key, collect per-partition subtotals (numPartitions rows — driver-
  * sized by construction), broadcast the partition base offsets back,
  * and compute each row's global cumulative end as base(partition) +
  * within-partition running sum. Every stage is distributed; the only
  * driver data is one long per partition.
  *
  * Semantics: keep rows whose cumulative END ≤ budget (whole documents
  * only — the straddling document is dropped, never truncated; pair with
  * [[graft.operators.text.DocChunk]] first if sub-document granularity
  * is wanted). Rows with null/non-positive cost occupy no budget and are
  * kept when reached. Deterministic in (identity, seed) like the rest of
  * the sampling suite.
  *
  * No reference counterpart; builder-prompt north-star extension.
  */
object TokenBudget {

  /** Most recent ranged-projection cache — released by the next call
    * (single-consumer contract, as in SequencePack: the cache pins the
    * range partitioner's sampled boundaries so the subtotal collect and
    * the returned plan see the SAME partitioning).
    */
  private val lastCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  private def draw(idCol: String, seed: Long): Column =
    conv(substring(md5(concat_ws(":",
        col(idCol).cast("string"), lit(seed.toString))), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  def take(df: DataFrame, idCol: String, tokenCol: String, budget: Long,
           seed: Long = 42L, partitions: Int = 0): DataFrame = {
    require(budget >= 0, "token budget must be >= 0")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .withColumn("__u__", draw(idCol, seed))
      .withColumn("__cost__",
        greatest(coalesce(col(tokenCol).cast("long"), lit(0L)), lit(0L)))
      .repartitionByRange(n, col("__u__"), col(idCol))
      .withColumn("__pid__", spark_partition_id())
      .cache()
    Option(lastCache.getAndSet(ranged)).foreach(_.unpersist(false))

    val subtotals = ranged.groupBy("__pid__").agg(sum("__cost__").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxPid = if (subtotals.isEmpty) -1 else subtotals.keys.max
    val bases: Map[Int, Long] = (0 to maxPid)
      .scanLeft(0 -> 0L) { case ((_, acc), p) => p -> (acc + subtotals.getOrElse(p - 1, 0L)) }
      .toMap
    val baseOf =
      if (bases.isEmpty) lit(0L) else element_at(typedLit(bases), col("__pid__"))

    val localEnd = sum(col("__cost__")).over(
      Window.partitionBy(col("__pid__")).orderBy(col("__u__"), col(idCol)))
    ranged
      // partitions that START past the budget can't contribute (end >=
      // base for every row) — prune them before the window ever sorts
      // them, so the cost is ~budget-sized, not corpus-sized (`<=` keeps
      // the boundary partition for zero-cost rows sitting exactly at it)
      .filter(baseOf <= budget)
      .withColumn("__end__", localEnd + baseOf)
      .filter(col("__end__") <= budget)
      .drop("__u__", "__cost__", "__pid__", "__end__")
  }
}
