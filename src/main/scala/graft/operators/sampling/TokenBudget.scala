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
    CorpusShuffle.draw(idCol, seed) // the one shared portable construction

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
    graft.CacheScope.pin(ranged, lastCache)

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

  /** Per-group token budgets — the literal mixture-recipe contract
    * ("exactly 50 B tokens of web + 10 B of code" in ONE pass): within
    * each group, keep the whole-document prefix of that group's shuffle
    * order whose cumulative cost fits the group's budget.
    * `defaultBudget < 0` drops groups absent from `budgets` (a recipe
    * lists its components); `>= 0` applies it to every other group.
    *
    * Same two-phase prefix sum as [[take]], generalized: the range
    * repartition keys on (group, draw), so each group occupies a
    * CONTIGUOUS run of partitions and one subtotal pass yields per-
    * (group, partition-slice) bases — a hot group spreads over many
    * slices instead of one task sorting all of it. Driver state is one
    * row per (partition, group-in-partition) ≈ partitions + #groups.
    */
  def takePerGroup(df: DataFrame, groupCol: String, idCol: String,
                   tokenCol: String, budgets: Map[String, Long],
                   defaultBudget: Long = -1L, seed: Long = 42L,
                   partitions: Int = 0): DataFrame = {
    require(budgets.values.forall(_ >= 0), "group budgets must be >= 0")
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val budgetExpr = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (g, b)) => when(col(groupCol) === lit(g), lit(b)).otherwise(acc)
    }
    val ranged = df
      .withColumn("__b__", budgetExpr)
      .filter(col("__b__") >= 0)
      .withColumn("__u__", draw(idCol, seed))
      .withColumn("__cost__",
        greatest(coalesce(col(tokenCol).cast("long"), lit(0L)), lit(0L)))
      .repartitionByRange(n, col(groupCol), col("__u__"), col(idCol))
      .withColumn("__pid__", spark_partition_id())
      .cache()
    graft.CacheScope.pin(ranged, lastCache)

    // per-(pid, group) subtotals: bases accumulate along each GROUP's
    // partition run (groups are contiguous under the range keys)
    val subtotals = ranged.groupBy("__pid__", groupCol)
      .agg(sum("__cost__").as("t")).collect()
      .map(r => (r.getInt(0), Option(r.get(1)).map(_.toString)) -> r.getLong(2))
    val bases: Map[(Int, Option[String]), Long] = subtotals
      .groupBy(_._1._2).flatMap { case (g, entries) =>
        val sorted = entries.sortBy(_._1._1)
        sorted.map(_._1).zip(
          sorted.map(_._2).scanLeft(0L)(_ + _).init)
      }
    val baseOf = if (bases.isEmpty) lit(0L) else {
      // driver-sized map keyed "pid:group" — same element_at trick as take()
      val m = bases.map { case ((pid, g), b) => s"$pid:${g.getOrElse("\u0000")}" -> b }
      element_at(typedLit(m),
        concat_ws(":", col("__pid__").cast("string"),
          coalesce(col(groupCol).cast("string"), lit("\u0000"))))
    }
    val localEnd = sum(col("__cost__")).over(
      Window.partitionBy(col("__pid__"), col(groupCol))
        .orderBy(col("__u__"), col(idCol)))
    ranged
      .filter(baseOf <= col("__b__"))
      .withColumn("__end__", localEnd + baseOf)
      .filter(col("__end__") <= col("__b__"))
      .drop("__b__", "__u__", "__cost__", "__pid__", "__end__")
  }
}
