package graft.operators.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic per-group cap — "at most N documents per language /
  * domain / source", the stratified-balance step of a training-data
  * pipeline (the per-domain cap of RefinedWeb-style pipelines).
  *
  * Which rows survive is decided by the same identity-keyed md5 draw as
  * [[CorpusMix]]/[[CorpusSplit]]: each row draws u = uniform("id:seed"),
  * and the cap keeps the `cap` smallest u per group (ties broken by id).
  * Deterministic in row identity alone — independent of partitioning,
  * cluster size, and re-runs; an incremental re-run keeps the same rows.
  *
  * Scale shape: the naive plan (global window per group) sorts every
  * row of the hottest group in one task — the classic skew trap when one
  * domain is half the corpus. Instead: (1) aggregate per-group counts
  * (map-side combinable, output = #groups rows) and KEEP THEM
  * DISTRIBUTED — real per-domain caps mean 10^5–10^7 groups, so the
  * counts are a DataFrame joined back on the group key (AQE broadcasts
  * it when small, shuffles it when not), never a driver collect or a
  * #groups-deep expression; (2) pre-filter u < margin·cap/n, which keeps
  * ~margin·cap candidates per over-cap group REGARDLESS of group size —
  * the only rows the exact window ever sorts; (3) row_number over the
  * survivors. The pre-filter is verified, not trusted: if some group
  * ended up with fewer than min(cap, n) candidates (Chernoff-tail
  * improbable at margin 4, but "improbable" is not "never"), the margin
  * doubles and the filter re-runs off the same joined frame — the
  * deficiency check itself is one small aggregate-join job whose result
  * is a single boolean, so no per-group state ever lands on the driver.
  *
  * No reference counterpart; builder-prompt north-star extension.
  */
object GroupCap {

  /** uniform [0,1) from the row id — [[CorpusShuffle.draw]], the one
    * shared portable construction.
    */
  private def draw(idCol: String, seed: Long): Column =
    CorpusShuffle.draw(idCol, seed)

  def capPerGroup(df: DataFrame, groupCol: String, cap: Int, idCol: String,
                  seed: Long = 42L): DataFrame = {
    require(cap > 0, "group cap must be positive")
    val withU = df.withColumn("__u__", draw(idCol, seed))

    // #groups rows, kept distributed; null group is its own stratum
    // (groupBy keeps it, and the join below is null-safe)
    val counts = withU.groupBy(col(groupCol).as("__g__"))
      .agg(count(lit(1)).as("__n__"))

    // join the per-group count onto every row; the threshold is then a
    // single arithmetic expression over __n__ with margin as a literal —
    // depth O(1) regardless of #groups, and retries only swap the literal
    def preFiltered(margin: Double): DataFrame =
      withU.join(counts, col(groupCol) <=> col("__g__"))
        .filter(col("__u__") <
          least(lit(1.0), lit(margin * cap) / col("__n__").cast("double")))
        .drop("__g__", "__n__")

    // true iff some group kept fewer than min(cap, n) candidates — one
    // aggregate-join job, single-row answer; a group absent from `pre`
    // counts as 0 via the left join
    def deficient(pre: DataFrame): Boolean = {
      val got = pre.groupBy(col(groupCol).as("__gg__"))
        .agg(count(lit(1)).as("__got__"))
      !counts.join(got, col("__g__") <=> col("__gg__"), "left")
        .filter(coalesce(col("__got__"), lit(0L)) <
          least(lit(cap.toLong), col("__n__")))
        .isEmpty
    }

    var margin = 4.0
    var pre = preFiltered(margin)
    while (deficient(pre)) {
      margin *= 2
      pre = preFiltered(margin)
    }

    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__u__"), col(idCol))
    pre.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") <= cap)
      .drop("__u__", "__rn__")
  }

  /** Keep the `cap` BEST rows per group by an explicit score column
    * ("top 1000 highest-quality docs per domain") instead of a random
    * draw; ties broken by id so the result is deterministic.
    *
    * Skew safety without distribution assumptions (the md5-threshold
    * pre-filter above needs a uniform key): two-phase top-k. Phase 1
    * caps each (group, input-partition) slice with a window keyed on
    * `spark_partition_id()` — a hot group splits across ~P slices, so no
    * task ever sorts more than one partition's share. The group's true
    * global top-cap is a subset of the union of per-slice top-caps, so
    * phase 2's exact window sorts ≤ P·cap survivors per group. Both
    * phases are plain shuffles + bounded sorts at any scale.
    */
  def capPerGroupBy(df: DataFrame, groupCol: String, cap: Int,
                    orderCol: String, descending: Boolean = true,
                    idCol: String = "doc_id"): DataFrame = {
    require(cap > 0, "group cap must be positive")
    // null scores sort last in both directions: never capped in over nulls
    val ord: Seq[Column] =
      Seq(if (descending) col(orderCol).desc_nulls_last
          else col(orderCol).asc_nulls_last,
        col(idCol))
    val w1 = Window.partitionBy(col(groupCol), col("__pid__")).orderBy(ord: _*)
    val survivors = df.withColumn("__pid__", spark_partition_id())
      .withColumn("__rn__", row_number().over(w1))
      .filter(col("__rn__") <= cap)
      .drop("__pid__", "__rn__")
    val w2 = Window.partitionBy(col(groupCol)).orderBy(ord: _*)
    survivors.withColumn("__rn__", row_number().over(w2))
      .filter(col("__rn__") <= cap)
      .drop("__rn__")
  }
}
