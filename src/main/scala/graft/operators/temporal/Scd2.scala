package graft.operators.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 build — turn an event/change log
  * into an effective-dated dimension: one row per (key, attribute
  * state) RUN, with `valid_from`/`valid_to` (half-open, `valid_to` =
  * next change's timestamp), a per-key `version` number, and
  * `is_current` on the open row. Consecutive duplicate states collapse
  * (a re-assertion of the same value is not a new version — the
  * attribute comparison is null-safe, so NULL→NULL is "no change" and
  * NULL→x is one).
  *
  * Scale shape: two key-windows over the same partitioning (change
  * detection via lag, then numbering/closing via lead + row_number on
  * the SURVIVORS — Spark reuses one exchange; the second sort runs on
  * the collapsed rows only). No joins, no state beyond the window
  * frame. The classic MERGE-based SCD2 maintenance (apply a delta to
  * an existing dimension) is the vparquet keyed-merge path; this is
  * the from-scratch history build.
  *
  * No reference counterpart; builder-prompt warehousing extension.
  */
object Scd2 {

  /** Output: key, version, attrs..., valid_from, valid_to, is_current.
    * `tieCol` breaks equal timestamps (order within a tie defines
    * which state "wins" the instant).
    */
  def build(df: DataFrame, keyCol: String, tsCol: String,
            attrCols: Seq[String], tieCol: Option[String] = None): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one attribute column")
    val order = col(tsCol) +: tieCol.map(col).toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val kept = df
      .withColumn("__chg__", changed || row_number().over(w) === 1)
      .filter(col("__chg__")).drop("__chg__")
    val w2 = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    kept
      .withColumn("version", row_number().over(w2))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((col(keyCol) +: col("version") +: attrCols.map(col) :+
        col("valid_from") :+ col("valid_to") :+ col("is_current")): _*)
  }
}
