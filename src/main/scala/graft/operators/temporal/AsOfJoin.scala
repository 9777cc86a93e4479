package graft.operators.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row (key, t) attach the latest right row with
  * the same key and rightTime ≤ t. Spark has no native as-of operator
  * (SURVEY §2.3 maps range/as-of semantics onto joins); the naive theta
  * join `l.t >= r.t` explodes into a per-key cartesian before picking the
  * max — O(n·m) per key.
  *
  * This implementation is the union + ordered-window formulation: tag both
  * sides, union them, and per key carry the last right payload forward over
  * rows ordered by (time, side) — ONE hash shuffle on the key, a per-key
  * sort, zero pair blowup. At 100 TB this is the plan you want: shuffle
  * volume is |L|+|R|, AQE handles key skew, and the window is a single
  * running `last(ignoreNulls)`.
  *
  * Tie rule: a right row at exactly t matches (inclusive ≥), same as
  * DuckDB/pandas ASOF semantics — right rows sort before left rows on
  * equal timestamps.
  */
object AsOfJoin {

  /** Inner as-of join. `rightPayload` columns are appended as
    * `asof_<name>` to every matched left row (unmatched left rows are
    * dropped, as in an inner ASOF JOIN).
    */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           rightPayload: Seq[String]): DataFrame = {
    val keyExprs = keyCols.map(col)
    // equality-join semantics: NULL keys never match (the window grouping
    // would otherwise pair null-key rows with each other)
    val notNull = keyExprs.map(_.isNotNull).reduce(_ && _)
    val l = left.filter(notNull)
      .select(keyExprs :+ col(leftTime).as("__t__") :+
        struct(left.columns.map(col).toSeq: _*).as("__lp__"): _*)
      .withColumn("__side__", lit(1))
    // a NULL right time satisfies no `rightTime <= t` predicate, but would
    // sort first (ASC NULLS FIRST) and become a carried-forward match —
    // drop such rows up front
    val r = right.filter(notNull && col(rightTime).isNotNull)
      .select(keyExprs :+ col(rightTime).as("__t__") :+
        struct(rightPayload.map(col): _*).as("__rp__"): _*)
      .withColumn("__side__", lit(0))
    val unioned = l
      .withColumn("__rp__", lit(null).cast(r.schema("__rp__").dataType))
      .unionByName(r.withColumn("__lp__", lit(null).cast(l.schema("__lp__").dataType)))
    val w = Window.partitionBy(keyExprs: _*)
      .orderBy(col("__t__"), col("__side__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__matched__", last(col("__rp__"), ignoreNulls = true).over(w))
      .filter(col("__side__") === 1 && col("__matched__").isNotNull)
      .select(left.columns.map(c => col(s"__lp__.`$c`")) ++
        rightPayload.map(c => col(s"__matched__.`$c`").as(s"asof_$c")): _*)
  }
}
