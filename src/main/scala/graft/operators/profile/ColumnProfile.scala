package graft.operators.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass column profiling — the SUMMARIZE / describe surface of an
  * analytics engine: null counts, distinct counts, numeric and string
  * extrema for W columns in ONE aggregate over ONE scan (never W
  * scans), unpivoted to a row per column.
  *
  * Scale shape: all metrics ride a single global aggregate with
  * map-side partials; the only scale caveat is EXACT distinct counts —
  * W count-distincts in one Aggregate make Catalyst Expand the input
  * W+1-fold before the shuffle, which is the classic profiling blowup
  * at 100 TB. `exact = false` swaps in `approx_count_distinct` (HLL++,
  * no Expand, one map pass) — the right default on a real cluster;
  * exact is the default here because the DuckDB oracle must replay the
  * number bit-for-bit. Extrema are order-free (min/max), so they are
  * deterministic under any partitioning; no mean/stddev on purpose —
  * float sums are shuffle-order-dependent (use the f10 stats battery's
  * decimal-sum discipline when a mean is needed).
  *
  * No single reference counterpart (the reference leans on Spark's
  * `describe`); engine-completeness extension per the builder prompt.
  */
object ColumnProfile {

  /** (column, n, n_null, n_distinct, min_num, max_num, min_str,
    * max_str): numeric extrema as doubles for numeric columns, lexical
    * extrema for string columns, null otherwise.
    *
    * Two aggregates, not one: a STRING min/max in the aggregation
    * buffer forces SortAggregate, and combined with the count-distinct
    * Expand that means sorting W+1 copies of the input (measured 8 s vs
    * 1 s at sf0.1). Counts/distincts/numeric extrema keep fixed-size
    * buffers → HashAggregate over the Expand; string extrema run in a
    * second Expand-FREE pass over the raw rows and crossJoin back as
    * one broadcast row.
    */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val strCols = cols.filter(c => df.schema(c).dataType == StringType)
    val total = count(lit(1)).as("__n")
    val perCol: Seq[Column] = cols.flatMap { c =>
      val cl = col(c)
      val dt = df.schema(c).dataType
      val nd = if (exact) countDistinct(cl) else approx_count_distinct(cl)
      val (mnN, mxN) = dt match {
        case _: NumericType => (min(cl).cast("double"), max(cl).cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      Seq(
        sum(when(cl.isNull, 1L).otherwise(0L)).as(s"__${c}_nn"),
        nd.as(s"__${c}_nd"),
        mnN.as(s"__${c}_mnn"), mxN.as(s"__${c}_mxn"))
    }
    val agg0 = df.agg(total, perCol: _*)
    val agg = if (strCols.isEmpty) agg0 else {
      val strAggs = strCols.flatMap(c =>
        Seq(min(col(c)).as(s"__${c}_mns"), max(col(c)).as(s"__${c}_mxs")))
      agg0.crossJoin(broadcast(df.agg(strAggs.head, strAggs.tail: _*)))
    }
    def strMetric(c: String, suffix: String): Column =
      if (strCols.contains(c)) col(s"__${c}_$suffix")
      else lit(null).cast("string")
    val rows = array(cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n"),
        col(s"__${c}_nn").as("n_null"), col(s"__${c}_nd").as("n_distinct"),
        col(s"__${c}_mnn").as("min_num"), col(s"__${c}_mxn").as("max_num"),
        strMetric(c, "mns").as("min_str"), strMetric(c, "mxs").as("max_str"))
    }: _*)
    agg.select(explode(rows).as("p")).select(col("p.*"))
  }
}
