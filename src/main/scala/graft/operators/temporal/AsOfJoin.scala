package graft.operators.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row (key, t) attach the nearest right row
  * with the same key under the chosen `direction` — `backward`
  * (rightTime ≤ t, the default and the classic ASOF), `forward`
  * (rightTime ≥ t), or `nearest` (closer of the two, ties backward) —
  * optionally bounded by a `tolerance` gap (pandas merge_asof's
  * parameter set). Spark has no native as-of operator (SURVEY §2.3 maps
  * range/as-of semantics onto joins); the naive theta join `l.t >= r.t`
  * explodes into a per-key cartesian before picking the max — O(n·m)
  * per key.
  *
  * This implementation is the union + ordered-window formulation: tag
  * both sides, union them, and per key carry the last right payload
  * forward over rows ordered by (time, side) — ONE hash shuffle on the
  * key, a per-key sort, zero pair blowup. `forward` is the same window
  * ordered descending; `nearest` evaluates both orderings over the SAME
  * key partitioning (one exchange, two sorts). At 100 TB this is the
  * plan you want: shuffle volume is |L|+|R|, AQE handles key skew, and
  * each window is a single running `last(ignoreNulls)`.
  *
  * Tie rule: a right row at exactly t matches in every direction
  * (inclusive), same as DuckDB/pandas ASOF semantics — right rows sort
  * before left rows on equal timestamps. When several right rows share
  * the same (key, rightTime) the carried payload is the struct-wise
  * MAXIMUM of the tied payloads (the payload struct is a tertiary sort
  * key in both window orderings, so the pick is identical across runs,
  * executor counts, and directions — ADVICE r15: without it the tie was
  * partition-order-dependent). Consequence: payload columns must be
  * orderable types (no maps). `tolerance` is a SQL
  * expression compared against the time gap in the time column's own
  * algebra (`INTERVAL` syntax for timestamps, a numeric literal for
  * numeric time axes); the gap is inclusive (`<= tolerance`).
  */
object AsOfJoin {

  /** Inner as-of join. `rightPayload` columns are appended as
    * `asof_<name>` to every matched left row (unmatched left rows are
    * dropped, as in an inner ASOF JOIN).
    */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           rightPayload: Seq[String],
           direction: String = "backward",
           tolerance: Option[String] = None): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction),
      s"as-of direction must be backward|forward|nearest, got '$direction'")
    // the payload struct is a tie-break sort key (scaladoc), so every
    // payload column must be an orderable type — validate up front with a
    // named error instead of letting the window analysis throw an opaque
    // AnalysisException on `__rp__` (ADVICE r16: map-typed payloads)
    rightPayload.foreach { p =>
      val dt = right.schema(p).dataType
      if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt))
        throw new IllegalArgumentException(
          s"as-of rightPayload column '$p' has non-orderable type " +
            s"${dt.simpleString}: payload columns must be orderable for " +
            "deterministic tie-breaking among right rows tied on (key, time) " +
            "(maps, and structs containing maps, are not; wrap the map in " +
            "map_entries(...) sorted, or drop it from the payload)")
    }
    val keyExprs = keyCols.map(col)
    // equality-join semantics: NULL keys never match (the window grouping
    // would otherwise pair null-key rows with each other)
    val notNull = keyExprs.map(_.isNotNull).reduce(_ && _)
    val l = left.filter(notNull)
      .select(keyExprs :+ col(leftTime).as("__t__") :+
        struct(left.columns.map(col).toSeq: _*).as("__lp__"): _*)
      .withColumn("__side__", lit(1))
    // a NULL right time satisfies no gap predicate, but would sort first
    // (ASC NULLS FIRST) and become a carried-forward match — drop such
    // rows up front
    val r = right.filter(notNull && col(rightTime).isNotNull)
      .select(keyExprs :+ col(rightTime).as("__t__") :+
        struct(rightPayload.map(col): _*).as("__rp__"): _*)
      .withColumn("__side__", lit(0))
    val unioned = l
      .withColumn("__rp__", lit(null).cast(r.schema("__rp__").dataType))
      .unionByName(r.withColumn("__lp__", lit(null).cast(l.schema("__lp__").dataType)))

    // the matched right TIME rides beside the payload only when a gap or
    // a nearest-comparison needs it; last() over the identical frame
    // selects the same row for both columns
    val needTime = tolerance.isDefined || direction == "nearest"
    val tagged =
      if (needTime)
        unioned.withColumn("__rt__",
          when(col("__side__") === 0, col("__t__")))
      else unioned

    def running(desc: Boolean): (Column, Column) = {
      val ord = if (desc) col("__t__").desc else col("__t__").asc
      // tertiary key __rp__ makes the pick among right rows tied on
      // (key, time) unique: last() then always carries the max payload
      // struct (left rows have a null __rp__, which cannot reorder them
      // relative to right rows — __side__ already separates the sides)
      val w = Window.partitionBy(keyExprs: _*)
        .orderBy(ord, col("__side__"), col("__rp__"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      (last(col("__rp__"), ignoreNulls = true).over(w),
        if (needTime) last(col("__rt__"), ignoreNulls = true).over(w)
        else lit(null))
    }
    def within(gap: Column): Column = tolerance match {
      case Some(tol) => gap <= expr(tol)
      case None => lit(true)
    }

    val matched: DataFrame = direction match {
      case "backward" =>
        val (bp, bt) = running(desc = false)
        val df = tagged.withColumn("__matched__", bp)
        if (needTime)
          df.withColumn("__matched__",
            when(within(col("__t__") - bt), col("__matched__")))
        else df
      case "forward" =>
        val (fp, ft) = running(desc = true)
        val df = tagged.withColumn("__matched__", fp)
        if (needTime)
          df.withColumn("__matched__",
            when(within(ft - col("__t__")), col("__matched__")))
        else df
      case "nearest" =>
        val (bp, bt) = running(desc = false)
        val (fp, ft) = running(desc = true)
        tagged
          .withColumn("__bok__", bt.isNotNull && within(col("__t__") - bt))
          .withColumn("__fok__", ft.isNotNull && within(ft - col("__t__")))
          .withColumn("__bgap__", col("__t__") - bt)
          .withColumn("__fgap__", ft - col("__t__"))
          .withColumn("__bp__", bp).withColumn("__fp__", fp)
          .withColumn("__matched__",
            when(col("__bok__") && col("__fok__"),
              when(col("__bgap__") <= col("__fgap__"), col("__bp__"))
                .otherwise(col("__fp__")))
              .when(col("__bok__"), col("__bp__"))
              .when(col("__fok__"), col("__fp__")))
    }
    matched
      .filter(col("__side__") === 1 && col("__matched__").isNotNull)
      .select(left.columns.map(c => col(s"__lp__.`$c`")) ++
        rightPayload.map(c => col(s"__matched__.`$c`").as(s"asof_$c")): _*)
  }
}
