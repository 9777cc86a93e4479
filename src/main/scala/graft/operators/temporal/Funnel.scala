package graft.operators.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream — "of the users who did
  * step 1, how many went on to do step 2 after it, then step 3 after
  * that" (the standard product-analytics conversion query; see the
  * windowFunnel/sequenceMatch family in OLAP engines).
  *
  * Semantics: step 1's time is the user's EARLIEST step-1 event; step
  * i+1's time is the earliest step-i+1 event STRICTLY AFTER step i's
  * time (ties at the same timestamp do not advance the funnel — an
  * event cannot complete two steps at once); with `maxSpan` set, every
  * later step must also land within `maxSpan` seconds of step 1 (the
  * "conversion window"). A user's `depth` is the number of completed
  * steps.
  *
  * Scale shape: ONE aggregation per step, each an equi-shuffle on the
  * user key — step i+1 filters its candidate events against the
  * broadcast-joinable per-user step-i times and takes `min(ts)` with
  * map-side partial aggregation. No collect_list of a user's history,
  * no per-user state: a hot user with 10⁹ events costs one combinable
  * min per step. k-1 user-keyed joins for a k-step funnel — all on the
  * same key, so a co-partitioned plan reuses one exchange per side.
  * Every step is relational (min/filter/join), so Catalyst sees
  * everything and the DuckDB oracle replays it verbatim.
  *
  * No reference counterpart; beyond-reference events-analytics surface
  * per the builder prompt.
  */
object Funnel {

  /** Per-user funnel: (userCol, t1..tk timestamp, depth int). Users with
    * no step-1 event produce no row. `steps` are matched against
    * `typeCol` equality.
    */
  def analyze(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
              steps: Seq[String], maxSpanSeconds: Long = 0L): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length,
      s"funnel steps must be distinct, got $steps")
    val base = df.select(col(userCol), col(tsCol).cast("timestamp").as("__ts__"),
      col(typeCol).as("__et__"))
    def stepEvents(s: String): DataFrame =
      base.filter(col("__et__") === lit(s)).drop("__et__")
    var acc: DataFrame = stepEvents(steps.head)
      .groupBy(col(userCol)).agg(min(col("__ts__")).as("t1"))
    for (i <- 2 to steps.length) {
      val ev = stepEvents(steps(i - 1))
        .select(col(userCol).as("__u__"), col("__ts__"))
      // interval arithmetic, not epoch casts: Spark's timestamp->long
      // truncates to seconds while DuckDB's EPOCH keeps micros — exact
      // timestamp comparison is engine-identical
      val within: Column =
        if (maxSpanSeconds > 0)
          col("__ts__") <= col("t1") + expr(s"INTERVAL $maxSpanSeconds SECOND")
        else lit(true)
      // qualification lives in the JOIN condition: a user whose step-i
      // events all fail it must still keep their row (t_i = null), which
      // a post-join where would drop
      val next = acc.join(ev,
          acc(userCol) === col("__u__") &&
            col("__ts__") > col(s"t${i - 1}") && within, "left")
        .groupBy(acc.columns.map(acc(_)): _*)
        .agg(min(col("__ts__")).as(s"t$i"))
      acc = next
    }
    val depth = steps.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("depth", depth)
  }

  /** Conversion summary: one row per step — (step int, name, n_users,
    * conversion = n_users/step-1 users rounded 6dp).
    */
  def summary(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
              steps: Seq[String], maxSpanSeconds: Long = 0L): DataFrame = {
    val per = analyze(df, userCol, tsCol, typeCol, steps, maxSpanSeconds)
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = steps.indices.map(i =>
      // coalesce: an EMPTY funnel (no step-1 users at all) aggregates to
      // null sums, which must read as 0 rather than NPE
      coalesce(sum(when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L)), lit(0L))
        .as(s"n${i + 1}"))
    val counts = per.agg(aggs.head, aggs.tail: _*).head()
    val n1 = math.max(counts.getLong(0), 1L)
    steps.indices.map { i =>
      val n = counts.getLong(i)
      // half-up, not rint: same cross-engine rounding discipline as the
      // unigram sampler (DuckDB ROUND is half-away; ratios are >= 0)
      (i + 1, steps(i), n, math.floor(n.toDouble / n1 * 1e6 + 0.5) / 1e6)
    }.toDF("step", "name", "n_users", "conversion")
  }
}
