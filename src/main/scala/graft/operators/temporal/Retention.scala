package graft.operators.temporal

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention analysis — "of the users first seen in period X,
  * what fraction were active again in period X+k" (the product-
  * analytics retention triangle).
  *
  * Semantics: a user's cohort is the period (floor(ts / periodSec)) of
  * their FIRST event; for every (cohort, offset) cell the count is the
  * number of DISTINCT cohort users active in period cohort+offset, and
  * `retention` divides by the cohort's size (its offset-0 count, which
  * by construction counts every cohort member). Activity is any event;
  * callers filter event types upstream if they want "retained = did X".
  *
  * Scale shape: (1) distinct (user, period) pairs — one shuffle with
  * map-side partial distinct, the only input-sized exchange; (2) the
  * per-user first period via a window min over the user key (re-uses
  * the same hash partitioning when the distinct landed on user+period —
  * Spark re-shuffles on user alone; both are user-keyed, no skew beyond
  * a user's own period count, which is bounded by span/period); (3) the
  * (cohort, offset) cell counts are a plain count(*) because (1) made
  * (user, period) unique — no count-distinct rebuild; (4) cohort sizes
  * come from a #cells-sized window, not a re-scan.
  *
  * No reference counterpart; builder-prompt events-analytics extension.
  */
object Retention {

  /** Retention matrix: (cohort long, offset long, n_users long,
    * retention double). `tsCol` must be a timestamp; periods are
    * epoch-floored (UTC), cohort/offset are period indices.
    */
  def matrix(df: DataFrame, userCol: String, tsCol: String,
             periodSec: Long): DataFrame = {
    require(periodSec > 0, "periodSec must be positive")
    // integer floor-division on micros: exact at any period that is a
    // whole number of seconds (no double round-trip at period edges)
    val per = expr(s"unix_micros(${tsCol}) div ${periodSec * 1000000L}")
    val active = df.select(col(userCol).as("u"), per.as("per")).distinct()
    val cohort = min(col("per")).over(Window.partitionBy(col("u")))
    val cells = active
      .withColumn("cohort", cohort)
      .groupBy(col("cohort"), (col("per") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
    val size = max(when(col("offset") === 0, col("n_users")))
      .over(Window.partitionBy(col("cohort")))
    cells.withColumn("retention",
      round(col("n_users").cast("double") / size, 6))
  }
}
