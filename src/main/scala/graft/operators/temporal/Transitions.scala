package graft.operators.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order event-transition (Markov) matrix — P(next event type |
  * current event type) across per-user event sequences, the
  * next-action / clickstream-flow query of product analytics.
  *
  * Semantics: each user's events are ordered by (ts, tieCol); every
  * adjacent pair contributes one (src, dst) transition; the matrix row
  * for src normalizes counts into probabilities. A user's last event
  * has no successor and contributes nothing (standard convention —
  * no artificial terminal state; add one upstream if wanted).
  *
  * Scale shape: ONE user-keyed shuffle for the lead() window (cost
  * linear in a user's own sequence), ONE (src, dst) aggregation with
  * map-side combine whose output is at most |types|² rows, and the
  * normalization is a window over that tiny table. No self-join of
  * events with events (the naive pairing), no collect of a user's
  * history.
  *
  * No reference counterpart; builder-prompt events-analytics extension.
  */
object Transitions {

  /** (src, dst, n long, p double): row-normalized transition counts.
    * `tieCol` breaks equal-timestamp ordering deterministically.
    */
  def matrix(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
             tieCol: Option[String] = None): DataFrame = {
    val order = col(tsCol) +: tieCol.map(col).toSeq
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    df.select(col(typeCol).as("src"), lead(col(typeCol), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("src"))), 6))
  }
}
