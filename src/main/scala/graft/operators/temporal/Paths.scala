package graft.operators.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top event paths — the Sankey / user-flow query: each user's first
  * `k` event types in time order joined into a path string, counted
  * across users, top `topN` paths returned.
  *
  * Scale shape: the `row_number ≤ k` filter runs BEFORE any per-user
  * collection, so a user with 10⁹ events contributes k rows to the
  * path build, not a collect_list of their history (the window itself
  * is one user-keyed sort — inherent to "first k in order"); the path
  * aggregation shuffles at most k·|users| rows into |distinct paths|
  * groups with map-side combine, and the final top-N is Spark's
  * two-phase TakeOrdered, never a global sort.
  *
  * No reference counterpart; builder-prompt events-analytics extension.
  */
object Paths {

  /** (path string, n_users long), ties broken by path asc. `tieCol`
    * disambiguates equal timestamps.
    */
  def top(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
          k: Int, topN: Int, sep: String = ">",
          tieCol: Option[String] = None): DataFrame = {
    require(k >= 1 && topN >= 1, "k and topN must be >= 1")
    val order = col(tsCol) +: tieCol.map(col).toSeq
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    df.select(col(userCol).as("u"), col(typeCol).as("et"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= k)
      .groupBy(col("u"))
      // k-bounded per-user array; struct sort keeps (rn, type) pairing
      .agg(array_join(transform(array_sort(collect_list(struct(col("rn"), col("et")))),
        s => s.getField("et")), sep).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path")).limit(topN)
  }
}
