package graft.operators.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: left points `p` against right intervals
  * `[lo, hi]` with `lo ≤ p ≤ hi`. Spark plans a bare BETWEEN join
  * condition as BroadcastNestedLoopJoin — O(|L|·|R|) compared pairs.
  *
  * Bin optimization (the same idea behind Databricks' RANGE_JOIN hint):
  * pick a bin width, bin each point once (`floor(p/w)`), explode each
  * interval into the bins it overlaps, EQUI-join on the bin id, then apply
  * the exact BETWEEN filter. Each (point, interval) pair meets in exactly
  * one bin (the point's), so no dedup is needed. At 100 TB: shuffle is
  * hash-partitioned on the bin key, compared pairs collapse from |L|·|R|
  * to pairs sharing a bin — pick `binWidth` near the median interval
  * length so intervals explode into O(1) bins.
  */
object RangeJoin {

  def join(left: DataFrame, points: String, right: DataFrame,
           lo: String, hi: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left.withColumn("__bin__", floor(col(points) / binWidth))
    val r = right.withColumn("__bin__", explode(sequence(
      floor(col(lo) / binWidth), floor(col(hi) / binWidth))))
    l.join(r, "__bin__")
      .filter(col(points) >= col(lo) && col(points) <= col(hi))
      .drop("__bin__")
  }
}
