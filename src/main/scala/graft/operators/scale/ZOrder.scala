package graft.operators.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping — the
  * SURVEY §7 "optional stretch" item. Writing files ordered by a Z-value
  * over k columns makes every file's per-column min/max footer range
  * narrow in ALL k dimensions at once, so a scan with predicates on any
  * subset of those columns skips most row groups — the layout lever behind
  * Delta/Iceberg OPTIMIZE ZORDER, re-expressed as plain Spark.
  *
  * Design: each column is bucketized to `bits` quantile buckets via ONE
  * approx_percentile pass (sketch-sized aggregate, no global sort — a
  * rank-based z-curve needs only relative order, and quantile buckets make
  * it robust to skew); bucket indices are bit-interleaved into the
  * Z-value; `repartitionByRange` on the Z-value + `sortWithinPartitions`
  * lays files out along the curve. Numeric/date/timestamp columns only
  * (strings have no order-preserving numeric embedding worth the cost —
  * lead with them via partitionBy instead).
  */
object ZOrder {

  /** Quantile boundaries per column: `2^bits − 1` cut points from one
    * combined approx_percentile aggregation.
    */
  private def bounds(df: DataFrame, cols: Seq[String], bits: Int): Map[String, Array[Double]] = {
    val nb = (1 << bits) - 1
    val ps = (1 to nb).map(i => i.toDouble / (nb + 1))
    val aggs = cols.map { c =>
      expr(s"approx_percentile(cast(`$c` as double), array(${ps.mkString(",")}), 10000)")
        .cast("array<double>").as(c)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      c -> Option(row.getAs[scala.collection.Seq[Double]](i)).map(_.toArray)
        .getOrElse(Array.empty[Double])
    }.toMap
  }

  /** Add a `__z__` column: bit-interleaved quantile-bucket indices. */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 8): DataFrame = {
    require(cols.nonEmpty && cols.size <= 7, "zorder needs 1..7 columns")
    require(bits >= 1 && bits <= 8, "bits must be in 1..8")
    val bs = bounds(df, cols, bits)
    val bc = df.sparkSession.sparkContext.broadcast(cols.map(bs).toArray)
    val k = cols.size
    val zUdf = udf { (vals: Seq[java.lang.Double]) =>
      val all = bc.value
      var z = 0L
      var bit = 0
      while (bit < bits) {
        var c = 0
        while (c < k) {
          val v = vals(c)
          val bucket =
            if (v == null) 0
            else {
              val b = all(c)
              val idx = java.util.Arrays.binarySearch(b, v)
              if (idx >= 0) idx + 1 else -(idx + 1)
            }
          if (((bucket >> bit) & 1) == 1) z |= 1L << (bit.toLong * k + c)
          c += 1
        }
        bit += 1
      }
      z
    }
    df.withColumn("__z__", zUdf(array(cols.map(c => col(c).cast("double")): _*)))
  }

  /** Repartition + sort the frame along the Z-curve over `cols` into
    * `nOut` range partitions (→ output files), dropping the helper column.
    */
  def cluster(df: DataFrame, cols: Seq[String], nOut: Int, bits: Int = 8): DataFrame =
    withZValue(df, cols, bits)
      .repartitionByRange(nOut, col("__z__"))
      .sortWithinPartitions("__z__")
      .drop("__z__")
}
