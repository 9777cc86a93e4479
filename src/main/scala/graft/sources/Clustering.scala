package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data layout for skipping: range clustering and Z-ordering, the write-
  * side half of manifest data skipping (reference capability: Delta's
  * OPTIMIZE ZORDER BY, re-designed — the reference delegates to the Delta
  * jar, absent here).
  *
  * Data skipping only prunes when file min/max ranges are NARROW: randomly
  * laid-out files all span the whole value domain and nothing prunes.
  * `clusterBy` makes single-column ranges disjoint (repartitionByRange +
  * in-file sort). Z-ORDER makes MULTI-column ranges simultaneously narrow:
  * each row maps to a point on a Z-curve (interleaved bits of per-column
  * rank buckets), and range-partitioning on the curve gives every file a
  * contiguous curve segment — a hyper-rectangle-ish region whose
  * projection onto EVERY clustered column is narrow, so a filter on any
  * one of them prunes ~(1 - 1/2^(bits/ncols)) of the files.
  *
  * Scale: one approxQuantile pass computes 255 rank boundaries per column
  * (driver gets ncols×255 doubles — bounded); the Z-value itself is pure
  * codegen'd expressions (array+aggregate HOF bucket lookup, bit
  * shifts — no UDF, no shuffle beyond the final range partition).
  */
object ZOrder {

  private val Bits = 8 // 256 rank buckets per column
  private val Probs: Array[Double] = (1 until (1 << Bits)).map(_ / 256.0).toArray

  /** Rank-bucket id (0..255) for one column, as a codegen'd expression.
    * Numeric/date/timestamp columns bucket by approx-quantile boundaries
    * (a true range id: curve locality follows value order). Other types
    * (strings, …) bucket by hash — equality filters still skip, range
    * filters don't (documented degradation, same trade Delta makes for
    * high-cardinality strings).
    */
  private def bucketExpr(df: DataFrame, c: String): Column = {
    val dt = df.schema(c).dataType
    val numericView: Option[Column] = dt match {
      case _: NumericType => Some(col(c).cast("double"))
      case _: DateType => Some(col(c).cast("int").cast("double"))
      case _: TimestampType | _: TimestampNTZType => Some(col(c).cast("long").cast("double"))
      case _ => None
    }
    numericView match {
      case Some(v) =>
        // distinct boundary values only — heavy skew collapses quantiles
        // into duplicates, and duplicate boundaries waste bucket ids
        val cuts = df.select(v.as("__zv__")).na.drop
          .stat.approxQuantile("__zv__", Probs, 0.001).distinct.sorted
        if (cuts.isEmpty) lit(0)
        else {
          // bucket = #boundaries <= value (codegen'd HOF over a literal
          // array; 255 comparisons/row, no shuffle); nulls sort first
          val arr = array(cuts.map(lit(_)): _*)
          when(v.isNull, lit(0)).otherwise(
            size(filter(arr, b => v >= b)))
        }
      case None =>
        pmod(xxhash64(col(c)), lit(1 << Bits)).cast("int")
    }
  }

  /** The Z-value column: per-column 8-bit rank buckets, bits interleaved
    * (column c contributes bit i to position i*ncols+c). Fits a long for
    * up to 8 columns/64 bits.
    */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty && cols.size <= 8,
      s"zorder supports 1..8 columns, got ${cols.size}")
    cols.foreach(c => require(df.columns.contains(c),
      s"zorder column '$c' not in ${df.columns.mkString(", ")}"))
    val n = cols.size
    val buckets = cols.map(c => bucketExpr(df, c).cast("long"))
    (0 until Bits).foldLeft(lit(0L).cast("long")) { (acc, i) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (b, c)) =>
        a.bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + c))
      }
    }
  }

  /** Rewrite `df` into `numFiles` files of contiguous Z-curve segments. */
  def layout(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    val z = "__zorder__"
    require(!df.columns.contains(z), s"'$z' is a reserved column name")
    df.withColumn(z, zvalue(df, cols))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(z)
      .drop(z)
  }

  /** Lexicographic range clustering (the single-column / prefix-filter
    * layout): disjoint per-file ranges on `cols`, sorted within files so
    * parquet row-group stats nest inside the file stats.
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    df.repartitionByRange(numFiles, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
  }
}
