package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver-generated TPC-H-ish fixtures.
  *
  * Scale notes (100 TB design): every reader here is a plain parquet scan —
  * Catalyst pushes filters/column pruning into the scan, so downstream
  * operators must keep predicates declarative (no opaque closures before the
  * first filter). Only `region` (5 rows) and `nation` (25 rows) are
  * constant-size and safe to broadcast unconditionally; `customer`,
  * `supplier` and `part` grow linearly with SF, so joins against them rely
  * on AQE's size-based broadcast decision rather than an explicit hint.
  */
object Tables {
  val fact: Seq[String] = Seq("lineitem", "orders", "events", "documents", "embeddings")
  val dims: Seq[String] = Seq("region", "nation", "customer", "supplier", "part")
  val all: Seq[String]  = dims ++ fact

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** `events.parquet` carries a TIMESTAMP(NANOS) column, which Spark's
    * parquet reader only accepts as a long when
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    * [[graft.GraftSession]]). We re-expose `ts` as a micros-precision
    * timestamp using floor division (DuckDB's `epoch_ns(ts)//1000` floors,
    * and `div` truncates toward zero, so the two diverge on pre-1970
    * nanos values). Fails loudly on an unexpected `ts` type so a fixture
    * change can't silently skip the rewrite.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(dir, name))
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(CASE WHEN ts % 1000 < 0 THEN ts div 1000 - 1 ELSE ts div 1000 END)"))
      case _: org.apache.spark.sql.types.TimestampType => df
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // timestamp[us] with isAdjustedToUTC=false: the session runs in UTC
        // (GraftSession), so NTZ→TZ cast preserves the wall-clock instant and
        // matches DuckDB's naive TIMESTAMP read of the same file.
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unexpected type $other; expected LongType (nanosAsLong), TimestampType, or TimestampNTZType")
    }
  }

  /** Register every fixture table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
