package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver-generated TPC-H-ish fixtures.
  *
  * Scale notes (100 TB design): every reader here is a plain parquet scan —
  * Catalyst pushes filters/column pruning into the scan, so downstream
  * operators must keep predicates declarative (no opaque closures before the
  * first filter). Dimension tables (`region`, `nation`, `supplier`, `part`)
  * stay small at any SF and are always broadcast-joined.
  */
object Tables {
  val fact: Seq[String] = Seq("lineitem", "orders", "events", "documents", "embeddings")
  val dims: Seq[String] = Seq("region", "nation", "customer", "supplier", "part")
  val all: Seq[String]  = dims ++ fact

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** `events.parquet` carries a TIMESTAMP(NANOS) column, which Spark's
    * parquet reader only accepts as a long when
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by [[graft.Verify]],
    * [[graft.Bench]] and [[graft.GraftSession]]). We re-expose `ts` as a
    * micros-precision timestamp (truncating division, matching the DuckDB
    * oracle's `epoch_ns(ts)//1000`).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(dir, name))
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every fixture table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
