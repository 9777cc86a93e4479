package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gated query: a Spark-side DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same parquet
  * tables. Column names/aliases MUST match between the two; the driver sorts
  * columns by name before hashing.
  *
  * Determinism rules used throughout the inventory:
  *  - every result carries a total ORDER BY on non-null key columns;
  *  - double SUMs are rounded to whole units and cast to long (cross-engine
  *    fp accumulation order differs; per-row arithmetic is IEEE-identical);
  *  - AVG/STDDEV are rounded to a few decimals;
  *  - rank/top-k windows always tie-break on a unique id.
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def sql(name: String, spark: (SparkSession, String) => DataFrame, oracle: String): QuerySpec =
    QuerySpec(name, spark, Some(oracle))
  def noOracle(name: String, spark: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, spark, None)
}
