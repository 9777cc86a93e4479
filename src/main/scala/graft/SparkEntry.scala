package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the operator inventory; each family lives in
  * its own object under [[graft.queries]]. Every entry with SQL-expressible
  * semantics has a DuckDB oracle in `oracleSql` (same column aliases — the
  * driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** All query specs, in family order. */
  def specs: Seq[QuerySpec] = Rel.specs ++ Funcs.specs ++ Pipeline.specs ++ Scripts.specs

  /** Flagship: the q30 star join executed end-to-end through the Graft DSL
    * script runner on /root/testdata/sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("s2_script_star_join")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
