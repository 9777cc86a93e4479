package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end JDBC subtree pushdown against embedded Derby (the JDBC
  * driver that ships with Spark's jars): result parity with the
  * non-pushed plan AND plan-shape assertions that the join/aggregate
  * actually moved into the database.
  */
class JdbcPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val url: String = {
    val dir = Files.createTempDirectory("graft_derby").toFile
    dir.delete() // derby wants to create the directory itself
    val u = s"jdbc:derby:${dir.getAbsolutePath};create=true"
    val orders = spark.range(0, 100).select(
      col("id").as("o_id"),
      (col("id") % 7).as("cust"),
      (col("id") % 3).cast("int").as("status"),
      (col("id") * 1.5).as("amount"))
    orders.write.format("jdbc").option("url", u)
      .option("dbtable", "ORDERS").save()
    val custs = spark.range(0, 7).select(
      col("id").as("c_id"),
      concat(lit("cust_"), col("id")).as("name"))
    custs.write.format("jdbc").option("url", u).option("dbtable", "CUSTS")
      .option("createTableColumnTypes", "name VARCHAR(32)").save()
    u
  }

  private def jdbcTable(table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  /** Collect the same result with the rule disabled, for parity checks. */
  private def withoutPushdown[A](body: => A): A = {
    spark.conf.set(JdbcPushdown.FLAG, "false")
    try body finally spark.conf.unset(JdbcPushdown.FLAG)
  }

  private def jdbcScans(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collectLeaves()
      .count(_.toString.contains("JDBCRelation"))

  private def key(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("same-connection join + filter collapses to one pushed query") {
    def q = jdbcTable("ORDERS").join(jdbcTable("CUSTS"),
        col("cust") === col("c_id"))
      .filter(col("amount") > 30.0 && col("name").startsWith("cust"))
      .select("o_id", "name", "amount")
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect { case j: Join => j }.isEmpty, opt)
    assert(jdbcScans(q) == 1, opt)
    assert(key(q) == withoutPushdown(key(q)))
    assert(q.count() > 0)
  }

  test("aggregate over a join runs in the database, AVG/SUM types survive") {
    def q = jdbcTable("ORDERS").join(jdbcTable("CUSTS"),
        col("cust") === col("c_id"))
      .groupBy("name")
      .agg(count(lit(1)).as("n"), sum("amount").as("total"),
        avg("status").as("avg_status"), max("o_id").as("max_id"))
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect { case a: Aggregate => a }.isEmpty, opt)
    assert(opt.collect { case j: Join => j }.isEmpty, opt)
    // Derby AVG(INT) truncates to INT — the compiled SQL must cast first;
    // parity with Spark-side aggregation proves it did
    assert(key(q) == withoutPushdown(key(q)))
    assert(q.schema("avg_status").dataType.typeName == "double")
  }

  test("global aggregate without grouping pushes as one-row query") {
    def q = jdbcTable("ORDERS").agg(
      sum("o_id").as("s"), count(lit(1)).as("n"), min("amount").as("lo"))
    assert(q.queryExecution.optimizedPlan
      .collect { case a: Aggregate => a }.isEmpty)
    assert(key(q) == withoutPushdown(key(q)))
  }

  test("top-k pushes ORDER BY with pinned NULLS placement + FETCH FIRST") {
    def q = jdbcTable("ORDERS").orderBy(desc("amount")).limit(5)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.toLowerCase.contains("globallimit"), opt)
    assert(jdbcScans(q) == 1)
    assert(key(q) == withoutPushdown(key(q)))
    assert(q.count() == 5)
  }

  test("aggregate over UNION ALL of two jdbc tables pushes as one query") {
    def q = jdbcTable("ORDERS").select(col("cust").as("g"))
      .union(jdbcTable("CUSTS").select(col("c_id").as("g")))
      .groupBy("g").agg(count(lit(1)).as("n"))
    val opt = q.queryExecution.optimizedPlan
    assert(opt.collect { case a: Aggregate => a }.isEmpty, opt)
    assert(jdbcScans(q) == 1, opt)
    assert(key(q) == withoutPushdown(key(q)))
  }

  test("jdbc x parquet join is NOT rewritten (different sources)") {
    val local = spark.range(0, 7).select(col("id").as("c_id"))
    val q = jdbcTable("CUSTS").join(local, "c_id")
    assert(q.queryExecution.optimizedPlan.collect { case j: Join => j }.nonEmpty)
    assert(q.count() == 7)
  }

  test("unsupported expression in the subtree leaves the plan untouched") {
    val weird = udf((s: String) => s.reverse)
    val q = jdbcTable("ORDERS").join(jdbcTable("CUSTS"),
        col("cust") === col("c_id"))
      .filter(weird(col("name")) =!= "x")
      .groupBy("name").agg(count(lit(1)).as("n"))
    // the join below the UDF filter may still collapse, but nothing breaks
    assert(q.collect().map(_.getLong(1)).sum == 100L)
  }

  test("flag off disables the rewrite") {
    withoutPushdown {
      val q = jdbcTable("ORDERS").join(jdbcTable("CUSTS"),
        col("cust") === col("c_id"))
      assert(q.queryExecution.optimizedPlan
        .collect { case j: Join => j }.nonEmpty)
    }
  }

  test("DSL: connect + load + select joins push into the database") {
    val script =
      s"""connect jdbc where url="$url" as dby;
         |load jdbc.`dby.ORDERS` as o;
         |load jdbc.`dby.CUSTS` as c;
         |select cust, count(*) as n from o, c
         |  where o.cust = c.c_id group by cust as joined;""".stripMargin
    val df = graft.dsl.ScriptRunner.runToDF(script, spark)
    assert(df.queryExecution.optimizedPlan
      .collect { case a: Aggregate => a }.isEmpty, df.queryExecution.optimizedPlan)
    assert(df.count() == 7)
    assert(df.collect().map(_.getLong(1)).sum == 100L)
  }
}
