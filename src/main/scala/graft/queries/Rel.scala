package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator inventory (SURVEY.md §2.3): the Spark SQL surface the
  * reference exposes through its `select` statement
  * (reference: streamingpro-core/.../dsl/adaptor/SelectAdaptor.scala:70 —
  * the whole body goes to `sparkSession.sql`). Re-expressed here Spark-first
  * with the DataFrame API; each query has a DuckDB oracle.
  *
  * Scale notes: dimension joins broadcast explicitly; fact-fact joins shuffle
  * on join keys and rely on AQE; all filters/projections stay declarative so
  * they reach the parquet scan (verified via explain in BenchSpec).
  */
object Rel {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val specs: Seq[QuerySpec] = Seq(

    // ---- aggregation: partial+final hash agg over a pushed-down filter ----
    QuerySpec.sql("q1_agg", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          // fixed-decimal data is summed via DECIMAL (exact in both engines),
          // then cast to double — bit-identical cross-engine, no rounding.
          sum($"l_quantity").cast("long").as("sum_qty"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base"),
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(18,4)")).cast("double").as("sum_disc"),
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).cast("decimal(18,6)")).cast("double").as("sum_charge"),
          (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
          (sum($"l_extendedprice".cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_price"),
          (sum($"l_discount".cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | SUM(l_quantity) / COUNT(*) AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        | CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        | COUNT(*) AS cnt
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // ---- projection + filter; predicates and pruning reach the scan ----
    QuerySpec.sql("q2_filter_project", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" >= lit("2000-01-01") && $"l_shipdate" < lit("2000-04-01") && $"l_discount" > 0.05)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | l_extendedprice * (1 - l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2000-04-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // ---- 3-way inner join (fact-fact shuffle join + dim join) ----
    QuerySpec.sql("q3_join_inner", (s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      // customer grows with SF (SF*150k rows) — no explicit broadcast hint;
      // AQE picks broadcast when the dim is actually small enough.
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(18,4)")).cast("double").as("revenue"),
          countDistinct($"o_orderkey").as("n_orders"),
          count(lit(1)).as("n_lines"))
        .orderBy($"c_mktsegment")
    },
      """SELECT c_mktsegment,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | COUNT(DISTINCT o_orderkey) AS n_orders,
        | COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // ---- left outer join with extra ON-clause predicate ----
    QuerySpec.sql("q4_join_left", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      o.join(l, $"o_orderkey" === $"l_orderkey" && $"l_quantity" > 45, "left")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"), count($"l_orderkey").as("n_matched"))
        .orderBy($"o_orderstatus")
    },
      """SELECT o_orderstatus, COUNT(*) AS n_rows, COUNT(l_orderkey) AS n_matched
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey AND l_quantity > 45
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // ---- right outer join ----
    QuerySpec.sql("q5_join_right", (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter($"l_returnflag" === "R")
      l.join(o, $"l_orderkey" === $"o_orderkey", "right")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_rows"), count($"l_orderkey").as("n_returned"))
        .orderBy($"o_orderpriority")
    },
      """SELECT o_orderpriority, COUNT(*) AS n_rows, COUNT(l_orderkey) AS n_returned
        |FROM (SELECT * FROM lineitem WHERE l_returnflag = 'R') l
        |RIGHT JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // ---- full outer join ----
    QuerySpec.sql("q6_join_full", (s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter($"o_totalprice" > 300000.0)
      c.join(o, $"c_custkey" === $"o_custkey", "full")
        .groupBy(coalesce($"c_nationkey", lit(-1)).as("nk"))
        .agg(countDistinct($"c_custkey").as("n_cust"), count($"o_orderkey").as("n_big_orders"))
        .orderBy($"nk")
    },
      """SELECT COALESCE(c_nationkey, -1) AS nk,
        | COUNT(DISTINCT c_custkey) AS n_cust, COUNT(o_orderkey) AS n_big_orders
        |FROM customer FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
        |ON c_custkey = o_custkey
        |GROUP BY COALESCE(c_nationkey, -1) ORDER BY nk""".stripMargin),

    // ---- left semi join (EXISTS) ----
    QuerySpec.sql("q7_join_semi", (s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
      c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin),

    // ---- left anti join (NOT EXISTS) ----
    QuerySpec.sql("q8_join_anti", (s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_nationkey")
        .orderBy($"c_custkey")
    },
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin),

    // ---- cross join (small dims only; never on facts) ----
    QuerySpec.sql("q9_join_cross", (s, dir) => {
      import s.implicits._
      val r = t(s, dir, "region").select($"r_name")
      val n = t(s, dir, "nation").select($"n_name")
      r.crossJoin(n).orderBy($"r_name", $"n_name")
    },
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin),

    // ---- distinct aggregation ----
    QuerySpec.sql("q10_agg_distinct", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(countDistinct($"o_custkey").as("u_cust"),
          countDistinct($"o_orderstatus").as("u_status"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    },
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS u_cust,
        | COUNT(DISTINCT o_orderstatus) AS u_status, COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // ---- GROUPING SETS (SQL surface, like the reference's select body) ----
    QuerySpec.sql("q11_grouping_sets", (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
          | COUNT(*) AS n, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY rf, ls""".stripMargin)
    },
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        | COUNT(*) AS n, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY rf, ls""".stripMargin),

    // ---- ROLLUP ----
    QuerySpec.sql("q12_rollup", (s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .rollup($"c_mktsegment")
        .agg(count(lit(1)).as("n"),
          (sum($"c_acctbal".cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_bal"))
        .select(coalesce($"c_mktsegment", lit("ALL")).as("seg"), $"n", $"avg_bal")
        .orderBy($"seg")
    },
      """SELECT COALESCE(c_mktsegment, 'ALL') AS seg, COUNT(*) AS n,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
        |FROM customer GROUP BY ROLLUP (c_mktsegment) ORDER BY seg""".stripMargin),

    // ---- CUBE ----
    QuerySpec.sql("q13_cube", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("rf"),
          coalesce($"l_linestatus", lit("ALL")).as("ls"), $"n")
        .orderBy($"rf", $"ls")
    },
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls, COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY rf, ls""".stripMargin),

    // ---- ranking window functions, unique tie-break ----
    QuerySpec.sql("q14_window_rank", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal".desc, $"c_custkey")
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(w))
        .withColumn("drk", dense_rank().over(w))
        .filter($"rn" <= 5)
        .select($"c_mktsegment", $"rn", $"rk", $"drk", $"c_custkey", $"c_acctbal")
        .orderBy($"c_mktsegment", $"rn")
    },
      """SELECT c_mktsegment, rn, rk, drk, c_custkey, c_acctbal FROM (
        | SELECT c_mktsegment, c_custkey, c_acctbal,
        |  ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
        |  RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rk,
        |  DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drk
        | FROM customer) WHERE rn <= 5
        |ORDER BY c_mktsegment, rn""".stripMargin),

    // ---- running aggregate with explicit ROWS frame ----
    QuerySpec.sql("q15_window_running", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .filter($"o_custkey" < 50)
        .withColumn("running_spend", sum($"o_totalprice".cast("decimal(18,2)")).over(w).cast("double"))
        .withColumn("order_seq", row_number().over(
          Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")))
        .select($"o_custkey", $"order_seq", $"o_orderkey", $"running_spend")
        .orderBy($"o_custkey", $"order_seq")
    },
      """SELECT o_custkey, order_seq, o_orderkey, running_spend FROM (
        | SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
        | FROM orders WHERE o_custkey < 50)
        |ORDER BY o_custkey, order_seq""".stripMargin),

    // ---- lead/lag analytics ----
    QuerySpec.sql("q16_window_leadlag", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      t(s, dir, "events")
        .filter($"user_id" < 10)
        .withColumn("prev_val", lag($"value", 1).over(w))
        .withColumn("next_val", lead($"value", 1).over(w))
        .withColumn("delta", $"value" - coalesce(lag($"value", 1).over(w), lit(0.0)))
        .select($"user_id", $"event_id", $"value", $"prev_val", $"next_val", $"delta")
        .orderBy($"user_id", $"event_id")
    },
      """SELECT user_id, event_id, value,
        | LAG(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_val,
        | LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS next_val,
        | value - COALESCE(LAG(value, 1) OVER (PARTITION BY user_id ORDER BY event_id), 0) AS delta
        |FROM events WHERE user_id < 10
        |ORDER BY user_id, event_id""".stripMargin),

    // ---- global sort + limit (TakeOrderedAndProject) ----
    QuerySpec.sql("q17_topn", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .limit(20)
    },
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin),

    // ---- UNION ALL ----
    QuerySpec.sql("q18_union", (s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer").select($"c_nationkey".as("nk"))
      val sup = t(s, dir, "supplier").select($"s_nationkey".as("nk"))
      c.unionAll(sup).groupBy($"nk").agg(count(lit(1)).as("n")).orderBy($"nk")
    },
      """SELECT nk, COUNT(*) AS n FROM (
        | SELECT c_nationkey AS nk FROM customer
        | UNION ALL SELECT s_nationkey AS nk FROM supplier)
        |GROUP BY nk ORDER BY nk""".stripMargin),

    // ---- INTERSECT ----
    QuerySpec.sql("q19_intersect", (s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer").select($"c_nationkey".as("nk"))
      val sup = t(s, dir, "supplier").select($"s_nationkey".as("nk"))
      c.intersect(sup).orderBy($"nk")
    },
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin),

    // ---- EXCEPT ----
    QuerySpec.sql("q20_except", (s, dir) => {
      import s.implicits._
      val n = t(s, dir, "nation").select($"n_nationkey".as("nk"))
      val sup = t(s, dir, "supplier").select($"s_nationkey".as("nk"))
      n.except(sup).orderBy($"nk")
    },
      """SELECT n_nationkey AS nk FROM nation
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin),

    // ---- HAVING ----
    QuerySpec.sql("q21_having", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"), sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("spend"))
        .filter($"n_orders" >= 12)
        .orderBy($"o_custkey")
    },
      """SELECT o_custkey, COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12 ORDER BY o_custkey""".stripMargin),

    // ---- IN subquery ----
    QuerySpec.sql("q22_in_subquery", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT l_orderkey, COUNT(*) AS n_lines, CAST(SUM(l_quantity) AS BIGINT) AS qty
          |FROM lineitem
          |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
          |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)
    },
      """SELECT l_orderkey, COUNT(*) AS n_lines, CAST(SUM(l_quantity) AS BIGINT) AS qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin),

    // ---- scalar subquery ----
    QuerySpec.sql("q23_scalar_subquery", (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(
        """SELECT c_custkey, c_acctbal FROM customer
          |WHERE c_acctbal > 2 * (SELECT AVG(c_acctbal) FROM customer)
          |ORDER BY c_custkey""".stripMargin)
    },
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > 2 * (SELECT AVG(c_acctbal) FROM customer)
        |ORDER BY c_custkey""".stripMargin),

    // ---- correlated EXISTS ----
    QuerySpec.sql("q24_correlated_exists", (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS n FROM orders
          |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // ---- CASE WHEN bucketing ----
    QuerySpec.sql("q25_case_when", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .withColumn("band",
          when($"o_totalprice" < 100000.0, "small")
            .when($"o_totalprice" < 300000.0, "medium")
            .otherwise("large"))
        .groupBy($"band")
        .agg(count(lit(1)).as("n"), (sum($"o_totalprice".cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_price"))
        .orderBy($"band")
    },
      """SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
        |  WHEN o_totalprice < 300000 THEN 'medium' ELSE 'large' END AS band,
        | COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY band""".stripMargin),

    // ---- pivot (reference ET `Pivot`, external/mlsql-ets/Pivot.scala:20-35) ----
    QuerySpec.sql("q26_pivot", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum($"l_quantity").cast("long"))
        .orderBy($"l_linestatus")
    },
      """SELECT l_linestatus,
        | CAST(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS BIGINT) AS "A",
        | CAST(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS BIGINT) AS "N",
        | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS BIGINT) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),

    // ---- SELECT DISTINCT ----
    QuerySpec.sql("q27_distinct", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem").select($"l_returnflag", $"l_linestatus")
        .distinct().orderBy($"l_returnflag", $"l_linestatus")
    },
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // ---- ntile / percent_rank / cume_dist ----
    QuerySpec.sql("q28_window_dist", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
      t(s, dir, "customer")
        .filter($"c_custkey" <= 100)
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .select($"c_mktsegment", $"c_custkey", $"quartile", $"pr", $"cd")
        .orderBy($"c_mktsegment", $"c_custkey")
    },
      """SELECT c_mktsegment, c_custkey,
        | NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile,
        | PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS pr,
        | CUME_DIST() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS cd
        |FROM customer WHERE c_custkey <= 100
        |ORDER BY c_mktsegment, c_custkey""".stripMargin),

    // ---- first/last value over full-partition frame ----
    QuerySpec.sql("q29_window_firstlast", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .filter($"o_custkey" < 30)
        .withColumn("first_order", first($"o_orderkey").over(w))
        .withColumn("last_order", last($"o_orderkey").over(w))
        .select($"o_custkey", $"o_orderkey", $"first_order", $"last_order")
        .orderBy($"o_custkey", $"o_orderkey")
    },
      """SELECT o_custkey, o_orderkey,
        | FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
        | LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
        |FROM orders WHERE o_custkey < 30
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // ---- 5-way star join: broadcast the constant-size dims (region 5 rows,
    //      nation 25 rows); customer scales with SF so AQE decides for it;
    //      shuffle only fact-fact ----
    QuerySpec.sql("q30_star_join", (s, dir) => {
      import s.implicits._
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(c, $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"r_name")
    },
      """SELECT r_name,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin),

    // ---- generators / lateral views: per-row explode with ordinality.
    //      Generator output stays inside whole-stage codegen; no shuffle
    //      until the final sort. ----
    QuerySpec.sql("q31_explode_lateral", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .filter($"doc_id" < 20)
        .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "word")))
        .filter($"pos" < 5)
        .orderBy($"doc_id", $"pos")
    },
      """SELECT doc_id, CAST(u.pos AS INT) AS pos, u.word AS word FROM (
        | SELECT doc_id,
        |  UNNEST([{'pos': i - 1, 'word': w[i]} FOR i IN RANGE(1, LEAST(LEN(w), 5) + 1)]) AS u
        | FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents WHERE doc_id < 20))
        |ORDER BY doc_id, pos""".stripMargin),

    // ---- struct construction and field access ----
    QuerySpec.sql("q32_struct_ops", (s, dir) => {
      import s.implicits._
      t(s, dir, "nation")
        .select(struct($"n_nationkey".as("k"), $"n_name".as("nm")).as("st"), $"n_regionkey")
        .select($"st.k".as("key"), upper($"st.nm").as("uname"), $"n_regionkey")
        .filter($"key" % 3 === 0)
        .orderBy($"key")
    },
      """SELECT k AS key, UPPER(nm) AS uname, n_regionkey FROM (
        | SELECT {'k': n_nationkey, 'nm': n_name} AS st, n_regionkey,
        |        n_nationkey AS k, n_name AS nm
        | FROM nation)
        |WHERE k % 3 = 0 ORDER BY key""".stripMargin),

    // ---- as-of join (no native Spark operator): each click event joined
    //      to the user's latest purchase at-or-before it, via
    //      graft.operators.temporal.AsOfJoin (union + ordered window; one
    //      shuffle, no per-key cartesian). Oracle: DuckDB's native
    //      ASOF JOIN. Right side pre-aggregated to one row per
    //      (user, ts) so the pick is deterministic in both engines. ----
    QuerySpec.sql("q33_asof_join", (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      val purchases = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", $"ts")
        .agg(round(max($"value"), 4).as("purchase_value"))
      graft.operators.temporal.AsOfJoin
        .join(clicks, purchases, Seq("user_id"), "ts", "ts",
          Seq("ts", "purchase_value"))
        .select($"event_id", $"user_id",
          $"asof_ts".as("purchase_ts"), $"asof_purchase_value".as("purchase_value"))
        .orderBy($"event_id")
    },
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |  MAKE_TIMESTAMP(EPOCH_NS(ts) // 1000) AS t FROM events),
        |clicks AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'click'),
        |purchases AS (SELECT user_id, t, ROUND(MAX(value), 4) AS purchase_value
        |  FROM e WHERE event_type = 'purchase' GROUP BY user_id, t)
        |SELECT c.event_id, c.user_id, p.t AS purchase_ts, p.purchase_value
        |FROM clicks c ASOF JOIN purchases p
        |  ON c.user_id = p.user_id AND c.t >= p.t
        |ORDER BY c.event_id""".stripMargin),

    // ---- range (interval) join via bin optimization: overlapping price
    //      bands built from nation keys joined to order totals. The bare
    //      BETWEEN theta-join would plan as BroadcastNestedLoopJoin;
    //      RangeJoin bins both sides and equi-joins (plan-audited in
    //      AsOfJoinSpec/BenchSpec family). Oracle: plain BETWEEN. ----
    QuerySpec.sql("q34_range_join", (s, dir) => {
      import s.implicits._
      val bands = t(s, dir, "nation")
        .filter($"n_nationkey" < 10)
        .select($"n_nationkey".as("band_id"),
          ($"n_nationkey" * 40000.0).as("lo"),
          ($"n_nationkey" * 40000.0 + 60000.0).as("hi"))
      val pts = t(s, dir, "orders").select($"o_orderkey", $"o_totalprice")
      graft.operators.temporal.RangeJoin
        .join(pts, "o_totalprice", bands, "lo", "hi", binWidth = 20000.0)
        .groupBy($"band_id")
        .agg(count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy($"band_id")
    },
      """WITH bands AS (
        | SELECT n_nationkey AS band_id, n_nationkey * 40000.0 AS lo,
        |        n_nationkey * 40000.0 + 60000.0 AS hi
        | FROM nation WHERE n_nationkey < 10)
        |SELECT band_id, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN bands ON o_totalprice BETWEEN lo AND hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin),

    // ---- batch sessionization: gap-based session ids via lag + running
    //      sum (the standard two-window formulation; one shuffle on the
    //      user key, both windows share the partitioning). ----
    QuerySpec.sql("q35_sessionize", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .withColumn("prev_ts", lag($"ts", 1).over(byUser))
        .withColumn("new_session",
          ($"prev_ts".isNull ||
            unix_micros($"ts") - unix_micros($"prev_ts") > 1800L * 1000000).cast("int"))
        .withColumn("session_id", sum($"new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"event_type").as("n_types"))
        .groupBy($"user_id")
        .agg(max($"session_id").cast("long").as("n_sessions"),
          max($"n_events").as("max_session_events"),
          max($"n_types").as("max_session_types"))
        .orderBy($"user_id")
    },
      """WITH t AS (SELECT user_id, event_id, event_type,
        |  MAKE_TIMESTAMP(EPOCH_NS(ts) // 1000) AS ts FROM events),
        |lagged AS (SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM t),
        |flagged AS (SELECT *, CASE WHEN prev_ts IS NULL
        |    OR EPOCH_US(ts) - EPOCH_US(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session FROM lagged),
        |sess AS (SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_id FROM flagged),
        |per_session AS (SELECT user_id, session_id, COUNT(*) AS n_events,
        |    COUNT(DISTINCT event_type) AS n_types FROM sess GROUP BY user_id, session_id)
        |SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
        |  MAX(n_events) AS max_session_events, MAX(n_types) AS max_session_types
        |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin),

    // ---- UNPIVOT (melt): wide metric columns -> (metric, val) rows —
    //      the normalization step feature-wide tables need before
    //      per-metric aggregation; native relational operator in both
    //      engines (no explode/stack UDF detour). ----
    QuerySpec.sql("q37_unpivot", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_orderkey" < 100)
        .select($"o_orderkey",
          $"o_totalprice".cast("double").as("totalprice"),
          $"o_custkey".cast("double").as("custkey"))
        .unpivot(Array($"o_orderkey"), Array($"totalprice", $"custkey"),
          "metric", "val")
        .orderBy($"o_orderkey", $"metric")
    },
      """SELECT o_orderkey, metric, val FROM (
        | SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice,
        |  CAST(o_custkey AS DOUBLE) AS custkey
        | FROM orders WHERE o_orderkey < 100)
        |UNPIVOT (val FOR metric IN (totalprice, custkey))
        |ORDER BY o_orderkey, metric""".stripMargin),

    // ---- bloom-filtered join: build a Bloom filter over the (selective)
    //      build side's key, broadcast it, pre-filter the probe side BEFORE
    //      its shuffle — at 100 TB the probe rows that cannot match never
    //      leave their input partitions. The exact join afterwards removes
    //      bloom false positives, so the result (and this oracle) is
    //      EXACTLY the plain join's. ----
    QuerySpec.sql("q36_bloom_join", (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders").filter($"o_totalprice" > 400000)
        .select($"o_orderkey", $"o_totalprice")
      val lineitem = t(s, dir, "lineitem")
        .select($"l_orderkey".as("o_orderkey"), $"l_quantity", $"l_extendedprice")
      graft.operators.scale.Skew.bloomFilteredJoin(lineitem, orders, "o_orderkey")
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).as("n_lines"),
          sum($"l_quantity").cast("long").as("sum_qty"),
          max($"o_totalprice").as("price"))
        .orderBy($"o_orderkey")
    },
      """SELECT l.l_orderkey AS o_orderkey, COUNT(*) AS n_lines,
        | CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty,
        | MAX(o.o_totalprice) AS price
        |FROM lineitem l JOIN (SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_totalprice > 400000) o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ---- WITH RECURSIVE (Spark 4 UnionLoopExec): BOM-style hierarchy walk
    //      over an implicit binary tree on p_partkey (children of k are 2k,
    //      2k+1 — deterministic, no synthetic table needed). Identical ANSI
    //      text runs on both engines. Each recursion level is one bounded
    //      join; depth caps the loop — the 100 TB shape is levels × an
    //      equi-join on the key, never a cross product. ----
    QuerySpec.sql("q38_recursive_cte", (s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("part")
      s.sql(recursiveCteSql)
    },
      recursiveCteSql),

    // ---- SQL pipe syntax (Spark 4): same logical plan as the classic
    //      form — Catalyst sees identical operators, so pushdown/pruning
    //      are unaffected; this audits the parser surface a script user
    //      can reach through `select`. Oracle is the classic rendering. ----
    QuerySpec.sql("q39_pipe_syntax", (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """FROM lineitem
          ||> WHERE l_quantity >= 30
          ||> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
          ||> AGGREGATE COUNT(*) AS n,
          |    CAST(SUM(CAST(disc_price AS DECIMAL(18,4))) AS DOUBLE) AS revenue
          |   GROUP BY l_returnflag
          ||> ORDER BY l_returnflag""".stripMargin)
    },
      """SELECT l_returnflag, COUNT(*) AS n,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |  AS revenue
        |FROM lineitem WHERE l_quantity >= 30
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- correlated LATERAL subquery (top-2 orders per customer): a
    //      different operator from q31's generator-lateral — Catalyst
    //      plans a LateralJoin whose inner query re-evaluates per outer
    //      row, then decorrelates it into a ranked window; unique-id
    //      tie-break keeps the top-2 deterministic. Dialect-identical
    //      text runs on both engines. ----
    QuerySpec.sql("q40_lateral_subquery", (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(lateralSql)
    },
      lateralSql),

    // ---- GROUP BY ALL / ORDER BY ALL (DuckDB-originated sugar adopted by
    //      Spark 4): every non-aggregate select item groups implicitly.
    //      Dialect-identical text both sides. ----
    QuerySpec.sql("q41_group_by_all", (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(groupByAllSql)
    },
      groupByAllSql),

    // ---- INTERSECT ALL / EXCEPT ALL: bag semantics (multiplicity =
    //      min/difference of counts), vs the q19/q20 set semantics. ----
    QuerySpec.sql("q42_bag_set_ops", (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      s.sql(bagOpsSql)
    },
      bagOpsSql),

    // ---- time-series resample + gap-fill (operators.temporal.Resample):
    //      per-event-type hourly buckets, dense axis between each type's
    //      first and last hour, zero-filled sums (decimal-summed per the
    //      cross-engine float discipline) and counts. The oracle builds
    //      the same dense axis with UNNEST(RANGE(min, max+1, step)). ----
    QuerySpec.sql("q43_resample_gapfill", (s, dir) => {
      import s.implicits._
      graft.operators.temporal.Resample.resample(
          t(s, dir, "events"), Seq("event_type"), "ts", intervalSec = 3600L,
          aggs = Seq(
            "n" -> count(lit(1)),
            "sum_v" -> sum($"value".cast("decimal(18,2)")).cast("double")),
          fill = "zero")
        .withColumn("bucket_us", unix_micros($"bucket"))
        .select($"event_type", $"bucket_us", $"n", $"sum_v")
        .orderBy($"event_type", $"bucket_us")
    },
      """WITH t AS (SELECT event_type, MAKE_TIMESTAMP(EPOCH_NS(ts) // 1000) AS ts, value FROM events),
        |b AS (SELECT event_type,
        |  EPOCH_US(ts) // 3600000000 * 3600000000 AS bucket_us,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        | FROM t GROUP BY 1, 2),
        |k AS (SELECT event_type, MIN(bucket_us) AS mn, MAX(bucket_us) AS mx FROM b GROUP BY 1),
        |axis AS (SELECT event_type, UNNEST(RANGE(mn, mx + 1, 3600000000)) AS bucket_us FROM k)
        |SELECT a.event_type, a.bucket_us,
        |  COALESCE(b.n, 0) AS n, COALESCE(b.sum_v, 0) AS sum_v
        |FROM axis a LEFT JOIN b USING (event_type, bucket_us)
        |ORDER BY event_type, bucket_us""".stripMargin),

    // ---- RANGE-frame window (value-based frame bounds — the window
    //      class q14–q16's ROWS frames don't cover): per-user trailing
    //      one-hour count/sum at every event. Both engines frame on the
    //      numeric micros axis; the sum is decimal-cast so its value is
    //      order-independent (window-frame accumulation order is
    //      engine-private). ----
    QuerySpec.sql("q44_range_frame_window", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-3600L * 1000000L, 0L)
      t(s, dir, "events")
        .withColumn("trailing_n", count(lit(1)).over(w))
        .withColumn("trailing_v",
          sum($"value".cast("decimal(18,2)")).over(w).cast("double"))
        .select($"event_id", $"user_id", $"trailing_n", $"trailing_v")
        .orderBy($"event_id")
    },
      """WITH t AS (SELECT event_id, user_id,
        |  EPOCH_NS(ts) // 1000 AS us, value FROM events)
        |SELECT event_id, user_id,
        | COUNT(*) OVER w AS trailing_n,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_v
        |FROM t
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin),

    // ---- rate-anomaly detection: hourly per-type event counts (dense
    //      zero-filled axis, q43's shape) scored by a trailing-24-bucket
    //      z-score. The variance comes from exact integer window sums
    //      through an EXPLICIT formula mirrored verbatim in the oracle —
    //      engine-private stddev accumulation never enters (see
    //      Resample.anomalyScore). ----
    QuerySpec.sql("q45_rate_anomaly", (s, dir) => {
      import s.implicits._
      val filled = graft.operators.temporal.Resample.resample(
        t(s, dir, "events"), Seq("event_type"), "ts", intervalSec = 3600L,
        aggs = Seq("n" -> count(lit(1))), fill = "zero")
      graft.operators.temporal.Resample
        .anomalyScore(filled, Seq("event_type"), "bucket", "n", lookback = 24)
        .withColumn("bucket_us", unix_micros($"bucket"))
        .select($"event_type", $"bucket_us", $"n", $"z_score")
        .orderBy($"event_type", $"bucket_us")
    },
      """WITH t AS (SELECT event_type, EPOCH_NS(ts) // 1000 AS us FROM events),
        |b AS (SELECT event_type, us // 3600000000 * 3600000000 AS bucket_us,
        |  COUNT(*) AS n FROM t GROUP BY 1, 2),
        |k AS (SELECT event_type, MIN(bucket_us) AS mn, MAX(bucket_us) AS mx FROM b GROUP BY 1),
        |axis AS (SELECT event_type, UNNEST(RANGE(mn, mx + 1, 3600000000)) AS bucket_us FROM k),
        |filled AS (SELECT a.event_type, a.bucket_us, COALESCE(b.n, 0) AS n
        | FROM axis a LEFT JOIN b USING (event_type, bucket_us)),
        |win AS (SELECT event_type, bucket_us, n,
        |  COUNT(*) OVER tw AS c,
        |  SUM(CAST(n AS DOUBLE)) OVER tw AS s,
        |  SUM(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) OVER tw AS ss
        | FROM filled
        | WINDOW tw AS (PARTITION BY event_type ORDER BY bucket_us
        |   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, bucket_us, n,
        | CASE WHEN c >= 2 AND
        |   (ss - CAST(c AS DOUBLE) * (s / CAST(c AS DOUBLE)) * (s / CAST(c AS DOUBLE)))
        |     / (CAST(c AS DOUBLE) - 1) > 0
        |  THEN (CAST(n AS DOUBLE) - s / CAST(c AS DOUBLE)) /
        |   SQRT((ss - CAST(c AS DOUBLE) * (s / CAST(c AS DOUBLE)) * (s / CAST(c AS DOUBLE)))
        |     / (CAST(c AS DOUBLE) - 1))
        | END AS z_score
        |FROM win ORDER BY event_type, bucket_us""".stripMargin),

    // ---- BENCH CANARIES (r20) — mid-weight SHUFFLE-BOUND workloads for
    //      BenchGate's throughput-drift canary set (BenchGate.CanaryIds).
    //      The q/f scan controls are sub-second and read 1.0x on a box
    //      whose sustained-parallel-shuffle throughput degraded 2-3x; these
    //      two are sized (~2-5 s at sf0.1) and shaped (wide exchange, no
    //      broadcast) so that dimension moves them. Their CODE MUST NEVER
    //      CHANGE — a pinned canary only measures the box if the plan is
    //      identical round over round. ----
    // q46: 4x-multiplied lineitem into a ~2.4M-group hash agg (at sf0.1).
    // Grouping on (l_orderkey, l_linenumber, k) defeats map-side combine
    // almost entirely, so nearly every input row crosses the exchange; the
    // outer re-agg shrinks the result to 4 rows for the oracle. (First cut
    // used 8 copies — 12.6 s swept put it in the expensive tail rather
    // than mid-weight; 4 copies lands ~5-6 s.)
    QuerySpec.sql("q46_canary_shuffle", (s, dir) => {
      import s.implicits._
      val m = s.range(4).select($"id".as("k"))
      t(s, dir, "lineitem")
        .crossJoin(m)
        .groupBy($"l_orderkey", $"l_linenumber", $"k")
        .agg(sum($"l_extendedprice".cast("decimal(18,2)")).as("grp_price"),
          count(lit(1)).as("grp_n"))
        .groupBy($"k")
        .agg(count(lit(1)).as("n_groups"),
          sum($"grp_n").as("n_rows"),
          sum($"grp_price").cast("double").as("price_total"))
        .orderBy($"k")
    },
      """WITH m AS (SELECT UNNEST(RANGE(4)) AS k),
        |g AS (SELECT l_orderkey, l_linenumber, k,
        |  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS grp_price,
        |  COUNT(*) AS grp_n
        | FROM lineitem CROSS JOIN m GROUP BY 1, 2, 3)
        |SELECT k, COUNT(*) AS n_groups,
        | CAST(SUM(grp_n) AS BIGINT) AS n_rows,
        | CAST(SUM(grp_price) AS DOUBLE) AS price_total
        |FROM g GROUP BY k ORDER BY k""".stripMargin),

    // q47: 4x-multiplied lineitem |><| 4x-multiplied orders on a composite
    // key, sort-merge FORCED by hint (a broadcast would make it scan-bound
    // and defeat the canary's purpose), plus an exact COUNT(DISTINCT) for a
    // second full exchange.
    QuerySpec.sql("q47_canary_join", (s, dir) => {
      import s.implicits._
      val l = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_extendedprice", $"l_discount")
        .crossJoin(s.range(4).select($"id".as("k")))
      val o = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey")
        .crossJoin(s.range(4).select($"id".as("k2")))
      l.join(o.hint("merge"),
          $"l_orderkey" === $"o_orderkey" && $"k" === $"k2")
        .groupBy($"k")
        .agg(count(lit(1)).as("n_pairs"),
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(18,4)"))
            .cast("double").as("revenue"),
          countDistinct($"o_custkey").as("n_cust"))
        .orderBy($"k")
    },
      """WITH m AS (SELECT UNNEST(RANGE(4)) AS k),
        |l AS (SELECT l_orderkey, l_extendedprice, l_discount, k
        |  FROM lineitem CROSS JOIN m),
        |o AS (SELECT o_orderkey, o_custkey, k AS k2 FROM orders CROSS JOIN m)
        |SELECT k, COUNT(*) AS n_pairs,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | COUNT(DISTINCT o_custkey) AS n_cust
        |FROM l JOIN o ON l.l_orderkey = o.o_orderkey AND l.k = o.k2
        |GROUP BY k ORDER BY k""".stripMargin)
  )

  /** Shared Spark/DuckDB text for q41 (dialect-identical). */
  private def groupByAllSql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin

  /** Shared Spark/DuckDB text for q42: nation keys as bags — customers'
    * nations INTERSECT ALL suppliers' (multiplicity = min of the counts),
    * then EXCEPT ALL back out the supplier bag (multiplicity difference).
    */
  private def bagOpsSql =
    """WITH cn AS (SELECT c_nationkey AS nk FROM customer),
      |     sn AS (SELECT s_nationkey AS nk FROM supplier),
      |     both_bags AS (SELECT nk FROM cn INTERSECT ALL SELECT nk FROM sn),
      |     leftover AS (SELECT nk FROM cn EXCEPT ALL SELECT nk FROM sn)
      |SELECT 'intersect_all' AS op, nk, COUNT(*) AS n FROM both_bags GROUP BY nk
      |UNION ALL
      |SELECT 'except_all' AS op, nk, COUNT(*) AS n FROM leftover GROUP BY nk
      |ORDER BY op, nk""".stripMargin

  private def lateralSql =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c, LATERAL (
      | SELECT o_orderkey, o_totalprice FROM orders
      | WHERE o_custkey = c.c_custkey
      | ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |WHERE c.c_custkey < 50
      |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin

  /** Shared Spark/DuckDB text for q38 (dialect-identical). The DECIMAL cast
    * before SUM keeps money exact cross-engine (see QuerySpec scaladoc).
    * A `def`: `specs` initializes first, so a val here would still be null
    * when the spec list captures it.
    */
  private def recursiveCteSql =
    """WITH RECURSIVE tree(pk, depth) AS (
      | SELECT CAST(1 AS BIGINT), 0
      | UNION ALL
      | SELECT p.p_partkey, t.depth + 1
      | FROM part p JOIN tree t ON p.p_partkey IN (t.pk * 2, t.pk * 2 + 1)
      | WHERE t.depth < 6
      |)
      |SELECT depth, COUNT(*) AS n_parts,
      | CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS subtree_price
      |FROM tree JOIN part p ON p.p_partkey = tree.pk
      |GROUP BY depth ORDER BY depth""".stripMargin
}
