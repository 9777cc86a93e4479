package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function families (SURVEY.md §2.3 "scalar functions" row + §2.5's
  * UDF pack). The reference inherits Spark SQL built-ins wholesale through
  * its `select` body; these queries pin the families cross-checked against
  * DuckDB: string, regex/like, math, date/time, json, array, conditional,
  * hash, cast, and statistical aggregates.
  */
object Funcs {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec.sql("f1_string", (s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select($"p_partkey",
          upper($"p_name").as("up"),
          lower($"p_brand").as("lo"),
          substring($"p_type", 1, 5).as("ty5"),
          length($"p_name").as("len"),
          concat($"p_brand", lit("-"), $"p_type").as("bt"),
          regexp_replace($"p_type", lit(" "), lit("_")).as("ty_us"),
          trim(lpad($"p_brand", 12, "x")).as("pad"),
          reverse($"p_name").as("rev"))
        .orderBy($"p_partkey")
    },
      """SELECT p_partkey, UPPER(p_name) AS up, LOWER(p_brand) AS lo,
        | SUBSTRING(p_type, 1, 5) AS ty5, LENGTH(p_name) AS len,
        | CONCAT(p_brand, '-', p_type) AS bt,
        | REGEXP_REPLACE(p_type, ' ', '_', 'g') AS ty_us,
        | TRIM(LPAD(p_brand, 12, 'x')) AS pad,
        | REVERSE(p_name) AS rev
        |FROM part ORDER BY p_partkey""".stripMargin),

    QuerySpec.sql("f2_like_regex", (s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .filter($"p_type".like("S%") && $"p_name".rlike("a|o"))
        .select($"p_partkey", $"p_type",
          $"p_name".startsWith("a").as("starts_a"),
          $"p_name".contains("x").as("has_x"),
          regexp_extract($"p_brand", "Brand#(\\d+)", 1).as("brand_num"))
        .orderBy($"p_partkey")
    },
      """SELECT p_partkey, p_type,
        | (p_name LIKE 'a%') AS starts_a,
        | (p_name LIKE '%x%') AS has_x,
        | REGEXP_EXTRACT(p_brand, 'Brand#(\d+)', 1) AS brand_num
        |FROM part WHERE p_type LIKE 'S%' AND REGEXP_MATCHES(p_name, 'a|o')
        |ORDER BY p_partkey""".stripMargin),

    QuerySpec.sql("f3_math", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_orderkey" <= 200)
        .select($"l_orderkey", $"l_linenumber",
          abs($"l_quantity" - 25.0).as("abs_v"),
          ceil($"l_extendedprice" / 1000.0).as("ceil_k"),
          floor($"l_extendedprice" / 1000.0).as("floor_k"),
          round(sqrt($"l_extendedprice"), 6).as("sqrt_p"),
          round(log($"l_extendedprice"), 6).as("ln_p"),
          round(log10($"l_extendedprice"), 6).as("log10_p"),
          round(pow($"l_quantity", 2.0), 2).as("qty_sq"),
          pmod($"l_orderkey", lit(7)).as("mod7"),
          sign($"l_discount" - 0.05).as("sgn"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
      """SELECT l_orderkey, l_linenumber,
        | ABS(l_quantity - 25.0) AS abs_v,
        | CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT) AS ceil_k,
        | CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS floor_k,
        | ROUND(SQRT(l_extendedprice), 6) AS sqrt_p,
        | ROUND(LN(l_extendedprice), 6) AS ln_p,
        | ROUND(LOG10(l_extendedprice), 6) AS log10_p,
        | ROUND(POW(l_quantity, 2.0), 2) AS qty_sq,
        | l_orderkey % 7 AS mod7,
        | CAST(CASE WHEN l_discount > 0.05 THEN 1 WHEN l_discount < 0.05 THEN -1 ELSE 0 END AS DOUBLE) AS sgn
        |FROM lineitem WHERE l_orderkey <= 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    QuerySpec.sql("f4_datetime", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_orderkey" <= 500)
        .select($"o_orderkey",
          year($"o_orderdate").as("y"),
          month($"o_orderdate").as("m"),
          dayofmonth($"o_orderdate").as("d"),
          quarter($"o_orderdate").as("q"),
          date_trunc("month", $"o_orderdate").cast("date").as("month_start"),
          date_add($"o_orderdate".cast("date"), 30).as("plus30"),
          datediff(lit("2002-01-01").cast("date"), $"o_orderdate".cast("date")).as("days_to_2002"))
        .orderBy($"o_orderkey")
    },
      """SELECT o_orderkey,
        | CAST(YEAR(o_orderdate) AS INT) AS y,
        | CAST(MONTH(o_orderdate) AS INT) AS m,
        | CAST(DAY(o_orderdate) AS INT) AS d,
        | CAST(QUARTER(o_orderdate) AS INT) AS q,
        | CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
        | CAST(o_orderdate AS DATE) + 30 AS plus30,
        | CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin),

    QuerySpec.sql("f5_json", (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .filter($"event_id" < 500)
        .select($"event_id",
          get_json_object($"props", "$.k").cast("int").as("k_val"))
        .orderBy($"event_id")
    },
      """SELECT event_id, CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k_val
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin),

    QuerySpec.sql("f6_array", (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .filter($"doc_id" < 200)
        .withColumn("words", split($"text", " "))
        .select($"doc_id",
          size($"words").as("n_words"),
          element_at($"words", 1).as("first_word"),
          element_at($"words", -1).as("last_word"),
          array_contains($"words", "spark").as("has_spark"),
          size(array_distinct($"words")).as("n_unique"),
          array_join(slice(sort_array($"words"), 1, 3), ",").as("top3_sorted"))
        .orderBy($"doc_id")
    },
      """SELECT doc_id,
        | CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_words,
        | STRING_SPLIT(text, ' ')[1] AS first_word,
        | STRING_SPLIT(text, ' ')[-1] AS last_word,
        | LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark') AS has_spark,
        | CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS INT) AS n_unique,
        | ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(text, ' '))[1:3], ',') AS top3_sorted
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin),

    QuerySpec.sql("f7_conditional", (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_orderkey" <= 300)
        .select($"o_orderkey",
          coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN")).as("status"),
          greatest($"o_totalprice", lit(100000.0)).as("g"),
          least($"o_totalprice", lit(100000.0)).as("l"),
          when($"o_totalprice" > 250000.0, lit("big")).otherwise(lit("small")).as("sz"))
        .orderBy($"o_orderkey")
    },
      """SELECT o_orderkey,
        | COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status,
        | GREATEST(o_totalprice, 100000.0) AS g,
        | LEAST(o_totalprice, 100000.0) AS l,
        | CASE WHEN o_totalprice > 250000.0 THEN 'big' ELSE 'small' END AS sz
        |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""".stripMargin),

    QuerySpec.sql("f8_hash", (s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .filter($"c_custkey" <= 100)
        .select($"c_custkey",
          md5($"c_name").as("h_md5"),
          sha2($"c_name", 256).as("h_sha256"))
        .orderBy($"c_custkey")
    },
      """SELECT c_custkey, MD5(c_name) AS h_md5, SHA256(c_name) AS h_sha256
        |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin),

    QuerySpec.sql("f9_cast", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_orderkey" <= 100)
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("int").as("qty_int"),
          $"l_orderkey".cast("string").as("ok_str"),
          $"l_shipdate".cast("date").as("ship_date"),
          concat($"l_returnflag", $"l_linestatus").as("flags"),
          ($"l_quantity" > 25.0).cast("int").as("big_qty"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
      """SELECT l_orderkey, l_linenumber,
        | CAST(l_quantity AS INT) AS qty_int,
        | CAST(l_orderkey AS VARCHAR) AS ok_str,
        | CAST(l_shipdate AS DATE) AS ship_date,
        | CONCAT(l_returnflag, l_linestatus) AS flags,
        | CAST(l_quantity > 25.0 AS INT) AS big_qty
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    QuerySpec.sql("f10_stats", (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(stddev_samp($"l_quantity"), 3).as("sd_qty"),
          round(var_samp($"l_quantity"), 3).as("var_qty"),
          min($"l_extendedprice").as("min_p"),
          max($"l_extendedprice").as("max_p"),
          round(corr($"l_quantity", $"l_extendedprice"), 4).as("corr_qp"),
          round(covar_samp($"l_quantity", $"l_extendedprice"), 1).as("cov_qp"))
        .orderBy($"l_returnflag")
    },
      """SELECT l_returnflag,
        | ROUND(STDDEV_SAMP(l_quantity), 3) AS sd_qty,
        | ROUND(VAR_SAMP(l_quantity), 3) AS var_qty,
        | MIN(l_extendedprice) AS min_p,
        | MAX(l_extendedprice) AS max_p,
        | ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qp,
        | ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 1) AS cov_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // tumbling-window-style time bucketing (batch analog of the streaming
    // `window()` agg; reference streams express this in the select body)
    QuerySpec.sql("f11_time_bucket", (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(date_trunc("hour", $"ts").as("hour_bucket"), $"event_type")
        .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(18,2)")).cast("double").as("sum_v"))
        .orderBy($"hour_bucket", $"event_type")
    },
      """SELECT DATE_TRUNC('hour', MAKE_TIMESTAMP(EPOCH_NS(ts) // 1000)) AS hour_bucket, event_type,
        | COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY hour_bucket, event_type""".stripMargin),

    // ---- built-in UDF pack (graft.functions.UDFPack; reference
    //      streaming/core/compositor/spark/udf/Functions.scala). These run
    //      through spark.sql so registration is exercised end-to-end. ----
    QuerySpec.sql("f12_udf_vec_cosine", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
          | ROUND(vec_cosine(vec_dense(CAST(a.embedding AS array<double>)),
          |                  vec_dense(CAST(b.embedding AS array<double>))), 6) AS cos,
          | ROUND(vec_mean(vec_dense(CAST(a.embedding AS array<double>))), 6) AS mean_a
          |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
          |WHERE a.vec_id < 50 ORDER BY a_id""".stripMargin)
    },
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        | ROUND(LIST_INNER_PRODUCT(a.v, b.v) /
        |   (SQRT(LIST_INNER_PRODUCT(a.v, a.v)) * SQRT(LIST_INNER_PRODUCT(b.v, b.v))), 6) AS cos,
        | ROUND(LIST_SUM(a.v) / LEN(a.v), 6) AS mean_a
        |FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 50 ORDER BY a_id""".stripMargin),

    QuerySpec.sql("f13_udf_misc", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT doc_id, crawler_md5(text) AS h,
          | mkString('-', array(lang, source)) AS tag,
          | byteStringAsBytes('1kb') + doc_id AS b
          |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin)
    },
      """SELECT doc_id, MD5(text) AS h,
        | lang || '-' || source AS tag,
        | 1024 + doc_id AS b
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin),

    QuerySpec.sql("f14_udf_time", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT r_regionkey,
          | parseDateAsLong(concat('2020-01-0', cast(r_regionkey + 1 as string)), 'yyyy-MM-dd') AS ms,
          | timePlus(parseDateAsLong('2020-01-01', 'yyyy-MM-dd'), concat(cast(r_regionkey as string), ' hour')) AS plus_ms,
          | parseLongAsDate(cast(r_regionkey as bigint) * 86400000, 'yyyy-MM-dd') AS d
          |FROM region ORDER BY r_regionkey""".stripMargin)
    },
      """SELECT r_regionkey,
        | EPOCH_MS(STRPTIME('2020-01-0' || CAST(r_regionkey + 1 AS VARCHAR), '%Y-%m-%d')) AS ms,
        | EPOCH_MS(STRPTIME('2020-01-01', '%Y-%m-%d')) + r_regionkey * 3600000 AS plus_ms,
        | STRFTIME(TO_TIMESTAMP(r_regionkey * 86400), '%Y-%m-%d') AS d
        |FROM region ORDER BY r_regionkey""".stripMargin),

    // ---- exact percentiles (continuous interpolation — Spark
    //      `percentile` == DuckDB `quantile_cont`). The approx_percentile
    //      sketch path exists but is engine-specific, so the gate pins the
    //      exact variant. ----
    QuerySpec.sql("f15_percentiles", (s, dir) => {
      import s.implicits._
      // one percentile aggregate per COLUMN (array of fractions): the
      // per-group value buffer is built and sorted once per column instead
      // of once per requested fraction
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_quantity, array(0.5, 0.9))").as("q_pcts"),
          expr("percentile(l_extendedprice, array(0.25, 0.99))").as("p_pcts"))
        .select($"l_returnflag",
          round(element_at($"q_pcts", 1), 4).as("p50_qty"),
          round(element_at($"q_pcts", 2), 4).as("p90_qty"),
          round(element_at($"p_pcts", 1), 2).as("p25_price"),
          round(element_at($"p_pcts", 2), 2).as("p99_price"))
        .orderBy($"l_returnflag")
    },
      """SELECT l_returnflag,
        | ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS p50_qty,
        | ROUND(QUANTILE_CONT(l_quantity, 0.9), 4) AS p90_qty,
        | ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 2) AS p25_price,
        | ROUND(QUANTILE_CONT(l_extendedprice, 0.99), 2) AS p99_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- UDF-pack tail (p17 technique: deterministic inputs -> literal
    //      VALUES oracle, since these run graft-registered UDFs DuckDB
    //      lacks): parse fallback segmentation, array_slice/array_concat,
    //      decodeKafka, byteStringAs, crawler title/body/xpath ----
    QuerySpec.sql("f16_udf_tail", (s, dir) => {
      graft.functions.UDFPack.register(s)
      s.sql(
        """SELECT id,
          |  array_join(parse(txt), '|') AS parsed,
          |  array_join(array_slice(split(txt, ' '), 0, 2), '|') AS sliced,
          |  array_join(array_concat(array(split(txt, ' '), array('z'))), '|') AS concatted,
          |  decodeKafka(cast(txt as binary)) AS decoded,
          |  byteStringAs(bytes, 'KB') AS kb,
          |  crawler_auto_extract_title(html) AS title,
          |  crawler_auto_extract_body(html) AS body,
          |  crawler_extract_xpath(html, '/html/body/p') AS xp
          |FROM VALUES
          |  (1, 'alpha beta gamma', '2048', '<html><head><title>T1</title></head><body><p>Hello</p></body></html>'),
          |  (2, 'one two', '1mb', '<html><head><title> T2 </title><style>p{}</style></head><body><p>World</p></body></html>')
          |  t(id, txt, bytes, html)
          |ORDER BY id""".stripMargin)
    },
      """SELECT * FROM (VALUES
        | (1, 'alpha|beta|gamma', 'alpha|beta', 'alpha|beta|gamma|z', 'alpha beta gamma',
        |  CAST(2 AS BIGINT), 'T1', 'T1 Hello', 'Hello'),
        | (2, 'one|two', 'one|two', 'one|two|z', 'one two',
        |  CAST(1024 AS BIGINT), 'T2', 'T2 World', 'World'))
        | t(id, parsed, sliced, concatted, decoded, kb, title, body, xp)
        |ORDER BY id""".stripMargin),

    // ---- VARIANT (Spark 4 semi-structured type): build identical JSON
    //      text in both engines by string concat (int/string fields only —
    //      float-to-string formatting is engine-specific), then
    //      parse_json -> typed variant_get paths incl. array indexing;
    //      DuckDB mirrors with json_extract. Per-row, codegen-friendly,
    //      shredding-ready at scale. ----
    QuerySpec.sql("f17_variant", (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT o_orderkey,
          | variant_get(v, '$.c', 'bigint') AS cust,
          | variant_get(v, '$.s', 'string') AS status,
          | variant_get(v, '$.a[1]', 'bigint') AS second_elem,
          | cast(variant_get(v, '$.missing', 'string') is null as int) AS missing_is_null
          |FROM (
          | SELECT o_orderkey, parse_json(concat(
          |   '{"c":', o_custkey, ',"s":"', o_orderstatus, '",',
          |   '"a":[', o_orderkey, ',', o_custkey + 1, ']}')) AS v
          | FROM orders WHERE o_orderkey < 200)
          |ORDER BY o_orderkey""".stripMargin)
    },
      """SELECT o_orderkey,
        | CAST(j->>'$.c' AS BIGINT) AS cust,
        | j->>'$.s' AS status,
        | CAST(j->>'$.a[1]' AS BIGINT) AS second_elem,
        | CAST(CASE WHEN json_extract(j, '$.missing') IS NULL THEN 1 ELSE 0 END AS INT)
        |   AS missing_is_null
        |FROM (
        | SELECT o_orderkey,
        |  '{"c":' || o_custkey || ',"s":"' || o_orderstatus || '","a":[' ||
        |  o_orderkey || ',' || (o_custkey + 1) || ']}' AS j
        | FROM orders WHERE o_orderkey < 200)
        |ORDER BY o_orderkey""".stripMargin)
  )
}
