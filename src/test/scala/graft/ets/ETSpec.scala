package graft.ets

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.dsl.ScriptRunner

class ETSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def runDF(script: String) = ScriptRunner.runToDF(script, spark)

  test("Pivot ET matches groupBy.pivot.agg") {
    val df = runDF(
      s"""load parquet.`$sf/nation.parquet` as n_et;
         |select n_regionkey, n_nationkey % 2 as parity, n_nationkey as v from n_et as base;
         |run base as Pivot.`` where groupBy="n_regionkey" and pivot="parity"
         |  and agg="sum" and aggCol="v" and values="0,1" as pv;
         |select * from pv order by n_regionkey as out;""".stripMargin)
    assert(df.columns.toSeq == Seq("n_regionkey", "0", "1"))
    assert(df.count() == 5)
  }

  test("TableRepartition ET changes partition count, preserves rows") {
    val df = runDF(
      s"""load parquet.`$sf/lineitem.parquet` as l_et;
         |run l_et as TableRepartition.`` where partitionNum="3" as rp;""".stripMargin)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("RateSampler ET: stratified split adds __split__ with all splits present") {
    val df = runDF(
      s"""load parquet.`$sf/orders.parquet` as o_et;
         |select o_orderkey, o_orderstatus as label from o_et as labeled;
         |run labeled as RateSampler.`` where labelCol="label" and sampleRate="0.8,0.2" as sp;""".stripMargin)
    val splits = df.groupBy("__split__").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set(0, 1))
    val total = splits.values.sum.toDouble
    assert(splits(0) / total > 0.6 && splits(0) / total < 0.95) // ~0.8 in expectation
    assert(df.count() == spark.table("labeled").count())       // row-preserving
  }

  test("RateSampler is deterministic for a fixed seed") {
    val a = runDF(
      s"""load parquet.`$sf/orders.parquet` as o_et2;
         |run o_et2 as RateSampler.`` where labelCol="o_orderstatus" and sampleRate="0.5,0.5" and seed="7" as s1;""".stripMargin)
      .select("o_orderkey", "__split__").collect().toSet
    val b = runDF(
      s"""run o_et2 as RateSampler.`` where labelCol="o_orderstatus" and sampleRate="0.5,0.5" and seed="7" as s2;""".stripMargin)
      .select("o_orderkey", "__split__").collect().toSet
    assert(a == b)
  }

  test("CacheExt ET: script-lifetime by default, session lifetime opt-out") {
    // default lifetime="script": the persist is released when the run ends
    // (reference scope semantics, SQLCacheExt.scala:38-92)
    ScriptRunner.run(
      s"""load parquet.`$sf/region.parquet` as r_et;
         |!cache r_et;""".stripMargin, spark)
    assert(!spark.catalog.isCached("r_et"),
      "script-scoped cache must be released at script end")
    // lifetime="session" survives until an explicit uncache
    ScriptRunner.run(
      """run r_et as CacheExt.`` where lifetime="session" and isEager="true" as r_etc;""",
      spark)
    assert(spark.catalog.isCached("r_et"))
    ScriptRunner.run("!uncache r_et;", spark)
    assert(!spark.catalog.isCached("r_et"))
  }

  test("WaterMarkInPlace ET applies a watermark on a streaming table") {
    val ctx = ScriptRunner.run(
      s"""load parquet.`$sf/events.parquet` as ev_batch0;
         |select cast(ts as timestamp) as ts, event_id from ev_batch0 as ev_batch;
         |load mockStream.`ev_batch` as ev_s;
         |run ev_s as WaterMarkInPlace.`` where eventTimeCol="ts" and delayThreshold="10 seconds" as ev_w;""".stripMargin,
      spark)
    val plan = spark.table("ev_w").queryExecution.analyzed.toString
    assert(plan.contains("EventTimeWatermark"))
  }

  test("RunScript ET executes script text from a table") {
    val df = runDF(
      """set sub = '''select 41 + 1 as answer as subout''';
        |load script.`sub` as subtbl;
        |run subtbl as RunScript.`` as final;
        |select answer from subout as out;""".stripMargin)
    assert(df.head().get(0).toString == "42")
  }

  test("TableToMap ET registers a lookup UDF") {
    val df = runDF(
      s"""load parquet.`$sf/region.parquet` as r_m;
         |select r_regionkey, r_name from r_m as kv;
         |run kv as TableToMap.`` where keyCol="r_regionkey" and valueCol="r_name" and udfName="region_name" as m;
         |select region_name('0') as n as out;""".stripMargin)
    assert(df.head().getString(0) != null)
  }

  test("!repartition macro routes through TableRepartition") {
    val df = runDF(
      s"""load parquet.`$sf/nation.parquet` as n_rp;
         |!repartition 2 n_rp;
         |select * from n_rp as out;""".stripMargin)
    assert(spark.table("n_rp").rdd.getNumPartitions == 2)
  }

  test("MapValues maps through a broadcast dictionary with default") {
    val df = runDF(
      """set dict = '''{"k":"a","v":"alpha"}
        |{"k":"b","v":"beta"}''';
        |load jsonStr.`dict` as mv_dict;
        |set data = '''{"x":"a"}
        |{"x":"b"}
        |{"x":"c"}''';
        |load jsonStr.`data` as mv_data;
        |run mv_data as MapValues.`` where mapTable="mv_dict" and inputCol="x"
        |  and defaultValue="unknown" as mapped;
        |select x, x_mapped from mapped order by x as out;""".stripMargin)
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("a" -> "alpha", "b" -> "beta", "c" -> "unknown"))
  }

  test("DicOrTableToArray registers a broadcast-array UDF") {
    val df = runDF(
      """set words = '''{"w":"x"}
        |{"w":"y"}''';
        |load jsonStr.`words` as dic_t;
        |run dic_t as DicOrTableToArray.`` where inputCol="w" and udfName="my_dic" as d;
        |select size(my_dic()) as n, array_contains(my_dic(), 'y') as has_y as out;""".stripMargin)
    val r = df.head()
    assert(r.getInt(0) == 2 && r.getBoolean(1))
  }

  test("!schemaInfer stores a DDL the stream load can template") {
    val ctx = ScriptRunner.run(
      """set sdata = '''{"value":"{\"a\":1,\"b\":\"x\"}"}''';
        |load jsonStr.`sdata` as s_infer;
        |!schemaInfer s_infer mySchema;""".stripMargin, spark)
    assert(ctx.env("mySchema").contains("a BIGINT"))
    assert(ctx.env("mySchema").contains("b STRING"))
  }

  test("!profile produces per-column stats") {
    val df = runDF(
      s"""load parquet.`$sf/nation.parquet` as n_pr;
         |!profile n_pr;
         |select * from n_pr_profile as out;""".stripMargin)
    val byCol = df.collect().map(r => r.getString(0) -> r).toMap
    assert(byCol.keySet.contains("n_nationkey"))
    val nk = byCol("n_nationkey")
    assert(nk.getLong(2) == 25 && nk.getLong(3) == 0) // rows, nulls
    assert(nk.getString(5) == "0" && nk.getString(6) == "24") // min/max
    // numeric columns carry one-pass approx quantiles; strings stay null
    assert(nk.getDouble(8) == 12.0) // p50 of 0..24
    assert(nk.getDouble(7) <= nk.getDouble(9) && nk.getDouble(9) <= nk.getDouble(10))
    assert(byCol("n_name").isNullAt(8))
  }

  test("ScriptFragment ET + include view splices a registered fragment") {
    runDF(
      s"""run command as ScriptFragment.`mkRegions` where
         |  code='''load parquet.`$sf/region.parquet` as regions_frag''' as fr;""".stripMargin)
    val df = runDF(
      """include view.`mkRegions`;
        |select count(*) as n from regions_frag as out;""".stripMargin)
    assert(df.head().getLong(0) == 5)
    // include twice in one script still resolves (fixpoint splice)
    val df2 = runDF(
      """include view.`mkRegions`;
        |include function.`mkRegions`;
        |select count(*) as n from regions_frag as out;""".stripMargin)
    assert(df2.head().getLong(0) == 5)
    val e = intercept[IllegalArgumentException] { runDF("include view.`missing_frag`;") }
    assert(e.getMessage.contains("no script fragment"))
  }

  test("!explain returns the formatted physical plan") {
    val df = runDF(
      s"""load parquet.`$sf/lineitem.parquet` as l_ex;
         |select l_orderkey from l_ex where l_linenumber = 1 as l_f;
         |!explain l_f;""".stripMargin)
    val plan = df.head().getString(0)
    assert(plan.contains("Physical Plan"))
    assert(plan.contains("PushedFilters"))
  }

  test("!audit reports exchanges, scans with pushdown, and flags the global-window trap") {
    val df = runDF(
      s"""load parquet.`$sf/orders.parquet` as o_au;
         |load parquet.`$sf/customer.parquet` as c_au;
         |select o_orderkey, c_name from o_au, c_au
         |  where o_au.o_custkey = c_au.c_custkey and o_totalprice > 100 as j_au;
         |!audit j_au;""".stripMargin)
    val metrics = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2)))
    def value(m: String) = metrics.find(_._1 == m).get._2
    assert(value("broadcast_exchanges").toInt >= 1) // customer dim broadcast
    assert(value("nested_loop_or_cartesian_joins") == "0")
    assert(value("single_partition_exchanges") == "0")
    assert(value("wholestage_codegen_spans").toInt >= 1)
    val scans = metrics.filter(_._1 == "scan")
    assert(scans.length == 2)
    assert(scans.exists(s => s._3.contains("PushedFilters") &&
      s._3.contains("o_totalprice")), scans.mkString("\n"))
    // the trap the audit exists to catch: a global-order window
    val warn = runDF(
      s"""load parquet.`$sf/orders.parquet` as o_au2;
         |select o_orderkey, row_number() over (order by o_totalprice) as rn
         |  from o_au2 as w_au;
         |!audit w_au;""".stripMargin).collect()
      .find(_.getString(0) == "single_partition_exchanges").get
    assert(warn.getString(1).toInt >= 1)
    assert(warn.getString(2).contains("WARNING"))
  }

  test("!split macro stratifies via RateSampler") {
    val df = runDF(
      s"""load parquet.`$sf/orders.parquet` as o_sp;
         |!split o_sp o_orderstatus 0.7,0.3 o_splits;
         |select count(distinct __split__) as n from o_splits as out;""".stripMargin)
    assert(df.head().getLong(0) == 2)
  }

  test("unknown ET fails with the registered list") {
    val e = intercept[IllegalArgumentException] {
      ScriptRunner.run("run x as NoSuchET.`` as y;", spark)
    }
    assert(e.getMessage.contains("unknown ET"))
  }

  test("lookup resolves the reference's InPlace/Ext naming conventions") {
    // reference scripts say ALSInPlace (SQLALSInPlace.scala); registry says ALS
    assert(ETRegistry.lookup("ALSInPlace").name == "ALS")
    // stripping must never shadow an exact registration
    assert(ETRegistry.lookup("TfIdfInPlace").name == "TfIdfInPlace")
    assert(ETRegistry.lookup("RateSampler").name == "RateSampler")
  }
}
