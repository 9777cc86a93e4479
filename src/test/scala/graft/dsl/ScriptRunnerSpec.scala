package graft.dsl

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** End-to-end script tests in the reference's DslSpec style (script →
  * collect → assert; reference: tech/mlsql/test/dsl/DslSpec.scala).
  */
class ScriptRunnerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def runDF(script: String) = ScriptRunner.runToDF(script, spark)

  test("load + select + trailing-as registers views and tracks lastTable") {
    val df = runDF(
      s"""load parquet.`$sf/region.parquet` as region_v;
         |select r_regionkey, r_name from region_v order by r_regionkey as out;""".stripMargin)
    assert(df.count() == 5)
    assert(df.columns.toSeq == Seq("r_regionkey", "r_name"))
  }

  test("set text + templating in later statements") {
    val df = runDF(
      s"""set tbl = "nation_v";
         |set minKey = "20";
         |load parquet.`$sf/nation.parquet` as ${"${tbl}"};
         |select n_nationkey from ${"${tbl}"} where n_nationkey >= ${"${minKey}"} as out;""".stripMargin)
    assert(df.count() == 5)
  }

  test("set type=sql evaluates row0/col0") {
    val df = runDF(
      s"""load parquet.`$sf/region.parquet` as r1;
         |set maxKey = '''select max(r_regionkey) from r1''' where type="sql";
         |select ${"${maxKey}"} as k as out;""".stripMargin)
    assert(df.head().get(0).toString == "4")
  }

  test("set type=defaultParam does not overwrite") {
    val ctx = ScriptRunner.run(
      """set a = "original";
        |set a = "ignored" where type="defaultParam";
        |set b = "applied" where type="defaultParam";""".stripMargin, spark)
    assert(ctx.env("a") == "original")
    assert(ctx.env("b") == "applied")
  }

  test("set type=conf reaches the SQL conf") {
    ScriptRunner.run("""set spark.sql.cbo.enabled = "true" where type="conf";""", spark)
    assert(spark.conf.get("spark.sql.cbo.enabled") == "true")
  }

  test("jsonStr source parses a set variable") {
    val df = runDF(
      """set rawdata = '''{"a":1,"b":"x"}
        |{"a":2,"b":"y"}''';
        |load jsonStr.`rawdata` as jt;
        |select a, b from jt order by a as out;""".stripMargin)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("csvStr source with header option") {
    val df = runDF(
      """set csvdata = '''a,b
        |1,x
        |2,y''';
        |load csvStr.`csvdata` where header="true" as ct;
        |select a, b from ct order by a as out;""".stripMargin)
    assert(df.count() == 2)
    assert(df.columns.toSeq == Seq("a", "b"))
  }

  test("xmlStr source parses a set variable; xml files via the fallback") {
    val df = runDF(
      """set xmldata = '''<books><book><a>1</a><b>x</b></book>
        |<book><a>2</a><b>y</b></book></books>''';
        |load xmlStr.`xmldata` where rowTag="book" as xt;
        |select a, b from xt order by a as out;""".stripMargin)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq(1L -> "x", 2L -> "y"))
    // the file-path xml format needs no registration: save + load through
    // the DataFrameReader/Writer fallback (Spark 4 built-in XML source)
    val dir = java.nio.file.Files.createTempDirectory("xml_rt").toString + "/books"
    val back = runDF(
      s"""set xmldata2 = '''<r><a>7</a></r>''';
         |load xmlStr.`xmldata2` where rowTag="r" as x2;
         |save overwrite x2 as xml.`$dir` where rowTag="r";
         |load xml.`$dir` where rowTag="r" as x3;
         |select a from x3 as out;""".stripMargin)
    assert(back.head().getLong(0) == 7L)
  }

  test("script source yields one-row content table") {
    val df = runDF(
      """set myscript = '''select 1 as one''';
        |load script.`myscript` as st;
        |select content from st as out;""".stripMargin)
    assert(df.head().getString(0).contains("select 1"))
  }

  test("nested variable references resolve transitively at use time") {
    val ctx = ScriptRunner.run(
      s"""set base = "/root/testdata";
         |set dir = "${"${base}"}/sf0.001";
         |load parquet.`${"${dir}"}/region.parquet` as r_nested;
         |select count(*) as n from r_nested as out;""".stripMargin, spark)
    assert(ctx.lastDataFrame.get.head().getLong(0) == 5)
    // a value referencing a var set only LATER resolves when finally used
    val ctx2 = ScriptRunner.run(
      """set tpl = "${late}-suffix";
        |set late = "resolved";
        |!println '''${tpl}''';""".stripMargin, spark)
    assert(Template.merge("${tpl}", ctx2.env) == "resolved-suffix")
  }

  test("set mode=compile evaluates in the preprocess pass, before any load") {
    // the compile-stage SQL runs before the physical pass, so a later
    // text set templated from it already sees the value at ITS preprocess run
    val ctx = ScriptRunner.run(
      s"""set base = '''select 40 + 2''' where type="sql" and mode="compile";
         |set derived = "${"${base}"}x";
         |load parquet.`$sf/region.parquet` as r_cmp;
         |select ${"${base}"} as v from r_cmp limit 1 as out;""".stripMargin, spark)
    assert(ctx.env("base") == "42")
    assert(ctx.env("derived") == "42x")
    assert(ctx.lastDataFrame.get.head().get(0).toString == "42")
  }

  test("set mode=compile cannot see views loaded later; runtime can") {
    intercept[Exception] {
      ScriptRunner.run(
        s"""set mx = '''select max(r_regionkey) from r_late''' where type="sql" and mode="compile";
           |load parquet.`$sf/region.parquet` as r_late;""".stripMargin, spark)
    }
    // same statement with (default) runtime mode works: evaluated in order
    val ctx = ScriptRunner.run(
      s"""load parquet.`$sf/region.parquet` as r_late2;
         |set mx = '''select max(r_regionkey) from r_late2''' where type="sql" and mode="runtime";""".stripMargin,
      spark)
    assert(ctx.env("mx") == "4")
  }

  test("set physical replay does not clobber compile value; later set does overwrite") {
    val ctx = ScriptRunner.run(
      s"""set v = '''select 7''' where type="sql" and mode="compile";
         |load parquet.`$sf/region.parquet` as r_ow;
         |set v = "later";""".stripMargin, spark)
    // the trailing text set runs physically AFTER the compile statement's
    // physical replay (which must be a no-op), so "later" wins
    assert(ctx.env("v") == "later")
  }

  test("set defaultParam only fills absent keys") {
    val ctx = ScriptRunner.run(
      """set a = "explicit";
        |set a = "fallback" where type="defaultParam";
        |set b = "fallback" where type="defaultParam";""".stripMargin, spark)
    assert(ctx.env("a") == "explicit")
    assert(ctx.env("b") == "fallback")
  }

  test("scope=un_select hides a variable from select bodies only") {
    // (named "vaultdir", not "secret"/"password": Spark's own SQL variable
    // substitution redacts ${...} names matching its redaction regex, which
    // would obscure what THIS test asserts — graft-level scoping)
    val ctx = ScriptRunner.run(
      s"""set vaultdir = "sf0.001" where scope="un_select";
         |set open = "r_name";
         |load parquet.`/root/testdata/${"${vaultdir}"}/region.parquet` as r_sc;
         |select '${"${vaultdir}"}' as leaked, ${"${open}"} from r_sc limit 1 as out;""".stripMargin,
      spark)
    val row = ctx.lastDataFrame.get.head()
    // the load path resolved (table exists, row produced) but graft left the
    // select body's placeholder unsubstituted — Spark's OWN variable
    // substitution then blanks the unknown ${...}, so assert the value
    // never leaked rather than the placeholder's exact residue
    assert(row.getString(0) != "sf0.001", row.getString(0))
    assert(ctx.unSelectKeys.contains("vaultdir"))
  }

  test("!kill cancels a running batch script from a second thread") {
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() => {
      try ScriptRunner.run(
        // ~1e13 md5s of real per-row work (a bare cartesian count codegens
        // to an empty loop and finishes in seconds) — must die by
        // cancellation. The broadcast side is SMALL (100) on purpose: the
        // codegen'd range loop polls killTaskIfInterrupted about once per
        // 1000 outer rows, so per-outer-row work must stay tiny for the
        // task-kill to land promptly (a 1e6-row inner side pushed the poll
        // interval past minutes and made this test time out).
        """set jobName = "victim";
          |select sum(length(md5(concat(cast(a.id as string), cast(b.id as string))))) as c
          |  from range(100000000000) a cross join range(100) b as out;
          |save overwrite out as parquet.`/tmp/graft_victim_out`;""".stripMargin,
        spark)
      catch { case e: Throwable => err.set(e) }
    })
    t.start()
    var waited = 0
    while (!graft.dsl.JobManager.list().exists(_.name == "victim") && waited < 200) {
      Thread.sleep(50); waited += 1
    }
    assert(graft.dsl.JobManager.list().exists(_.name == "victim"))
    val jobs = runDF("!jobs;")
    assert(jobs.collect().map(_.getString(0)).contains("victim"))
    Thread.sleep(500) // let the doomed stage actually launch
    runDF("!kill victim;")
    t.join(60000)
    assert(!t.isAlive, "cancelled script thread still running")
    assert(err.get() != null, "cancelled script should surface an error")
    assert(!graft.dsl.JobManager.list().exists(_.name == "victim"))
  }

  test("save parquet + load round-trip preserves rows") {
    val dir = Files.createTempDirectory("graft_save").toString
    val df = runDF(
      s"""load parquet.`$sf/nation.parquet` as n1;
         |select n_nationkey, n_name from n1 as picked;
         |save overwrite picked as parquet.`$dir/out`;
         |load parquet.`$dir/out` as back;
         |select count(*) as c from back as out;""".stripMargin)
    assert(df.head().getLong(0) == 25)
  }

  test("save csv respects options and partitionBy writes directories") {
    val dir = Files.createTempDirectory("graft_csv").toString
    runDF(
      s"""load parquet.`$sf/region.parquet` as r2;
         |save overwrite r2 as csv.`$dir/out` where header="true" partitionBy r_regionkey;""".stripMargin)
    val sub = new java.io.File(s"$dir/out").listFiles().map(_.getName)
    assert(sub.exists(_.startsWith("r_regionkey=")))
  }

  test("save fileNum controls output file count") {
    val dir = Files.createTempDirectory("graft_fn").toString
    runDF(
      s"""load parquet.`$sf/lineitem.parquet` as l1;
         |save overwrite l1 as parquet.`$dir/out` where fileNum="1";""".stripMargin)
    val parts = new java.io.File(s"$dir/out").listFiles().count(_.getName.startsWith("part-"))
    assert(parts == 1)
  }

  test("insert/create/drop passthrough") {
    val df = runDF(
      s"""load parquet.`$sf/region.parquet` as rsrc;
         |create table graft_t1 using parquet as select * from rsrc;
         |select count(*) as c from graft_t1 as out;""".stripMargin)
    assert(df.head().getLong(0) == 5)
    ScriptRunner.run("drop table graft_t1;", spark)
  }

  test("connect + jdbc option merge resolves alias and directQuery") {
    ScriptRunner.run(
      """connect jdbc where url="jdbc:h2:mem:db1" and driver="org.h2.Driver" as db1;""",
      spark)
    val src = new graft.sources.JdbcSource
    val opts = src.resolveOptions("db1.mytable", Map("fetchsize" -> "100"))
    assert(opts("url") == "jdbc:h2:mem:db1")
    assert(opts("dbtable") == "mytable")
    assert(opts("fetchsize") == "100")
    val direct = src.resolveOptions("db1.x", Map("directQuery" -> "select 1"))
    assert(direct("query") == "select 1" && !direct.contains("dbtable"))
  }

  test("jdbc upsert statement generation per dialect") {
    import graft.sources.JdbcUpsert
    val my = JdbcUpsert.buildStatement("jdbc:mysql://h/db", "t", Seq("id", "a", "b"), Seq("id"))
    assert(my == "INSERT INTO t (id, a, b) VALUES (?, ?, ?) " +
      "ON DUPLICATE KEY UPDATE a = VALUES(a), b = VALUES(b)")
    val pg = JdbcUpsert.buildStatement("jdbc:postgresql://h/db", "t", Seq("id", "a"), Seq("id"))
    assert(pg == "INSERT INTO t (id, a) VALUES (?, ?) " +
      "ON CONFLICT (id) DO UPDATE SET a = EXCLUDED.a")
  }

  test("include local splices a script file") {
    val f = Files.createTempFile("graft_inc", ".mlsql")
    Files.writeString(f, s"load parquet.`$sf/region.parquet` as inc_r;")
    val df = runDF(
      s"""include local.`$f`;
         |select count(*) as c from inc_r as out;""".stripMargin)
    assert(df.head().getLong(0) == 5)
  }

  test("include file without trailing semicolon does not fuse statements") {
    val f = Files.createTempFile("graft_inc2", ".mlsql")
    Files.writeString(f, s"load parquet.`$sf/region.parquet` as inc_r2") // no ';'
    val df = runDF(
      s"""include local.`$f`;
         |select count(*) as c from inc_r2 as out;""".stripMargin)
    assert(df.head().getLong(0) == 5)
  }

  test("register ScriptUDF from a code table works under a pathPrefix") {
    val df = ScriptRunner.runToDF(
      """set c = '''def apply(x: Int): Int = x + 7''';
        |load script.`c` as code_t;
        |register ScriptUDF.`code_t` as plus7;
        |select plus7(1) as r as out;""".stripMargin,
      spark, pathPrefix = "/some/prefix")
    assert(df.head().getInt(0) == 8)
  }

  test("!if/!else/!fi executes only the taken branch") {
    val df = runDF(
      """!if ''' 1 = 1 ''';
        |select 'then' as branch as out;
        |!else;
        |select 'else' as branch as out;
        |!fi;""".stripMargin)
    assert(df.head().getString(0) == "then")
  }

  test("!if false -> !elif true branch") {
    val df = runDF(
      """!if ''' 1 = 2 ''';
        |select 'a' as b as out;
        |!elif ''' 2 = 2 ''';
        |select 'b' as b as out;
        |!else;
        |select 'c' as b as out;
        |!fi;""".stripMargin)
    assert(df.head().getString(0) == "b")
  }

  test("nested !if blocks") {
    val df = runDF(
      """!if ''' 1 = 1 ''';
        |!if ''' 1 = 2 ''';
        |select 'inner-then' as b as out;
        |!else;
        |select 'inner-else' as b as out;
        |!fi;
        |!fi;""".stripMargin)
    assert(df.head().getString(0) == "inner-else")
  }

  test("!if condition sees set variables") {
    val df = runDF(
      """set flag = "yes";
        |!if ''' '${flag}' = 'yes' ''';
        |select 'on' as b as out;
        |!else;
        |select 'off' as b as out;
        |!fi;""".stripMargin)
    assert(df.head().getString(0) == "on")
  }

  test("unclosed !if fails loudly") {
    intercept[IllegalStateException] {
      ScriptRunner.run("!if ''' 1=1 '''; select 1 as x;", spark)
    }
  }

  test("unknown statement fails loudly") {
    intercept[IllegalArgumentException] {
      ScriptRunner.run("frobnicate the data;", spark)
    }
  }

  test("Engine isolates tenants: separate temp views, shared context, own home dirs") {
    val base = java.nio.file.Files.createTempDirectory("graft_engine").toString
    val engine = new Engine(spark, base)
    engine.run("alice", s"""load parquet.`$sf/region.parquet` as mine;
      |select count(*) as n from mine as out;""".stripMargin)
    // bob's session does not see alice's view
    val e = intercept[Exception] { engine.run("bob", "select * from mine as out;") }
    assert(e.getMessage.toLowerCase.contains("mine"))
    // relative paths re-root under the owner's home
    engine.run("alice", s"""load parquet.`$sf/region.parquet` as r2;
      |save overwrite r2 as parquet.`kept/regions`;""".stripMargin)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/alice/kept/regions")))
    // same owner gets the same session back (state persists across runs)
    val ctx = engine.run("alice", "select count(*) as n from mine as out;")
    assert(ctx.lastDataFrame.get.head().getLong(0) == 5)
    // native expressions (session extensions) work in tenant sessions
    val cos = engine.run("alice",
      "select arr_cosine(array(1.0d, 0d), array(1.0d, 0d)) as c as out;")
    assert(math.abs(cos.lastDataFrame.get.head().getDouble(0) - 1.0) < 1e-9)
  }

  test("tenant isolation: path escapes, connect aliases, fragments, owner names") {
    val base = java.nio.file.Files.createTempDirectory("graft_iso").toString
    val engine = new Engine(spark, base)
    // ../ escape out of the home prefix is an error, not a silent write
    val esc = intercept[Exception] {
      engine.run("alice", s"""load parquet.`$sf/region.parquet` as r_esc;
        |save overwrite r_esc as parquet.`../bob/stolen`;""".stripMargin)
    }
    assert(esc.getMessage.contains("escapes"))
    // owner strings cannot traverse out of homeBase; "." would BE homeBase
    intercept[IllegalArgumentException] { engine.run("../../tmp", "select 1 as x as out;") }
    intercept[IllegalArgumentException] { engine.run(".", "select 1 as x as out;") }
    // !fs paths are re-rooted + containment-checked like every other path
    val fsEsc = intercept[Exception] { engine.run("alice", "!fs ls ../bob;") }
    assert(fsEsc.getMessage.contains("escapes"))
    // batch-job visibility is tenant-scoped: alice's (finished) runs never
    // appear in bob's !jobs, and bob's !kill by name can't touch them
    assert(graft.dsl.JobManager.list(engine.homeFor("bob"))
      .forall(_.owner == engine.homeFor("bob")))
    // connect aliases are namespaced: alice's credentials are not bob's
    engine.run("alice",
      """connect jdbc where url="jdbc:h2:mem:alicedb" and user="alice" as shared_name;""")
    val e2 = intercept[IllegalArgumentException] {
      new graft.sources.JdbcSource().resolveOptions("shared_name.t", Map(), engine.homeFor("bob"))
    }
    assert(e2.getMessage.contains("no `connect"))
    assert(new graft.sources.JdbcSource()
      .resolveOptions("shared_name.t", Map(), engine.homeFor("alice"))("user") == "alice")
    // fragments are namespaced the same way; global (un-prefixed) ones are shared
    engine.run("alice",
      "run command as ScriptFragment.`mine_frag` where code='''select 1 as v as frag_out''';")
    val e3 = intercept[IllegalArgumentException] { engine.run("bob", "include view.`mine_frag`;") }
    assert(e3.getMessage.contains("no script fragment"))
    ScriptRunner.run(
      "run command as ScriptFragment.`global_frag` where code='''select 2 as v as gfrag_out''';",
      spark)
    val ctx = engine.run("bob", "include view.`global_frag`;")
    assert(ctx.lastDataFrame.get.head().getInt(0) == 2)
  }

  test("pathPrefix re-roots relative paths (multi-tenancy helper)") {
    val df = ScriptRunner.runToDF(
      """load parquet.`region.parquet` as r_rel;
        |select count(*) as c from r_rel as out;""".stripMargin,
      spark, pathPrefix = sf)
    assert(df.head().getLong(0) == 5)
  }

  test("!println macro and PrintCommand") {
    val df = runDF("""!println '''hello graft''';""")
    assert(df.head().getString(0) == "hello graft")
  }

  test("!show ets lists registered ETs") {
    val df = runDF("!show ets;")
    val names = df.collect().map(_.getString(0)).toSet
    assert(names.contains("Pivot") && names.contains("TableRepartition"))
  }

  test("!desc shows a table schema") {
    val df = runDF(
      s"""load parquet.`$sf/region.parquet` as r3;
         |!desc r3;""".stripMargin)
    val cols = df.collect().map(_.getString(0)).toSet
    assert(cols.contains("r_regionkey") && cols.contains("r_name"))
  }

  test("!fs ls lists files") {
    val df = runDF(s"!fs ls $sf;")
    assert(df.count() > 0)
    assert(df.columns.toSeq == Seq("path", "size", "is_dir"))
  }
}
