package graft.ets

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.dsl.ScriptRunner

class CompatETSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def runDF(script: String) = ScriptRunner.runToDF(script, spark)

  test("Kill ET cancels by reference statement form") {
    // nothing named this is running: result is an empty cancellation list
    val df = runDF("run command as Kill.`no_such_job` as k;")
    assert(df.columns.toSeq == Seq("cancelled_group"))
    assert(df.count() == 0)
  }

  test("JDBC ET fails actionably without a connect alias / driver") {
    val e = intercept[IllegalArgumentException] {
      runDF("""run command as JDBC.`nope` where driver-statement-0="create table x(a int)";""")
    }
    assert(e.getMessage.contains("connect"))
  }

  test("VecMapInPlace builds sparse vectors over the global key space") {
    val df = runDF(
      """select map('a', 1.0, 'c', 3.0) as feature
        |union all select map('b', 2.0, 'c', 4.0) as feature
        |as vm_in;
        |run vm_in as VecMapInPlace.`` as vm_out;
        |select feature from vm_out as out;""".stripMargin)
    val vecs = df.collect().map(_.getAs[org.apache.spark.ml.linalg.Vector](0))
    assert(vecs.forall(_.size == 3)) // keys a,b,c
    assert(vecs.map(_.toArray.sum).sorted.toSeq == Seq(4.0, 6.0))
  }

  test("Word2ArrayInPlace segments text in place") {
    val df = runDF(
      """select 'hello spark world' as text as w2a_in;
        |run w2a_in as Word2ArrayInPlace.`` as w2a_out;
        |select text from w2a_out as out;""".stripMargin)
    assert(df.head().getSeq[String](0) == Seq("hello", "spark", "world"))
  }

  test("FeatureExtractInPlace computes phone/email/url/length features") {
    val df = runDF(
      """select 'reach me at bob@example.com or 13912345678, see https://x.io/a now' as doc as fe_in;
        |run fe_in as FeatureExtractInPlace.`` as fe_out;
        |select phone, email, url, length, blank_percent from fe_out as out;""".stripMargin)
    val r = df.head()
    assert(r.getInt(0) == 1 && r.getInt(1) == 1 && r.getInt(2) == 1)
    assert(r.getInt(3) > 40 && r.getDouble(4) > 0)
  }

  test("RawSimilarInPlace assigns one __group__ per near-dup cluster") {
    val df = runDF(
      s"""load parquet.`$sf/documents.parquet` as rs_docs;
         |run rs_docs as RawSimilarInPlace.`` where threshold="0.8" as rs_out;
         |select doc_id, __group__ from rs_out as out;""".stripMargin)
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.nonEmpty)
    // groups are labeled by their min member
    assert(rows.forall { case (id, g) => g <= id })
    // at least one real cluster exists in the fixture, and singletons keep their id
    assert(rows.exists { case (id, g) => g < id })
    assert(rows.exists { case (id, g) => g == id })
  }

  test("ReduceFeaturesInPlace reduces vector dimensionality via PCA") {
    val df = runDF(
      """select vec_dense(array(1.0, 2.0, 3.0, 4.0)) as features
        |union all select vec_dense(array(2.0, 3.0, 4.0, 5.0)) as features
        |union all select vec_dense(array(5.0, 4.0, 3.0, 1.0)) as features
        |as rf_in;
        |run rf_in as ReduceFeaturesInPlace.`` where k="2" as rf_out;
        |select features from rf_out as out;""".stripMargin)
    val vecs = df.collect().map(_.getAs[org.apache.spark.ml.linalg.Vector](0))
    assert(vecs.length == 3 && vecs.forall(_.size == 2))
  }

  test("!resource reports local-mode compute; resize refused clearly") {
    val df = runDF("!resource;")
    val r = df.head()
    assert(r.getString(0).startsWith("local"))
    assert(r.getString(1).toInt > 0)
    val e = intercept[IllegalArgumentException] {
      runDF("""run command as EngineResource.`` where cpus="8" as r2;""")
    }
    assert(e.getMessage.contains("local-mode"))
  }

  test("TreeBuildExt: roots, heights, transitive descendants (reference fixture)") {
    val script =
      """set treedata = '''{"id":0,"parentId":null}
        |{"id":1,"parentId":null}
        |{"id":2,"parentId":1}
        |{"id":3,"parentId":1}
        |{"id":7,"parentId":0}
        |{"id":199,"parentId":1}''';
        |load jsonStr.`treedata` as tree_in;
        |""".stripMargin
    // treePerRow: one row per root (the reference spec asserts count == 2)
    val roots = runDF(script +
      """run tree_in as TreeBuildExt.`` where idCol="id" and parentIdCol="parentId" as r1;
        |select id, level, children from r1 order by id as out;""".stripMargin).collect()
    assert(roots.length == 2)
    val byId = roots.map(r => r.getString(0) -> r).toMap
    assert(byId("0").getInt(1) == 1 && byId("0").getSeq[String](2).toSet == Set("7"))
    assert(byId("1").getInt(1) == 1 && byId("1").getSeq[String](2).toSet == Set("2", "3", "199"))
    // nodeTreePerRow: every node, leaves at level 0 with no descendants
    val nodes = runDF(script +
      """run tree_in as TreeBuildExt.`` where idCol="id" and parentIdCol="parentId"
        |  and treeType="nodeTreePerRow" as r2;
        |select id, level, children from r2 order by id as out;""".stripMargin).collect()
    assert(nodes.length == 6)
    val n = nodes.map(r => r.getString(0) -> r).toMap
    assert(n("2").getInt(1) == 0 && n("2").getSeq[String](2).isEmpty)
    // deep chain exercises the iterative propagation
    val deep = runDF(
      """set chain = '''{"id":1,"pid":null}
        |{"id":2,"pid":1}
        |{"id":3,"pid":2}
        |{"id":4,"pid":3}
        |{"id":5,"pid":4}''';
        |load jsonStr.`chain` as chain_in;
        |run chain_in as TreeBuildExt.`` where idCol="id" and parentIdCol="pid" as r3;
        |select id, level, children from r3 as out;""".stripMargin).head()
    assert(deep.getInt(1) == 4 && deep.getSeq[String](2).toSet == Set("2", "3", "4", "5"))
  }

  test("CorpusExplainInPlace returns the label distribution") {
    val df = runDF(
      """select explode(array('a','a','a','b')) as lbl as ce_in;
        |run ce_in as CorpusExplainInPlace.`` where labelCol="lbl" as ce_out;
        |select lbl, labelCount, weight, percent, total from ce_out order by lbl as out;""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(1) == 3 && math.abs(rows(0).getDouble(3) - 0.75) < 1e-9)
    assert(rows(1).getDouble(2) == 4.0 && rows(1).getLong(4) == 4)
  }

  test("mlsqlConf / unStructured / model sources") {
    val conf = runDF("load mlsqlConf.`spark.sql.shuffle` as c; select * from c as out;")
    assert(conf.collect().exists(r => r.getString(0) == "spark.sql.shuffle.partitions"))
    val dir = java.nio.file.Files.createTempDirectory("graft_unst")
    java.nio.file.Files.write(dir.resolve("a.txt"), "line one\nline two".getBytes)
    java.nio.file.Files.write(dir.resolve("b.txt"), "solo".getBytes)
    val un = runDF(s"load unStructured.`$dir` as u; select file, content from u as out;")
    val byFile = un.collect().map(r => r.getString(0).split("/").last -> r.getString(1)).toMap
    assert(byFile("a.txt") == "line one\nline two" && byFile("b.txt") == "solo")
    // model is the reference's short name for the modelParams surface
    val mp = java.nio.file.Files.createTempDirectory("graft_model").toString
    runDF(
      s"""set td2 = '''{"a":1.0,"label":0.0}
         |{"a":2.0,"label":1.0}''';
         |load jsonStr.`td2` as tdt2;
         |select vec_dense(array(a)) as features, label from tdt2 as m_train;
         |train m_train as LogisticRegressor.`$mp` as ts2;""".stripMargin)
    val m = runDF(s"load model.`$mp` as mm; select class from mm as out;")
    assert(m.head().getString(0).contains("LogisticRegression"))
  }

  test("RepartitionExt aliases TableRepartition") {
    val df = runDF(
      s"""load parquet.`$sf/region.parquet` as rext_in;
         |run rext_in as RepartitionExt.`` where partitionNum="3" as rext_out;""".stripMargin)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 5)
  }
}
