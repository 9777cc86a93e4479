package graft.ets

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.dsl.ScriptRunner

/** ML ET train/predict/register round-trips on tiny deterministic data
  * (reference test style: tech/mlsql/test/dsl/DslSpec.scala "train or run").
  */
class MlETSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def runDF(script: String) = ScriptRunner.runToDF(script, spark)
  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def trainData(): Unit = runDF(
    """set traindata = '''{"a":1.0,"b":1.0,"label":0.0}
      |{"a":1.2,"b":0.9,"label":0.0}
      |{"a":0.8,"b":1.1,"label":0.0}
      |{"a":1.1,"b":1.3,"label":0.0}
      |{"a":8.0,"b":9.0,"label":1.0}
      |{"a":8.2,"b":9.1,"label":1.0}
      |{"a":7.8,"b":8.9,"label":1.0}
      |{"a":8.1,"b":9.3,"label":1.0}''';
      |load jsonStr.`traindata` as raw;
      |select vec_dense(array(a, b)) as features, label from raw as mltrain;""".stripMargin)

  test("LogisticRegressor: train -> predict -> register UDF") {
    trainData()
    val path = tmp("graft_lr")
    val df = runDF(
      s"""train mltrain as LogisticRegressor.`$path` where maxIter="20" as tstatus;
         |predict mltrain as LogisticRegressor.`$path` as preds;
         |select features, label, prediction from preds as out;""".stripMargin)
    val rows = df.collect()
    assert(rows.forall(r => r.getDouble(1) == r.getDouble(2)))
    val df2 = runDF(
      s"""register LogisticRegressor.`$path` as lr_predict;
         |select lr_predict(features) as p from mltrain as out;""".stripMargin)
    assert(df2.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 1.0))
  }

  test("RandomForest classifier round-trip") {
    trainData()
    val path = tmp("graft_rf")
    val df = runDF(
      s"""train mltrain as RandomForest.`$path` where numTrees="5" and seed="42" and bootstrap="false" as ts;
         |predict mltrain as RandomForest.`$path` as preds;
         |select label, prediction from preds as out;""".stripMargin)
    assert(df.collect().forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("KMeans: train, register cluster-assign UDF") {
    trainData()
    val path = tmp("graft_km")
    val df = runDF(
      s"""train mltrain as KMeans.`$path` where k="2" and seed="1" as ts;
         |register KMeans.`$path` as km_assign;
         |select km_assign(features) as c from mltrain as out;""".stripMargin)
    val cs = df.collect().map(_.getInt(0)).toSeq
    assert(cs.toSet.size == 2 && cs.take(4).toSet.size == 1 && cs.drop(4).toSet.size == 1)
  }

  test("StringIndex fit/transform via predict") {
    val path = tmp("graft_si")
    val df = runDF(
      s"""set sidata = '''{"cat":"x"}
         |{"cat":"y"}
         |{"cat":"x"}''';
         |load jsonStr.`sidata` as sit;
         |train sit as StringIndex.`$path` where inputCol="cat" and outputCol="cat_idx" as ts;
         |predict sit as StringIndex.`$path` as indexed;
         |select cat, cat_idx from indexed as out;""".stripMargin)
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("x") == 0.0 && m("y") == 1.0)
  }

  test("TfIdfInPlace adds a tfidf vector column") {
    val df = runDF(
      s"""load parquet.`/root/testdata/sf0.001/documents.parquet` as docs;
         |select doc_id, text from docs where doc_id < 20 as dsmall;
         |run dsmall as TfIdfInPlace.`` where inputCol="text" and numFeatures="1024" as tfidf;""".stripMargin)
    assert(df.columns.contains("text_tfidf"))
    assert(df.count() > 0)
  }

  test("ScalerInPlace + NormalizeInPlace") {
    trainData()
    val df = runDF(
      s"""run mltrain as ScalerInPlace.`` where inputCol="features" as scaled;
         |run scaled as NormalizeInPlace.`` where inputCol="features" as normed;""".stripMargin)
    assert(df.columns.contains("features_scaled") && df.columns.contains("features_norm"))
  }

  test("ConfusionMatrix pivots actual x predicted") {
    val df = runDF(
      """set cmdata = '''{"actual":"a","predicted":"a"}
        |{"actual":"a","predicted":"b"}
        |{"actual":"b","predicted":"b"}
        |{"actual":"b","predicted":"b"}''';
        |load jsonStr.`cmdata` as cmt;
        |run cmt as ConfusionMatrix.`` where actualCol="actual" and predictCol="predicted" as cm;""".stripMargin)
    val rows = df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("a") == (1L, 1L) && rows("b") == (0L, 2L))
  }

  test("PageRank over an edge table") {
    val df = runDF(
      """set edges = '''{"source":1,"target":2}
        |{"source":2,"target":3}
        |{"source":3,"target":1}
        |{"source":1,"target":3}''';
        |load jsonStr.`edges` as et;
        |run et as PageRank.`` as ranks;
        |select vertex, pagerank from ranks order by vertex as out;""".stripMargin)
    assert(df.count() == 3)
    assert(df.collect().forall(_.getDouble(1) > 0))
  }

  test("RowMatrix column similarities") {
    trainData()
    val df = runDF(
      """run mltrain as RowMatrix.`` where inputCol="features" as sims;""")
    assert(df.columns.toSeq == Seq("i", "j", "sim"))
    assert(df.count() == 1) // 2 feature columns -> 1 pair
  }

  test("Word2VecInPlace embeds text") {
    val df = runDF(
      """set w2vdata = '''{"text":"spark makes big data simple"}
        |{"text":"big data needs spark"}''';
        |load jsonStr.`w2vdata` as wt;
        |run wt as Word2VecInPlace.`` where inputCol="text" and vectorSize="8" as emb;""".stripMargin)
    assert(df.columns.contains("text_w2v"))
  }
}
