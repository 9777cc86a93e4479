package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.stats.CorpusStats
import graft.sources.VParquet

class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def summaries(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("two incremental batches reproduce the whole-corpus stats") {
    import org.apache.spark.sql.functions.col
    val state = Files.createTempDirectory("cstats").toString + "/state"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (b1, b2) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    CorpusStats.update(b1, Seq("doc_id", "lang"), state, Some("b1"))
    val out = summaries(
      CorpusStats.update(b2, Seq("doc_id", "lang"), state, Some("b2")))
    val n = docs.count()
    val langs = docs.select("lang").distinct().count()
    // lang's tiny cardinality keeps its sketch in exact mode; doc_id's
    // ~500 distincts cross into estimation (~±2 %)
    assert(out("lang") == ((n, n, langs)))
    val (r, nn, est) = out("doc_id")
    assert(r == n && nn == n)
    assert(math.abs(est - n) <= n / 50.0, s"estimate $est vs exact $n")
  }

  test("re-submitting an applied batchId is a storage-level no-op") {
    import spark.implicits._
    val state = Files.createTempDirectory("cstats").toString + "/state"
    val batch = Seq((1L, "en"), (2L, "de"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "lang")
    val first = summaries(
      CorpusStats.update(batch, Seq("doc_id", "lang"), state, Some("day1")))
    assert(first("lang") == ((3L, 2L, 2L)), "null is uncounted in nonnull/distinct")
    val v = VParquet.latestVersion(spark, state)
    val again = summaries(
      CorpusStats.update(batch, Seq("doc_id", "lang"), state, Some("day1")))
    assert(again == first, "duplicate batch must not double-count")
    assert(VParquet.latestVersion(spark, state) == v, "no new commit")
  }

  test("drift between state versions reports what a batch added") {
    import spark.implicits._
    val state = Files.createTempDirectory("cstats").toString + "/state"
    CorpusStats.update(Seq((1L, "en"), (2L, "en")).toDF("doc_id", "lang"),
      Seq("doc_id", "lang"), state, Some("b1"))
    val v1 = VParquet.latestVersion(spark, state).get
    CorpusStats.update(Seq((3L, "de"), (4L, "en")).toDF("doc_id", "lang"),
      Seq("doc_id", "lang"), state, Some("b2"))
    val d = CorpusStats.drift(spark, state, fromVersion = v1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(d("doc_id") == ((2L, 2L, 2L)))
    assert(d("lang") == ((2L, 2L, 1L)), "only 'de' is new to the lang column")
  }

  test("DSL surface: train ... as CorpusStats.`path`") {
    val state = Files.createTempDirectory("cstats").toString + "/state"
    val df = graft.dsl.ScriptRunner.runToDF(
      s"""load parquet.`$sf/documents.parquet` as cs_in;
         |train cs_in as CorpusStats.`$state` where cols="source" as cs_sum;
         |select * from cs_sum as out;""".stripMargin, spark)
    val row = df.collect().head
    assert(row.getString(0) == "source" && row.getLong(3) > 0)
  }
}
