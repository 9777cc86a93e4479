package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.TestSpark
import graft.operators.text.{Bm25, Bm25Index}

class Bm25IndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp() =
    java.nio.file.Files.createTempDirectory("bm25idx").toString + "/idx"

  private def docs(ids: Range, words: Seq[String]) = {
    import spark.implicits._
    ids.map(i => (i.toLong,
      (0 to i % 4).map(j => words((i + j) % words.length)).mkString(" ")))
      .toDF("doc_id", "text")
  }

  private val words = Seq("apple", "banana", "cherry", "date", "fig", "grape")

  private def queries = {
    import spark.implicits._
    Seq((1L, "apple cherry"), (2L, "grape date fig")).toDF("qid", "qtext")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("two-batch ingest serves the same top-k as the one-shot operator") {
    val path = tmp()
    val b1 = docs(0 until 40, words)
    val b2 = docs(40 until 90, words)
    Bm25Index.ingest(b1, "doc_id", "text", path)
    Bm25Index.ingest(b2, "doc_id", "text", path)
    val fromIndex = Bm25Index.topK(spark, path, queries, "qid", "qtext", k = 7)
    val oneShot = Bm25.topK(b1.unionByName(b2), queries,
      "doc_id", "text", "qid", "qtext", k = 7)
    assert(sortedRows(fromIndex) == sortedRows(oneShot))
  }

  test("a term-less query set returns an empty result, not an error") {
    import spark.implicits._
    val path = tmp()
    Bm25Index.ingest(docs(0 until 10, words), "doc_id", "text", path)
    val empty = Seq((1L, "   ")).toDF("qid", "qtext")
    assert(Bm25Index.topK(spark, path, empty, "qid", "qtext").isEmpty)
  }

  test("re-delivered batch is skipped; a half-landed batch heals on retry") {
    val path = tmp()
    Bm25Index.ingest(docs(0 until 30, words), "doc_id", "text", path,
      txn = Some(0L), txnAppId = Some("app"))
    val before = sortedRows(Bm25Index.topK(spark, path, queries, "qid", "qtext"))
    // exact re-delivery: both tables carry the marker -> no-op
    Bm25Index.ingest(docs(0 until 30, words), "doc_id", "text", path,
      txn = Some(0L), txnAppId = Some("app"))
    assert(sortedRows(Bm25Index.topK(spark, path, queries, "qid", "qtext")) == before)
    // crash between commits: postings for batch 1 land, stats do not
    val b2 = docs(30 until 60, words)
    graft.sources.VParquet.write(
      Bm25.postings(b2, "doc_id", "text")
        .select(org.apache.spark.sql.functions.col("term"),
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("tf"),
          org.apache.spark.sql.functions.col("dl")),
      s"$path/postings", overwrite = false, txn = Some(1L), txnAppId = Some("app"),
      clusterBy = Seq("term"))
    // re-delivery of the full ingest heals the lagging stats table only
    Bm25Index.ingest(b2, "doc_id", "text", path,
      txn = Some(1L), txnAppId = Some("app"))
    val healed = Bm25Index.topK(spark, path, queries, "qid", "qtext", k = 7)
    val oneShot = Bm25.topK(docs(0 until 60, words), queries,
      "doc_id", "text", "qid", "qtext", k = 7)
    assert(sortedRows(healed) == sortedRows(oneShot))
  }

  test("maintain folds segments without changing results; term filter prunes files") {
    val path = tmp()
    (0 until 6).foreach { i =>
      Bm25Index.ingest(docs(i * 20 until (i + 1) * 20, words), "doc_id", "text",
        path, maintainEvery = 0)
    }
    val before = sortedRows(Bm25Index.topK(spark, path, queries, "qid", "qtext"))
    // the segmented (pre-merge) state: each append wrote term-clustered
    // files, so a single-term probe prunes to ~one file per segment
    import spark.implicits._
    def filesRead(df: DataFrame): Long = {
      def find(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => find(a.executedPlan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(find)
      }
      df.collect()
      find(df.queryExecution.executedPlan).head.metrics("numFiles").value
    }
    val post = graft.sources.VParquet.loadVersion(spark, s"$path/postings", None, None)
    val all = filesRead(post)
    val one = filesRead(post.filter($"term" === "apple"))
    assert(all > 1, s"segmented snapshot should hold multiple clustered files, got $all")
    assert(one < all, s"term probe read $one of $all files — no pruning")
    // segment merge: results identical (this tiny index folds to one file)
    Bm25Index.maintain(spark, path)
    assert(sortedRows(Bm25Index.topK(spark, path, queries, "qid", "qtext")) == before)
  }
}
