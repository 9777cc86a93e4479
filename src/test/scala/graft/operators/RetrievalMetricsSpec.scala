package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.RetrievalMetrics

class RetrievalMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def r6(x: Double) = math.round(x * 1e6) / 1e6
  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("precision/recall/mrr/ndcg on a hand case") {
    import spark.implicits._
    val run = Seq((1L, 1, 10L), (1L, 2, 99L), (1L, 3, 20L))
      .toDF("qid", "rank", "doc_id")
    val qrels = Seq((1L, 10L), (1L, 20L), (1L, 30L)).toDF("qid", "doc_id")
    val m = RetrievalMetrics.evaluate(run, qrels, "qid", "doc_id", "rank", 3)
      .collect()(0)
    assert(m.getAs[Long]("n_rel") == 3L && m.getAs[Long]("n_hit") == 2L)
    assert(m.getAs[Double]("precision") == r6(2.0 / 3))
    assert(m.getAs[Double]("recall") == r6(2.0 / 3))
    assert(m.getAs[Double]("mrr") == 1.0)
    val dcg = 1.0 / log2(2) + 1.0 / log2(4)
    val idcg = 1.0 / log2(2) + 1.0 / log2(3) + 1.0 / log2(4)
    assert(m.getAs[Double]("ndcg") == r6(dcg / idcg))
  }

  test("judged query with zero hits scores zero; unjudged queries drop") {
    import spark.implicits._
    val run = Seq((1L, 1, 99L), (2L, 1, 10L)).toDF("qid", "rank", "doc_id")
    val qrels = Seq((1L, 10L)).toDF("qid", "doc_id")
    val out = RetrievalMetrics.evaluate(run, qrels, "qid", "doc_id", "rank", 5)
      .collect()
    assert(out.length == 1 && out(0).getAs[Long]("qid") == 1L)
    assert(out(0).getAs[Long]("n_hit") == 0L)
    assert(out(0).getAs[Double]("mrr") == 0.0)
    assert(out(0).getAs[Double]("ndcg") == 0.0)
    assert(out(0).getAs[Double]("recall") == 0.0)
  }

  test("rank cutoff excludes deep hits; idcg caps at k") {
    import spark.implicits._
    // 5 relevant docs but k=2: perfect top-2 must score ndcg 1.0
    val run = Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L))
      .toDF("qid", "rank", "doc_id")
    val qrels = (1 to 5).map(i => (1L, i * 10L)).toDF("qid", "doc_id")
    val m = RetrievalMetrics.evaluate(run, qrels, "qid", "doc_id", "rank", 2)
      .collect()(0)
    assert(m.getAs[Long]("n_hit") == 2L)
    assert(m.getAs[Double]("ndcg") == 1.0)
    assert(m.getAs[Double]("recall") == r6(2.0 / 5))
  }
}
