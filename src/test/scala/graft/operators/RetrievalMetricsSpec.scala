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

  test("property: operator equals a naive reference on seeded random runs") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val k = 5
    // 8 queries, each with a random ranked list and random judgments
    val run = (0 until 8).flatMap { q =>
      val docs = rnd.shuffle((0 until 30).toList).take(10)
      docs.zipWithIndex.map { case (d, i) => (q.toLong, i + 1, d.toLong) }
    }
    val qrels = (0 until 8).flatMap { q =>
      rnd.shuffle((0 until 30).toList).take(1 + rnd.nextInt(6))
        .map(d => (q.toLong, d.toLong))
    }
    def naive(q: Long): (Long, Long, Double, Double, Double, Double) = {
      val rel = qrels.filter(_._1 == q).map(_._2).toSet
      val top = run.filter(r => r._1 == q && r._2 <= k)
      val hits = top.filter(r => rel(r._3))
      val dcg = hits.map(h => 1.0 / log2(h._2 + 1.0)).sum
      val idcg = (1 to math.min(k, rel.size)).map(i => 1.0 / log2(i + 1.0)).sum
      val mrr = hits.map(_._2).minOption.map(1.0 / _).getOrElse(0.0)
      (rel.size.toLong, hits.size.toLong, r6(hits.size.toDouble / k),
        r6(hits.size.toDouble / rel.size), r6(mrr), r6(dcg / idcg))
    }
    val got = RetrievalMetrics.evaluate(run.toDF("qid", "rank", "doc_id"),
        qrels.toDF("qid", "doc_id"), "qid", "doc_id", "rank", k)
      .collect().map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("n_rel"), r.getAs[Long]("n_hit"),
          r.getAs[Double]("precision"), r.getAs[Double]("recall"),
          r.getAs[Double]("mrr"), r.getAs[Double]("ndcg"))).toMap
    (0L until 8L).foreach { q =>
      assert(got(q) == naive(q), s"qid=$q got=${got(q)} exp=${naive(q)}")
    }
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
