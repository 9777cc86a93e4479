package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.similarity.Mmr

class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // a and b are identical vectors (sim 1), c is orthogonal (sim 0)
  private def vectors = {
    import spark.implicits._
    Seq(
      (10L, Array(1.0f, 0.0f)),
      (20L, Array(1.0f, 0.0f)),
      (30L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
  }

  test("diversity penalty reorders relevance: orthogonal beats near-dup") {
    import spark.implicits._
    val cand = Seq((1L, 10L, 1.0), (1L, 20L, 0.8), (1L, 30L, 0.5))
      .toDF("qid", "doc_id", "rel")
    val out = Mmr.rerank(cand, vectors, "qid", "doc_id", "rel",
        "vec_id", "embedding", k = 3, lambda = 0.7)
      .collect().map(r => r.getAs[Int]("rank") ->
        (r.getAs[Long]("doc_id"), r.getAs[Double]("mmr"))).toMap
    // r1: argmax 0.7*rel → doc 10 (0.7)
    // r2: doc 20 = 0.7*0.8 − 0.3*1 = 0.26 < doc 30 = 0.35 → doc 30
    // r3: doc 20 at 0.26
    assert(out(1) == ((10L, 0.7)))
    assert(out(2) == ((30L, 0.35)))
    assert(out(3) == ((20L, 0.26)))
  }

  test("ties break by id; queries run independently; short lists exhaust") {
    import spark.implicits._
    val cand = Seq(
      (1L, 20L, 1.0), (1L, 10L, 1.0), // tie on rel → id 10 first
      (2L, 30L, 0.5)                  // only one candidate, k = 3
    ).toDF("qid", "doc_id", "rel")
    val out = Mmr.rerank(cand, vectors, "qid", "doc_id", "rel",
        "vec_id", "embedding", k = 3, lambda = 1.0)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank")) ->
        r.getAs[Long]("doc_id")).toMap
    assert(out((1L, 1)) == 10L)
    assert(out((1L, 2)) == 20L)
    assert(out((2L, 1)) == 30L)
    assert(!out.contains((2L, 2)))
    assert(out.size == 3)
  }

  test("lambda=1 is pure relevance order; candidates without vectors drop") {
    import spark.implicits._
    val cand = Seq((1L, 10L, 0.3), (1L, 30L, 0.9), (1L, 99L, 5.0))
      .toDF("qid", "doc_id", "rel") // 99 has no embedding
    val out = Mmr.rerank(cand, vectors, "qid", "doc_id", "rel",
        "vec_id", "embedding", k = 2, lambda = 1.0)
      .collect().sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id")).toSeq
    assert(out == Seq(30L, 10L))
  }
}
