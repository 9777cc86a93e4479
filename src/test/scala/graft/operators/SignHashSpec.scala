package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.similarity.SignHash

class SignHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sign bits pack into the two 32-bit words; zeros count as negative") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, -1.0f, 1.0f, -1.0f)),     // bits 0,2 -> w0 = 5
      (2L, Array.fill(64)(1.0f)),                // all 64 -> both words full
      (3L, Array(0.0f, 2.0f))                    // zero is NOT positive -> bit 1 only
    ).toDF("id", "v")
    val out = SignHash.signPack(df, "v").collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("w0"), r.getAs[Long]("w1"))).toMap
    assert(out(1L) == ((5L, 0L)))
    assert(out(2L) == ((0xFFFFFFFFL, 0xFFFFFFFFL)))
    assert(out(3L) == ((2L, 0L)))
  }

  test("hamming candidates then exact cosine re-rank (hand case)") {
    import spark.implicits._
    val corpus = Seq(
      (10L, Array(1.0f, 1.0f, -1.0f, -1.0f)),    // ham to q: 2, cos 0
      (20L, Array(1.0f, -1.0f, 1.0f, 1.0f))      // ham to q: 1, cos 0.5
    ).toDF("vec_id", "embedding")
    val q = Seq((1L, Array(1.0f, -1.0f, 1.0f, -1.0f)))
      .toDF("qid", "qv")
    val out = SignHash.topK(corpus, q, "vec_id", "embedding", "qid", "qv",
        k = 2, rerank = 2)
      .orderBy("nrank").collect()
      .map(r => (r.getAs[Int]("nrank"), r.getAs[Long]("neighbor"),
        r.getAs[Int]("ham"), r.getAs[Double]("sim")))
    assert(out.toSeq == Seq((1, 20L, 1, 0.5), (2, 10L, 2, 0.0)))
  }

  test("dims > 64 pack fully: differences past dim 64 reach the sketch") {
    import spark.implicits._
    // identical on dims 0..63, opposite signs on dims 64..95 — the
    // pre-r15 two-word sketch saw ham = 0 here (silent prefix; ADVICE r14)
    val a = Array.tabulate(96)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val b = a.clone(); (64 until 96).foreach(i => b(i) = -a(i))
    val df = Seq((1L, a), (2L, b)).toDF("id", "v")
    val packed = SignHash.signPack(df, "v", dims = 96).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("w0"), r.getAs[Long]("w1"), r.getAs[Long]("w2"))).toMap
    assert(packed(1L)._1 == packed(2L)._1 && packed(1L)._2 == packed(2L)._2)
    assert(packed(1L)._3 != packed(2L)._3, "w2 must capture dims 64..95")
    val corpus = Seq((10L, a)).toDF("vec_id", "embedding")
    val q = Seq((1L, b)).toDF("qid", "qv")
    val out = SignHash.topK(corpus, q, "vec_id", "embedding", "qid", "qv",
      k = 1, rerank = 1, dims = 96).collect()(0)
    assert(out.getAs[Int]("ham") == 32, "all 32 signs on dims 64..95 flip")
  }

  test("the dims bound is explicit: packing ignores elements past dims") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(96)(1.0f))).toDF("id", "v")
    // dims=40: w1 covers bits 32..39 only, even though the vector goes on
    val r = SignHash.signPack(df, "v", dims = 40).collect()(0)
    assert(r.getAs[Long]("w0") == 0xFFFFFFFFL && r.getAs[Long]("w1") == 0xFFL)
    assertThrows[IllegalArgumentException](SignHash.signPack(df, "v", dims = 0))
  }

  test("rerank bound caps candidates before the cosine stage") {
    import spark.implicits._
    val corpus = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(8)(j => if ((i >> (j % 4) & 1) == 1) 1.0f else -1.0f))
    }.toDF("vec_id", "embedding")
    val q = Seq((100L, Array.fill(8)(1.0f))).toDF("qid", "qv")
    val out = SignHash.topK(corpus, q, "vec_id", "embedding", "qid", "qv",
      k = 3, rerank = 5).collect()
    assert(out.length == 3)
    // the exact top-k is drawn only from the 5 hamming-closest: every
    // returned ham must be <= the 5th-smallest hamming distance overall
    val hams = SignHash.signPack(corpus, "embedding")
      .select(org.apache.spark.sql.functions.expr(
        "bit_count(w0 ^ 255) + bit_count(w1 ^ 0)").cast("int")).collect()
      .map(_.getInt(0)).sorted
    assert(out.map(_.getAs[Int]("ham")).max <= hams(4))
  }
}
