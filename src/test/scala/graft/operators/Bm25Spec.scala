package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.Bm25

class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 4 docs, hand-computable stats: dl = 3, 2, 4, 3 → N = 4, avgdl = 3.0
  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, "apple banana apple"),
      (1L, "banana cherry"),
      (2L, "cherry cherry cherry date"),
      (3L, "apple date fig")
    ).toDF("doc_id", "text")
  }

  private def bm25(tf: Long, dl: Long, dfreq: Long, n: Long = 4L,
                   avgdl: Double = 3.0, k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
    idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
  }

  test("postings carry tf and dl; empty docs are absent") {
    import spark.implicits._
    val withEmpty = corpus.union(Seq((9L, "   ")).toDF("doc_id", "text"))
    val post = Bm25.postings(withEmpty, "doc_id", "text").collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("tf"), r.getAs[Int]("dl"))).toMap
    assert(post(("apple", 0L)) == (2L, 3))
    assert(post(("cherry", 2L)) == (3L, 4))
    assert(!post.keys.exists(_._2 == 9L))
  }

  test("scores match the hand-computed Okapi formula, ranked desc") {
    import spark.implicits._
    val q = Seq((100L, "apple cherry")).toDF("qid", "qtext")
    val out = Bm25.topK(corpus, q, "doc_id", "text", "qid", "qtext", k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("rank"), r.getAs[Double]("score"), r.getAs[Long]("n_hit"))).toMap
    // df(apple) = 2, df(cherry) = 2
    val exp = Map(
      0L -> bm25(2, 3, 2),               // apple only
      1L -> bm25(1, 2, 2),               // cherry only
      2L -> bm25(3, 4, 2),               // cherry only
      3L -> bm25(1, 3, 2)                // apple only
    ).map { case (k2, v) => k2 -> math.round(v * 1e6) / 1e6 }
    exp.foreach { case (id, s) =>
      assert(out(id)._2 == s, s"doc $id: got ${out(id)._2}, want $s")
    }
    assert(out.values.map(_._3).toSet == Set(1L))
    // ranking follows the rounded scores, ties impossible here
    val byRank = out.toSeq.sortBy(_._2._1).map(_._1)
    val byScore = exp.toSeq.sortBy { case (id, s) => (-s, id) }.map(_._1)
    assert(byRank == byScore)
  }

  test("repeated query terms count once; no-match queries vanish") {
    import spark.implicits._
    val q = Seq((1L, "apple apple apple"), (2L, "zebra")).toDF("qid", "qtext")
    val out = Bm25.topK(corpus, q, "doc_id", "text", "qid", "qtext", k = 10).collect()
    assert(out.forall(_.getAs[Long]("qid") == 1L))
    val s0 = out.find(_.getAs[Long]("doc_id") == 0L).get.getAs[Double]("score")
    assert(s0 == math.round(bm25(2, 3, 2) * 1e6) / 1e6)
  }

  test("k caps per query and a prebuilt index gives identical results") {
    import spark.implicits._
    val q = Seq((1L, "apple cherry date")).toDF("qid", "qtext")
    val direct = Bm25.topK(corpus, q, "doc_id", "text", "qid", "qtext", k = 2)
    assert(direct.count() == 2)
    val post = Bm25.postings(corpus, "doc_id", "text")
    val viaIndex = Bm25.topKFromIndex(post, Bm25.docFreq(post),
      Bm25.corpusStats(corpus, "text"), q, "doc_id", "qid", "qtext", k = 2)
    assert(direct.collect().toSeq.sortBy(_.getInt(1)) ==
      viaIndex.collect().toSeq.sortBy(_.getInt(1)))
  }

  test("expandQueries appends feedback terms the query lacks; no-match stays") {
    import spark.implicits._
    val q = Seq((1L, "apple"), (2L, "zebra")).toDF("qid", "qtext")
    // fbDocs=1: "apple"'s top doc is doc 0 ("apple banana apple") — the
    // only new term there is "banana"
    val out = Bm25.expandQueries(corpus, q, "doc_id", "text", "qid", "qtext",
        fbDocs = 1, fbTerms = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "apple banana")
    assert(out(2L) == "zebra")
  }

  test("property: operator equals a naive in-memory BM25 on a seeded corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val vocab = Vector("ant", "bee", "cat", "dog", "eel", "fox", "gnu", "hen")
    val docs = (0 until 40).map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")))
    val queries = (0 until 6).map(i =>
      (100L + i, Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")))
    // naive reference: direct formula over in-memory maps
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = docs.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity).view
      .mapValues(_.size).toMap
    def naive(q: String): Seq[(Long, Double)] = {
      val terms = q.split(" ").distinct.toSeq
      toks.toSeq.map { case (id, ws) =>
        val dl = ws.size.toDouble
        val s = terms.map { t =>
          val tf = ws.count(_ == t).toDouble
          if (tf == 0) 0.0
          else math.log(1 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
            tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        }.sum
        id -> math.round(s * 1e6) / 1e6
      }.filter(_._2 > 0).sortBy { case (id, s) => (-s, id) }.take(10)
    }
    val got = Bm25.topK(docs.toDF("doc_id", "text"),
        queries.toDF("qid", "qtext"), "doc_id", "text", "qid", "qtext", k = 10)
      .collect().groupBy(_.getAs[Long]("qid")).view.mapValues(
        _.sortBy(_.getAs[Int]("rank"))
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq)
      .toMap
    queries.foreach { case (qid, qtext) =>
      val exp = naive(qtext)
      assert(got.getOrElse(qid, Seq.empty) == exp,
        s"qid=$qid q='$qtext'\ngot=${got.get(qid)}\nexp=$exp")
    }
  }

  test("rrfFuse: full-outer union of lists, 1/(c+rank) sums, ties by id") {
    import spark.implicits._
    val a = Seq((1L, 1, 10L), (1L, 2, 20L)).toDF("qid", "rank", "doc_id")
    val b = Seq((1L, 1, 20L), (1L, 2, 30L)).toDF("qid", "rank", "doc_id")
    val out = Bm25.rrfFuse(Seq(a, b), "qid", "doc_id", k = 10, c = 60)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("rank"), r.getAs[Double]("rrf"), r.getAs[Int]("n_lists"))).toMap
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(out(20L) == ((1, r6(1.0 / 62 + 1.0 / 61), 2)))  // in both lists → top
    assert(out(10L) == ((2, r6(1.0 / 61), 1)))
    assert(out(30L) == ((3, r6(1.0 / 62), 1)))
  }
}
