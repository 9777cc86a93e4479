package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.graph.PageRank

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("symmetric cycle keeps uniform rank exactly") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("s", "d")
    val out = PageRank.run(e, "s", "d", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // U/3 = 333333333333; base + 85*share div 100 reproduces it each step
    assert(out == Map("a" -> 333333333333L, "b" -> 333333333333L,
      "c" -> 333333333333L))
  }

  test("dangling sink: hand-computed fixed-point iteration") {
    import spark.implicits._
    // b->a, c->a; a is a sink. One iteration from uniform:
    //   dm = 333333333333, share(b)=share(c)=333333333333
    //   r'(a) = 50000000000 + 85*(666666666666 + 111111111111) div 100
    //   r'(b) = r'(c) = 50000000000 + 85*111111111111 div 100
    val e = Seq(("b", "a"), ("c", "a")).toDF("s", "d")
    val out = PageRank.run(e, "s", "d", iterations = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") == 711111111110L, out.toString)
    assert(out("b") == 144444444444L && out("c") == 144444444444L)
  }

  test("weighted: constant weights degenerate to the unweighted run bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(808)
    val edges = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(p => p._1 != p._2).distinct
    val flat = edges.map { case (s, d) => (s, d, 7L) }.toDF("s", "d", "w")
    val wr = PageRank.runWeighted(flat, "s", "d", "w", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ur = PageRank.run(edges.toDF("s", "d"), "s", "d", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // floor(r*c / (c*d)) == floor(r/d): the two recurrences coincide
    assert(wr == ur, (wr.keySet ++ ur.keySet)
      .filter(k => wr.get(k) != ur.get(k)).take(5).toString)
  }

  test("weighted: shares split by weight, duplicates add, w<=0 drops") {
    import spark.implicits._
    // 1 -> 2 (w 3), 1 -> 3 (w 1): one iteration from uniform U/3 each.
    //   sw(1)=4; share(2)=floor(r*3/4), share(3)=floor(r/4)
    val U3 = 1000000000000L / 3
    val e = Seq((1L, 2L, 2L), (1L, 2L, 1L), (1L, 3L, 1L), (1L, 3L, 0L))
      .toDF("s", "d", "w")
    val out = PageRank.runWeighted(e, "s", "d", "w", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = 15L * 1000000000000L / (100L * 3L)
    // nodes 2 and 3 are sinks: dm = 2*U/3 feeds everyone
    val dmShare = (2 * U3) / 3
    assert(out(2L) == base + 85L * (U3 * 3 / 4 + dmShare) / 100L, out.toString)
    assert(out(3L) == base + 85L * (U3 / 4 + dmShare) / 100L, out.toString)
    assert(out(1L) == base + 85L * dmShare / 100L)
  }

  test("weighted: per-node weight mass above sqrt(Long.Max) fails loudly") {
    import spark.implicits._
    val e = Seq((1L, 2L, 4000000000L)).toDF("s", "d", "w")
    val ex = intercept[IllegalArgumentException](
      PageRank.runWeighted(e, "s", "d", "w", iterations = 1))
    assert(ex.getMessage.contains("rescale"))
  }

  test("more in-links means higher rank") {
    import spark.implicits._
    // hub gets links from 3 spokes, each spoke only from hub
    val e = Seq(("x", "hub"), ("y", "hub"), ("z", "hub"),
      ("hub", "x"), ("hub", "y"), ("hub", "z")).toDF("s", "d")
    val out = PageRank.run(e, "s", "d", iterations = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("hub") > out("x") && out("x") == out("y") && out("y") == out("z"))
  }

  test("ranks sum to at most the unit mass (truncation only loses)") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c"))
      .toDF("s", "d")
    val total = PageRank.run(e, "s", "d", iterations = 4)
      .agg(org.apache.spark.sql.functions.sum("rank_fp")).head().getLong(0)
    assert(total <= 1000000000000L && total > 999999000000L)
  }
}
