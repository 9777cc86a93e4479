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
