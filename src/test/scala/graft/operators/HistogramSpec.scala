package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.profile.Histogram

class HistogramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("equi-width: bin edges and counts; max lands in the last bin") {
    import spark.implicits._
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val out = Histogram.equiWidth(df, "v", 4)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out(0) == ((0.0, 25.0, 25L)))   // 0..24
    assert(out(1) == ((25.0, 50.0, 25L)))
    assert(out(2) == ((50.0, 75.0, 25L)))
    assert(out(3) == ((75.0, 100.0, 26L))) // 75..100 incl. max
  }

  test("equi-width degenerate: constant column is one bucket") {
    import spark.implicits._
    val out = Histogram.equiWidth(Seq.fill(7)(3.0).toDF("v"), "v", 5).collect()
    assert(out.length == 1 && out.head.getInt(0) == 0 && out.head.getLong(3) == 7L)
  }

  test("equi-depth: equal populations, ties stay together") {
    import spark.implicits._
    // a 4-row tie block at 9.0 sits entirely in one bucket
    val df = ((1 to 8).map(_.toDouble) ++ Seq.fill(4)(9.0)).toDF("v")
    val out = Histogram.equiDepth(df, "v", 2)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(out == Map(0 -> 6L, 1 -> 6L), out.toString)
    // dominant tie value: everything collapses into the cutoff bucket
    val dom = (Seq(1.0, 2.0) ++ Seq.fill(10)(5.0)).toDF("v")
    val out2 = Histogram.equiDepth(dom, "v", 3)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(out2 == Map(0 -> 12L), s"by-value ties must not split: $out2")
  }

  test("empty input yields empty histograms, not analysis errors") {
    import spark.implicits._
    val empty = Seq.empty[Double].toDF("v")
    assert(Histogram.equiWidth(empty, "v", 4).collect().isEmpty)
    assert(Histogram.equiDepth(empty, "v", 4).collect().isEmpty)
  }

  test("equi-depth on a uniform column yields near-equal buckets") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val out = Histogram.equiDepth(df, "v", 4)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(out.size == 4 && out.values.forall(n => n == 250L), out.toString)
  }
}
