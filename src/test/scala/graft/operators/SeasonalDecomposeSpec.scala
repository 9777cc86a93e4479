package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.temporal.SeasonalDecompose

class SeasonalDecomposeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** linear trend + exact seasonal pattern → residual must be exactly 0
    * wherever the trend window is complete.
    */
  private def series(s: Seq[Double], n: Int) = {
    import spark.implicits._
    (0 until n).map(t => ("a", t.toLong, 10.0 + t + s(t % s.length)))
      .toDF("k", "t", "v0")
  }

  test("even period: 2xMA recovers linear trend, per-phase means the pattern, resid 0") {
    val s = Seq(4.0, -2.0, 6.0, 0.0) // mean 2
    val out = SeasonalDecompose.decompose(series(s, 24), "k", "t", "v0", 4)
      .collect().map(r => r.getAs[Long]("t") ->
        (r.getAs[Any]("trend"), r.getAs[Any]("seasonal"), r.getAs[Any]("resid"))).toMap
    // edges: h=2 → t=0,1 and t=22,23 have no full window
    for (t <- Seq(0L, 1L, 22L, 23L)) assert(out(t)._1 == null, s"t=$t trend")
    for (t <- 2L to 21L) {
      val (tr, se, re) = out(t)
      // MA of (10+t) is 10+t; MA of the seasonal adds its mean 2
      assert(tr == 10.0 + t + 2.0, s"t=$t trend=$tr")
      assert(se == s((t % 4).toInt) - 2.0, s"t=$t seasonal=$se")
      assert(re == 0.0, s"t=$t resid=$re")
    }
  }

  test("odd period: plain centered mean, resid 0") {
    val s = Seq(3.0, 0.0, 6.0) // mean 3
    val out = SeasonalDecompose.decompose(series(s, 18), "k", "t", "v0", 3)
      .collect().map(r => r.getAs[Long]("t") ->
        (r.getAs[Any]("trend"), r.getAs[Any]("resid"))).toMap
    assert(out(0L)._1 == null && out(17L)._1 == null)
    for (t <- 1L to 16L) {
      assert(out(t)._1 == 10.0 + t + 3.0, s"t=$t")
      assert(out(t)._2 == 0.0, s"t=$t resid")
    }
  }

  test("a gap nulls the trend of every row whose window spans it") {
    val df = series(Seq(1.0, 2.0), 12).filter("t <> 6")
    val out = SeasonalDecompose.decompose(df, "k", "t", "v0", 2)
      .collect().map(r => r.getAs[Long]("t") -> r.getAs[Any]("trend")).toMap
    // h=1: windows of t=5 and t=7 span the hole at 6
    assert(out(5L) == null && out(7L) == null)
    assert(out(4L) != null && out(8L) != null)
  }

  test("multiple keys decompose independently") {
    import spark.implicits._
    val df = (0 until 12).flatMap(t => Seq(
      ("a", t.toLong, 5.0 + (t % 3)), ("b", t.toLong, 50.0 + (t % 3)))).toDF("k", "t", "v0")
    val out = SeasonalDecompose.decompose(df, "k", "t", "v0", 3)
      .filter("t = 5").collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Double]("trend")).toMap
    assert(out("a") == 6.0 && out("b") == 51.0)
  }
}
