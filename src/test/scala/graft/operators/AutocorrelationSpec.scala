package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.temporal.Autocorrelation

class AutocorrelationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a period-4 square wave peaks at lag 4 with r = 1") {
    import spark.implicits._
    val df = (0 until 40).map(t => ("a", t.toLong,
      if (t % 4 < 2) 10.0 else 2.0)).toDF("k", "t", "v")
    val out = Autocorrelation.acf(df, "k", "t", "v", maxLag = 6)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(out(4) == 1.0, out.toString)
    assert(out(2) == -1.0) // half-period anti-correlates
    assert(out(1) < 1.0 && out(3) < 1.0)
  }

  test("gaps shrink the overlap count instead of mispairing") {
    import spark.implicits._
    val df = Seq(("a", 0L, 1.0), ("a", 1L, 2.0), ("a", 3L, 4.0), ("a", 4L, 5.0))
      .toDF("k", "t", "v")
    val out = Autocorrelation.acf(df, "k", "t", "v", maxLag = 1)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    // lag-1 pairs: (0,1) and (3,4) only — t=1->t=2 does not exist
    assert(out == Set((1, 2L)))
  }

  test("ccf: a shifted copy peaks at its shift, sign convention A-leads-B") {
    import spark.implicits._
    // B is A delayed by 3 steps -> corr(A_t, B_{t+3}) = 1 at lag +3
    val a = (0 until 30).map(t => (t.toLong, ((t * 7) % 5 + 1).toDouble)).toDF("t", "x")
    val b = (0 until 30).map(t =>
      (t.toLong, if (t >= 3) (((t - 3) * 7) % 5 + 1).toDouble else 0.0)).toDF("t", "y")
    val out = Autocorrelation.ccf(a, b, "t", "x", "y", maxLag = 5)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out(3) == 1.0, out.toString)
    assert(out.filterKeys(_ != 3).values.forall(_ < 1.0))
  }

  test("constant overlap yields null r, not NaN") {
    import spark.implicits._
    val df = (0 until 10).map(t => ("a", t.toLong, 5.0)).toDF("k", "t", "v")
    val out = Autocorrelation.acf(df, "k", "t", "v", maxLag = 2).collect()
    assert(out.nonEmpty && out.forall(_.isNullAt(3)))
  }
}
