package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.temporal.Twap

class TwapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("step-interpolated weighting: bursts don't over-weight") {
    import spark.implicits._
    // value 10 holds 1s, then five rapid 100s within 1s total, then 0 for 8s
    val df = (Seq((1L, ts(0), 10.0)) ++
      (0 until 5).map(i => (1L, new Timestamp(1000L + i * 200), 100.0)) ++
      Seq((1L, ts(2), 0.0), (1L, ts(10), 7.0))).toDF("k", "ts", "v")
    val out = Twap.compute(df, "k", "ts", "v").collect().head
    // weights: 10*1s + 100*1s (burst total) + 0*8s over 10s span
    assert(out.getLong(1) == 8L)
    assert(out.getDouble(2) == (10.0 * 1 + 100.0 * 1 + 0.0 * 8) / 10)
    // a plain average would say ~64 — the operator must not
    assert(math.abs(out.getDouble(2) - 64.0) > 30)
  }

  test("single sample yields null twap; keys independent") {
    import spark.implicits._
    val df = Seq((1L, ts(0), 5.0), (2L, ts(0), 1.0), (2L, ts(10), 3.0))
      .toDF("k", "ts", "v")
    val out = Twap.compute(df, "k", "ts", "v")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getAs[Any](2))).toMap
    assert(out(1L) == ((1L, null)))
    assert(out(2L) == ((2L, 1.0))) // value 1.0 held the whole span
  }

  test("equal timestamps pair deterministically via the tie column") {
    import spark.implicits._
    val df = Seq((1L, ts(0), 100.0, 2L), (1L, ts(0), 10.0, 1L), (1L, ts(5), 0.0, 3L))
      .toDF("k", "ts", "v", "eid")
    val out = Twap.compute(df, "k", "ts", "v", tieCol = Some("eid"))
      .collect().head
    // tie order 1,2: v=10 gets dt 0; v=100 holds the 5s
    assert(out.getDouble(2) == 100.0)
  }
}
