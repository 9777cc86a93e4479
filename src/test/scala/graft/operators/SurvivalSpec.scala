package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.temporal.Survival

class SurvivalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def r6(x: Double) = math.round(x * 1e6) / 1e6

  test("textbook product-limit with censoring (Kleinbaum's toy shape)") {
    import spark.implicits._
    // durations: events at 2 (x2), 4; censored at 3 and 5
    val df = Seq((2L, 1), (2L, 1), (3L, 0), (4L, 1), (5L, 0))
      .toDF("dur", "event")
    val out = Survival.kaplanMeier(df, "dur", "event")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // t=2: n=5, d=2 -> S = 3/5 = 0.6
    // t=4: n=2 (the 4 and the 5-censored), d=1 -> S = 0.6 * 1/2 = 0.3
    assert(out(2L) == ((5L, 2L, 0.6)))
    assert(out(4L) == ((2L, 1L, 0.3)))
    assert(out.size == 2) // censor times are not curve points
  }

  test("no censoring: survival equals the empirical tail fraction") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, 1)).toDF("dur", "event")
    val out = Survival.kaplanMeier(df, "dur", "event")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    (1 to 9).foreach { t =>
      assert(out(t.toLong) == r6((10.0 - t) / 10.0), s"t=$t")
    }
    // the last event exhausts the risk set -> survival exactly 0
    assert(out(10L) == 0.0)
  }

  test("curve is non-increasing and censored-only durations vanish") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(200)((rnd.nextInt(20).toLong + 1,
      if (rnd.nextBoolean()) 1 else 0)).toDF("dur", "event")
    val out = Survival.kaplanMeier(df, "dur", "event")
      .orderBy("dur").collect()
    val s = out.map(_.getDouble(3)).toSeq
    assert(s.zip(s.drop(1)).forall { case (a, b) => b <= a + 1e-12 })
    assert(out.forall(_.getLong(2) > 0))
  }
}
