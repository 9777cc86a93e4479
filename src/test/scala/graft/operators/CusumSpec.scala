package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.temporal.Cusum

class CusumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(xs: Seq[Double], target: Double, slack: Double,
                  h: Double): Seq[(Double, Double, Boolean)] = {
    import spark.implicits._
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("key", "id", "v")
    Cusum.detect(df, "key", "id", "id", "v", target, slack, h)
      .orderBy("id").collect()
      .map(r => (r.getAs[Double]("s_pos"), r.getAs[Double]("s_neg"),
        r.getAs[Boolean]("alarm"))).toSeq
  }

  test("closed form equals the textbook recurrence (hand case)") {
    // x: 10 10 15 16, mu=10, k=1 -> d: -1 -1 4 5 -> s+: 0 0 4 9
    val out = run(Seq(10, 10, 15, 16), 10.0, 1.0, 8.0)
    assert(out.map(_._1) == Seq(0.0, 0.0, 4.0, 9.0))
    assert(out.map(_._2) == Seq(0.0, 0.0, 0.0, 0.0))
    assert(out.map(_._3) == Seq(false, false, false, true))
  }

  test("downward drift accumulates on the negative side and resets") {
    // mu=10, k=0.5: e = mu-k-x ; x: 9 9 12 9 -> e: 0.5 0.5 -2.5 0.5
    // E: .5 1.0 -1.5 -1.0; runmin(0,E): 0 0 -1.5 -1.5 -> s-: .5 1 0 .5
    val out = run(Seq(9, 9, 12, 9), 10.0, 0.5, 3.0)
    assert(out.map(_._2) == Seq(0.5, 1.0, 0.0, 0.5))
    assert(out.forall(!_._3))
  }

  test("a small persistent shift fires even when no single point is extreme") {
    // mu=10, k=0.1, h=2: constant 10.4 -> s+ grows by 0.3/row, alarms at row 7
    val out = run(Seq.fill(10)(10.4), 10.0, 0.1, 2.0)
    assert(out.map(_._1).last == 3.0)
    assert(out.indexWhere(_._3) == 6) // s+ = 0.3*(i+1) = 2.1 > 2 at the 7th row
  }

  test("matching the brute-force recurrence on a seeded random series") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(60)(math.round(rnd.nextGaussian() * 300 + 1000) / 100.0)
    val (mu, k) = (10.0, 0.25)
    var sp = 0.0; var sn = 0.0
    val exp = xs.map { x =>
      sp = math.max(0.0, sp + (x - mu - k))
      sn = math.max(0.0, sn + (mu - k - x))
      (math.round(sp * 100) / 100.0, math.round(sn * 100) / 100.0)
    }
    val out = run(xs, mu, k, 5.0)
    assert(out.map(o => (o._1, o._2)) == exp)
  }

  test("keys scan independently; alarms() keeps only alarm rows") {
    import spark.implicits._
    val df = Seq(("a", 0L, 20.0), ("b", 0L, 10.0), ("a", 1L, 20.0))
      .toDF("key", "id", "v")
    val out = Cusum.alarms(df, "key", "id", "id", "v", 10.0, 1.0, 10.0)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out == Set(("a", 1L))) // a: s+ = 9 then 18; b never
  }
}
