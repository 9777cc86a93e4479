package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.stats.DistDrift

class DistDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def side(aVals: Seq[Double], bVals: Seq[Double]) = {
    import spark.implicits._
    (aVals.map(("a", _)) ++ bVals.map(("b", _))).toDF("side", "v")
  }

  test("ks: exact statistic on hand cases") {
    val m = DistDrift.ks(side(Seq(1, 2, 3), Seq(2, 3, 4)), "side", "v", "a", "b")
      .collect()(0)
    // ECDF gap constant 1/3 across the merged axis
    assert(m.getAs[Long]("n_a") == 3L && m.getAs[Long]("n_b") == 3L)
    assert(m.getAs[Long]("d_num") == 3L)
    assert(m.getAs[Double]("d") == 0.333333)
    // identical samples: D = 0; disjoint supports: D = 1
    assert(DistDrift.ks(side(Seq(1, 2), Seq(1, 2)), "side", "v", "a", "b")
      .collect()(0).getAs[Double]("d") == 0.0)
    assert(DistDrift.ks(side(Seq(1, 2), Seq(3, 4)), "side", "v", "a", "b")
      .collect()(0).getAs[Double]("d") == 1.0)
  }

  test("ks: a missing side yields a null statistic, never a 0/0 NaN") {
    val m = DistDrift.ks(side(Seq(1, 2), Seq.empty), "side", "v", "a", "b")
      .collect()(0)
    assert(m.getAs[Long]("n_b") == 0L)
    assert(m.isNullAt(m.fieldIndex("d")))
  }

  test("psi: zero for identical distributions, large for disjoint ones") {
    val same = Seq.tabulate(100)(i => (i % 10).toDouble + 1)
    assert(DistDrift.psi(side(same, same), "side", "v", "a", "b")
      .collect()(0).getAs[Double]("psi") == 0.0)
    val shifted = DistDrift.psi(
      side(Seq.fill(100)(1.0), Seq.fill(100)(9.0)), "side", "v", "a", "b")
      .collect()(0)
    assert(shifted.getAs[Double]("psi") > 1.0, shifted.toString)
  }

  test("psiBuckets: exact integer bucketing over the pooled cents range") {
    val det = DistDrift.psiBuckets(
        side(Seq.fill(4)(1.0), Seq.fill(6)(9.0)), "side", "v", "a", "b",
        nBuckets = 10)
      .collect().map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("c_a"), r.getAs[Long]("c_b"))).toMap
    // lo=100 hi=900: 1.0 -> bucket 0, 9.0 -> (800*10) div 801 = 9
    assert(det == Map(0L -> ((4L, 0L)), 9L -> ((0L, 6L))))
  }
}
