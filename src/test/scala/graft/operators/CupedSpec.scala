package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.stats.AbTest

class CupedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("perfect covariate: theta = slope, both arms adjust to the pooled mean") {
    import spark.implicits._
    // y = 10x exactly -> theta 10, rho2 1; imbalance in x explains ALL of
    // the arms' difference, so both adjusted means collapse to 25
    val units = Seq(("A", 10.0, 1.0), ("A", 20.0, 2.0),
      ("B", 30.0, 3.0), ("B", 40.0, 4.0)).toDF("variant", "y", "x")
    val out = AbTest.cuped(units, "variant", "y", "x")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toMap
    assert(out("A") == ((2L, 15.0, 25.0, 10.0, 1.0)))
    assert(out("B") == ((2L, 35.0, 25.0, 10.0, 1.0)))
  }

  test("uncorrelated covariate: theta 0, adjusted means equal raw means") {
    import spark.implicits._
    val units = Seq(("A", 10.0, 1.0), ("A", 20.0, 2.0),
      ("B", 10.0, 2.0), ("B", 20.0, 1.0)).toDF("variant", "y", "x")
    val out = AbTest.cuped(units, "variant", "y", "x")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("A") == ((15.0, 15.0, 0.0)))
    assert(out("B") == ((15.0, 15.0, 0.0)))
  }
}
