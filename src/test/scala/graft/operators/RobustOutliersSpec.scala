package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.profile.RobustOutliers

class RobustOutliersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("modified z-score flags the spike, not the noise") {
    import spark.implicits._
    val vals = Seq(10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 11.0, 9.0, 500.0)
    val df = vals.map(("a", _)).toDF("k", "v")
    val out = RobustOutliers.summary(df, "k", "v").collect().head
    assert(out.getLong(1) == 9L)
    assert(out.getDouble(2) == 10.0)      // median
    // deviations sorted: 0,0,0.5,0.5,1,1,1,1,490 -> median 1.0
    assert(out.getDouble(3) == 1.0)
    assert(out.getLong(4) == 1L)          // only the 500
  }

  test("outlier burst cannot mask itself (breakdown robustness)") {
    import spark.implicits._
    // 3 of 10 points wild: mean/std would swallow them, MAD does not
    val vals = Seq(10.0, 10.0, 10.0, 10.5, 9.5, 10.0, 10.5, 300.0, 310.0, 305.0)
    val df = vals.map(("a", _)).toDF("k", "v")
    val out = RobustOutliers.summary(df, "k", "v").collect().head
    assert(out.getLong(4) == 3L, out.toString)
  }

  test("zero MAD flags nothing; groups independent") {
    import spark.implicits._
    val df = (Seq.fill(5)(("c", 7.0)) ++ Seq(("c", 9999.0)) ++
      Seq(("d", 1.0), ("d", 2.0), ("d", 3.0))).toDF("k", "v")
    val out = RobustOutliers.summary(df, "k", "v")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out("c") == 0L, "MAD=0 group is degenerate, no flags")
    assert(out("d") == 0L)
  }
}
