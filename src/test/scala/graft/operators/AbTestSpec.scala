package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.stats.AbTest

class AbTestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("counts, rates and z match a hand calculation") {
    import spark.implicits._
    // A: 100 trials 30 hits; B: 100 trials 20 hits
    val df = (Seq.fill(30)(("A", true)) ++ Seq.fill(70)(("A", false)) ++
      Seq.fill(20)(("B", true)) ++ Seq.fill(80)(("B", false)))
      .toDF("variant", "ok")
    val r = AbTest.zTest(df, "variant", "ok", "A", "B").collect().head
    assert(r.getLong(0) == 100L && r.getLong(1) == 30L)
    assert(r.getLong(2) == 100L && r.getLong(3) == 20L)
    assert(r.getDouble(4) == 0.3 && r.getDouble(5) == 0.2)
    assert(r.getDouble(6) == 0.1)
    val expected = 0.1 / math.sqrt(0.25 * 0.75 * (0.01 + 0.01))
    assert(math.abs(r.getDouble(7) - expected) < 1e-6, r.getDouble(7).toString)
  }

  test("degenerate pools yield null z, other variants are ignored") {
    import spark.implicits._
    val df = Seq(("A", false), ("B", false), ("C", true)).toDF("variant", "ok")
    val r = AbTest.zTest(df, "variant", "ok", "A", "B").collect().head
    assert(r.getLong(0) == 1L && r.getLong(2) == 1L)
    assert(r.isNullAt(7), "pooled rate 0 must not divide")
  }
}
