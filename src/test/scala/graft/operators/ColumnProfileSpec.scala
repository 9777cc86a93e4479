package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.profile.ColumnProfile

class ColumnProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture = {
    import spark.implicits._
    Seq((1L, Some(2.5), "b"), (2L, None, "a"), (3L, Some(7.5), "c"),
      (3L, Some(2.5), null.asInstanceOf[String]))
      .toDF("id", "x", "s")
  }

  test("one row per column with typed extrema and counts") {
    val out = ColumnProfile.profile(fixture, Seq("id", "x", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("id", "x", "s"))
    val id = out("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 0L && id.getLong(3) == 3L)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 3.0)
    assert(id.isNullAt(6) && id.isNullAt(7))
    val x = out("x")
    assert(x.getLong(2) == 1L && x.getLong(3) == 2L)
    assert(x.getDouble(4) == 2.5 && x.getDouble(5) == 7.5)
    val s = out("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 3L)
    assert(s.isNullAt(4) && s.getString(6) == "a" && s.getString(7) == "c")
  }

  test("approx mode still produces a row per column without Expand") {
    val out = ColumnProfile.profile(fixture, Seq("id", "s"), exact = false)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Expand"), s"approx mode must not Expand:\n$plan")
    assert(out.collect().length == 2)
  }

  test("exact multi-distinct goes through Expand (the documented trade)") {
    val plan = ColumnProfile.profile(fixture, Seq("id", "x", "s"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Expand"))
  }
}
