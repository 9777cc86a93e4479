package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.temporal.Scd2

class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("runs collapse, versions number changes, open row is current") {
    import spark.implicits._
    val df = Seq(
      (1L, ts(1), "bronze"), (1L, ts(2), "bronze"), // duplicate state
      (1L, ts(3), "silver"), (1L, ts(5), "gold"),
      (2L, ts(1), "bronze")).toDF("user_id", "ts", "tier")
    val out = Scd2.build(df, "user_id", "ts", Seq("tier"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getTimestamp(3), r.getTimestamp(4), r.getBoolean(5))).toMap
    assert(out((1L, 1)) == (("bronze", ts(1), ts(3), false)))
    assert(out((1L, 2)) == (("silver", ts(3), ts(5), false)))
    assert(out((1L, 3)) == (("gold", ts(5), null, true)))
    assert(out((2L, 1)) == (("bronze", ts(1), null, true)))
    assert(out.size == 4)
  }

  test("null attribute states: NULL->NULL is no change, NULL->x is one") {
    import spark.implicits._
    val df = Seq((1L, ts(1), null.asInstanceOf[String]),
      (1L, ts(2), null.asInstanceOf[String]), (1L, ts(3), "x"))
      .toDF("user_id", "ts", "tier")
    val out = Scd2.build(df, "user_id", "ts", Seq("tier"))
      .collect().map(r => r.getInt(1) -> r.getString(2)).toMap
    assert(out == Map(1 -> null, 2 -> "x"))
  }

  test("multi-attribute change detection: any attr change opens a version") {
    import spark.implicits._
    val df = Seq((1L, ts(1), "a", 10), (1L, ts(2), "a", 20), (1L, ts(3), "b", 20))
      .toDF("user_id", "ts", "x", "y")
    val out = Scd2.build(df, "user_id", "ts", Seq("x", "y")).collect()
    assert(out.length == 3)
  }
}
