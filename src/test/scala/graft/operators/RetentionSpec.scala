package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.temporal.{Retention, Transitions}

class RetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(day: Int) = new Timestamp(day * 86400L * 1000L)

  test("retention matrix: cohorts by first period, distinct users per offset") {
    import spark.implicits._
    val df = Seq(
      (1L, ts(0)), (1L, ts(1)), (1L, ts(1)), (1L, ts(3)), // cohort 0, offsets 0,1,3
      (2L, ts(0)), (2L, ts(2)),                           // cohort 0, offsets 0,2
      (3L, ts(1)), (3L, ts(2)),                           // cohort 1, offsets 0,1
      (4L, ts(1))                                         // cohort 1, offset 0
    ).toDF("user_id", "ts")
    val out = Retention.matrix(df, "user_id", "ts", 86400L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out((0L, 0L)) == ((2L, 1.0)))
    assert(out((0L, 1L)) == ((1L, 0.5))) // only user 1 back on day 1
    assert(out((0L, 2L)) == ((1L, 0.5)))
    assert(out((0L, 3L)) == ((1L, 0.5)))
    assert(out((1L, 0L)) == ((2L, 1.0)))
    assert(out((1L, 1L)) == ((1L, 0.5)))
    assert(out.size == 6)
  }

  test("duplicate same-period events count a user once") {
    import spark.implicits._
    val df = Seq((1L, ts(0)), (1L, new Timestamp(3600L * 1000L))).toDF("user_id", "ts")
    val out = Retention.matrix(df, "user_id", "ts", 86400L).collect()
    assert(out.length == 1 && out.head.getLong(2) == 1L)
  }

  test("transition matrix: adjacent pairs per user, row-normalized") {
    import spark.implicits._
    val df = Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(1), 2L, "b"), (1L, ts(2), 3L, "a"),
      (2L, ts(0), 4L, "a"), (2L, ts(1), 5L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Transitions.matrix(df, "user_id", "ts", "event_type", Some("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // from a: ->b once, ->c once; from b: ->a once
    assert(out(("a", "b")) == ((1L, 0.5)))
    assert(out(("a", "c")) == ((1L, 0.5)))
    assert(out(("b", "a")) == ((1L, 1.0)))
    assert(out.size == 3, "last events contribute no transition")
  }

  test("equal timestamps order by the tie column") {
    import spark.implicits._
    val df = Seq(
      (1L, ts(0), 2L, "b"), (1L, ts(0), 1L, "a"), (1L, ts(0), 3L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Transitions.matrix(df, "user_id", "ts", "event_type", Some("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "b"), ("b", "c")))
  }
}
