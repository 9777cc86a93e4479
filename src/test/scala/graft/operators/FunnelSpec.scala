package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.temporal.Funnel

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      (2L, ts(1), "click"), (2L, ts(2), "view"), (2L, ts(5), "click"),
      (3L, ts(1), "view"),
      (4L, ts(1), "click"),                       // no step-1 event
      (5L, ts(5), "view"), (5L, ts(3), "click"),  // click BEFORE view
      (6L, ts(1), "view"), (6L, ts(1), "click"),  // tie never advances
      (7L, ts(1), "view"), (7L, ts(100), "click") // outside maxSpan=10
    ).toDF("user_id", "ts", "event_type")
  }

  test("ordered funnel: strictly-after matching, ties and pre-step events don't advance") {
    val out = Funnel.analyze(fixture, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(r.length - 1)).toMap
    assert(out == Map(1L -> 3, 2L -> 2, 3L -> 1, 5L -> 1, 6L -> 1, 7L -> 2))
    assert(!out.contains(4L), "no step-1 event => no funnel row")
  }

  test("maxSpan bounds the conversion window relative to step 1") {
    val out = Funnel.analyze(fixture, "user_id", "ts", "event_type",
        Seq("view", "click"), maxSpanSeconds = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(r.length - 1)).toMap
    assert(out(7L) == 1, "click at +99s is outside the 10s window")
    assert(out(1L) == 2 && out(2L) == 2)
  }

  test("step times are the earliest qualifying events") {
    val row = Funnel.analyze(fixture, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(row(2L).getTimestamp(1) == ts(2)) // earliest VIEW, not the click@1
    assert(row(2L).getTimestamp(2) == ts(5)) // earliest click after it
  }

  test("summary of an empty funnel is all zeros, not an NPE") {
    import spark.implicits._
    val df = Seq((1L, ts(1), "unrelated")).toDF("user_id", "ts", "event_type")
    val out = Funnel.summary(df, "user_id", "ts", "event_type",
        Seq("view", "click")).collect()
    assert(out.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("view", 0L), ("click", 0L)))
  }

  test("summary reports per-step users and conversion off step 1") {
    val out = Funnel.summary(fixture, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    // 6 users have a view; 3 advance to click (1, 2, 7); 1 purchases
    assert(out == Seq((1, "view", 6L, 1.0), (2, "click", 3L, 0.5),
      (3, "purchase", 1L, math.rint(1.0 / 6 * 1e6) / 1e6)))
  }
}
