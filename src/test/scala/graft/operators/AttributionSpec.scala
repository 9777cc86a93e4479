package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.temporal.Attribution

class AttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("linear / position / decay credits on a hand case, plus direct") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view", 0.0),
      (1L, ts("2024-01-01 01:00:00"), "click", 0.0),
      (1L, ts("2024-01-01 02:00:00"), "view", 0.0),
      (1L, ts("2024-01-01 03:00:00"), "purchase", 10.0),
      (2L, ts("2024-01-05 00:00:00"), "purchase", 5.0) // no touches
    ).toDF("user_id", "ts", "event_type", "value")
    val out = Attribution.multiTouch(ev, "user_id", "ts", "event_type",
        "value", Seq("view", "click"), "purchase")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // linear: 1/3 each -> view 2x
    assert(out(("linear", "view")) == ((0.666666, 6.66666)))
    assert(out(("linear", "click")) == ((0.333333, 3.33333)))
    // position 40/20/40: first+last are views
    assert(out(("position", "view")) == ((0.8, 8.0)))
    assert(out(("position", "click")) == ((0.2, 2.0)))
    // decay 1/(1+h): h = 3,2,1 -> w9 = 25e7, 333333333, 5e8; norm 1083333333
    assert(out(("decay", "view")) == ((0.692307, 6.92307)))
    assert(out(("decay", "click")) == ((0.307692, 3.07692)))
    // untouched conversion -> direct, full credit in every model
    Seq("linear", "position", "decay").foreach { m =>
      assert(out((m, "direct")) == ((1.0, 5.0)), m)
    }
  }

  test("conservation: every model's credits sum to the conversion count") {
    import spark.implicits._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"user_id", $"ts".cast("timestamp").as("ts"), $"event_type", $"value")
    val nConv = ev.filter($"event_type" === "purchase").count().toDouble
    val out = Attribution.multiTouch(ev, "user_id", "ts", "event_type",
        "value", Seq("view", "click"), "purchase")
      .groupBy("model")
      .agg(org.apache.spark.sql.functions.sum($"n_credit").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set("linear", "position", "decay"))
    // per-touch credits are 6-dp rounded, so each conversion's credits sum
    // to 1 within n_touches * 5e-7
    out.foreach { case (m, t) =>
      assert(math.abs(t - nConv) < nConv * 0.001 + 1.0, s"$m: $t vs $nConv")
    }
  }

  test("two conversions at the same (user, ts) keep separate credit windows") {
    import spark.implicits._
    // one touch, then TWO purchases at the identical timestamp: merged
    // windows would double n and each conversion's credits would sum to
    // ~0.5 (ADVICE r14); with the per-conversion surrogate each credits
    // 1.0 and the model totals conserve to 2
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view", 0.0),
      (1L, ts("2024-01-01 02:00:00"), "purchase", 10.0),
      (1L, ts("2024-01-01 02:00:00"), "purchase", 20.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val out = Attribution.multiTouch(ev, "user_id", "ts", "event_type",
        "value", Seq("view", "click"), "purchase")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    Seq("linear", "position", "decay").foreach { m =>
      // n=1 per conversion in every model: 2.0 conversions credited, and
      // credited revenue is the full 10 + 20
      assert(out((m, "view")) == ((2.0, 30.0)), m)
      assert(!out.contains((m, "direct")), m)
    }
  }

  test("lookback excludes stale touches; n=2 position splits 50/50") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view", 0.0),  // 10 days early: stale
      (1L, ts("2024-01-10 00:00:00"), "click", 0.0),
      (1L, ts("2024-01-10 01:00:00"), "view", 0.0),
      (1L, ts("2024-01-11 00:00:00"), "purchase", 4.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val out = Attribution.multiTouch(ev, "user_id", "ts", "event_type",
        "value", Seq("view", "click"), "purchase", lookbackDays = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("position", "view")) == 0.5)
    assert(out(("position", "click")) == 0.5)
    assert(out(("linear", "view")) == 0.5)
    assert(!out.contains(("linear", "direct")))
  }
}
