package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.basket.MarketBasket
import graft.operators.temporal.Paths

class MarketBasketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pair rules: counts, measures, apriori prune, a<b orientation") {
    import spark.implicits._
    // baskets: {1,2,3}, {1,2}, {1,2}, {3,9} — item 9 appears once
    val df = Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 2L), (13L, 3L), (13L, 9L)).toDF("order_id", "item")
    val out = MarketBasket.pairRules(df, "order_id", "item", minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7))).toMap
    // only {1,2} is frequent as a pair (3 of 4 baskets)
    assert(out.keySet == Set((1L, 2L)))
    val (nab, na, nb, sup, conf, lift) = out((1L, 2L))
    assert(nab == 3L && na == 3L && nb == 3L)
    assert(sup == 0.75 && conf == 1.0)
    assert(lift == math.rint(3.0 * 4 / 9 * 1e6) / 1e6)
  }

  test("duplicate item rows in one basket count once") {
    import spark.implicits._
    val df = Seq((1L, 5L), (1L, 5L), (1L, 6L), (2L, 5L), (2L, 6L))
      .toDF("order_id", "item")
    val out = MarketBasket.pairRules(df, "order_id", "item", 2L).collect()
    assert(out.length == 1 && out.head.getLong(2) == 2L)
  }

  test("top paths: first-k in order, counted, deterministic ties") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 11L, "b"), (1L, 3L, 12L, "c"),
      (2L, 1L, 20L, "a"), (2L, 2L, 21L, "b"),
      (3L, 1L, 30L, "a"), (3L, 2L, 31L, "b"), (3L, 3L, 32L, "d"),
      (4L, 1L, 40L, "x")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Paths.top(df, "user_id", "ts", "event_type", k = 2, topN = 10,
        tieCol = Some("event_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(out.toSeq == Seq("a>b" -> 3L, "x" -> 1L))
  }

  test("paths truncate at k even for long histories") {
    import spark.implicits._
    val df = (1 to 50).map(i => (1L, i.toLong, i.toLong, s"e$i"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Paths.top(df, "user_id", "ts", "event_type", k = 3, topN = 1,
        tieCol = Some("event_id")).collect()
    assert(out.head.getString(0) == "e1>e2>e3")
  }
}
