package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.temporal.Resample

class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val H = 3600L * 1000000L // one hour in micros

  /** key a: hours 0 and 2 (hole at hour 1); key b: hour 5 only. */
  private def fixture = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq(("a", 0L * H + 5L, 1.0), ("a", 0L * H + 9L, 2.0),
        ("a", 2L * H, 4.0), ("b", 5L * H + 1L, 8.0))
      .toDF("k", "us", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
  }

  private def collect(fill: String) = {
    import org.apache.spark.sql.functions._
    Resample.resample(fixture, Seq("k"), "ts", 3600L,
        aggs = Seq("sum_v" -> sum(col("value"))), fill = fill)
      .withColumn("h", (unix_micros(col("bucket")) / H).cast("int"))
      .select("k", "h", "sum_v").orderBy("k", "h").collect()
      .map(r => (r.getString(0), r.getInt(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
  }

  test("dense per-key axis with null fill leaves holes NULL") {
    assert(collect("null").toSeq == Seq(
      ("a", 0, Some(3.0)), ("a", 1, None), ("a", 2, Some(4.0)),
      ("b", 5, Some(8.0))),
      "axis spans [min,max] per key; b's axis does not inherit a's range")
  }

  test("zero fill coalesces holes; ffill carries the previous bucket") {
    assert(collect("zero").toSeq.filter(_._2 == 1) == Seq(("a", 1, Some(0.0))))
    assert(collect("ffill").toSeq.filter(_._2 == 1) == Seq(("a", 1, Some(3.0))))
  }

  test("boundary row lands in its own bucket (exact floor-to-multiple)") {
    // the 2*H row sits exactly on the boundary: bucket 2, not 1
    assert(collect("null").toSeq.contains(("a", 2, Some(4.0))))
  }

  test("anomalyScore: warm-up and constant baselines stay NULL, spikes score high") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // key a: noisy-but-stable baseline then a spike; key b: too short;
    // key c: constant (zero variance admits no z-score, spike included)
    val rows = (1 to 10).map(i => ("a", i.toLong, if (i % 2 == 0) 6.0 else 4.0)) :+
      ("a", 11L, 50.0) :+
      ("b", 1L, 1.0) :+ ("b", 2L, 9.0) :+
      ("c", 1L, 5.0) :+ ("c", 2L, 5.0) :+ ("c", 3L, 5.0) :+ ("c", 4L, 50.0)
    val df = rows.toDF("k", "pos", "v")
    val out = Resample.anomalyScore(df, Seq("k"), "pos", "v", lookback = 8)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out(("a", 1L)).isEmpty, "no trailing rows yet")
    assert(out(("a", 11L)).isEmpty == false && out(("a", 11L)).get > 3,
      s"spike must score high, got ${out(("a", 11L))}")
    assert(out(("b", 2L)).isEmpty, "single trailing row is not enough")
    assert(out(("c", 4L)).isEmpty, "constant baseline has zero variance")
  }

  test("DSL surface: Resample ET with fn:col agg spec") {
    import org.apache.spark.sql.functions._
    fixture.createOrReplaceTempView("rs_events")
    val df = graft.dsl.ScriptRunner.runToDF(
      """select * from rs_events as rs_in;
        |run rs_in as Resample.`` where keyCols="k" and tsCol="ts"
        |  and interval="3600" and aggs="count:*,max:value" and fill="zero" as rs_out;
        |select k, n, max_value from rs_out order by k, bucket as out;""".stripMargin,
      spark)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(
      ("a", 2L, 2.0), ("a", 0L, 0.0), ("a", 1L, 4.0), ("b", 1L, 8.0)))
  }
}
