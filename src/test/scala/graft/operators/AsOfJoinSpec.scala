package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.temporal.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("as-of join picks the latest right row at or before each left row") {
    import spark.implicits._
    val left = Seq((1L, "u", 10L), (2L, "u", 20L), (3L, "u", 5L), (4L, "v", 10L))
      .toDF("id", "k", "t")
    val right = Seq(("u", 8L, "r8"), ("u", 15L, "r15"), ("v", 20L, "r20"))
      .toDF("k", "t", "payload")
    val out = AsOfJoin.join(left, right, Seq("k"), "t", "t", Seq("payload"))
      .select("id", "asof_payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "r8", 2L -> "r15")) // id 3: no right <= 5; id 4: none <= 10
  }

  test("right row at exactly the left timestamp matches (inclusive)") {
    import spark.implicits._
    val left = Seq((1L, "u", 10L)).toDF("id", "k", "t")
    val right = Seq(("u", 10L, "exact")).toDF("k", "t", "payload")
    val out = AsOfJoin.join(left, right, Seq("k"), "t", "t", Seq("payload")).collect()
    assert(out.length == 1 && out.head.getString(3) == "exact")
  }

  test("forward direction picks the earliest right row at or after t") {
    import spark.implicits._
    val left = Seq((1L, "u", 10L), (2L, "u", 16L), (3L, "u", 99L))
      .toDF("id", "k", "t")
    val right = Seq(("u", 8L, "r8"), ("u", 15L, "r15"), ("u", 16L, "r16"))
      .toDF("k", "t", "payload")
    val out = AsOfJoin.join(left, right, Seq("k"), "t", "t", Seq("payload"),
        direction = "forward")
      .select("id", "asof_payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // id 2: exact-time right matches inclusively; id 3: nothing after 99
    assert(out == Map(1L -> "r15", 2L -> "r16"))
  }

  test("nearest picks the smaller gap and breaks ties backward") {
    import spark.implicits._
    val left = Seq((1L, "u", 10L), (2L, "u", 13L), (3L, "u", 14L))
      .toDF("id", "k", "t")
    val right = Seq(("u", 8L, "b"), ("u", 16L, "f")).toDF("k", "t", "payload")
    val out = AsOfJoin.join(left, right, Seq("k"), "t", "t", Seq("payload"),
        direction = "nearest")
      .select("id", "asof_payload").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // t=10: gaps 2 vs 6 -> b; t=13: gap 5 vs 3 -> f; t=14: 6 vs 2 -> f
    assert(out == Map(1L -> "b", 2L -> "f", 3L -> "f"))
    // equidistant: t=12 -> backward wins the tie
    val tie = AsOfJoin.join(Seq((9L, "u", 12L)).toDF("id", "k", "t"),
        right, Seq("k"), "t", "t", Seq("payload"), direction = "nearest")
      .collect()
    assert(tie.head.getString(3) == "b")
  }

  test("tolerance bounds the gap in every direction (numeric axis)") {
    import spark.implicits._
    val left = Seq((1L, "u", 10L)).toDF("id", "k", "t")
    val right = Seq(("u", 6L, "b"), ("u", 17L, "f")).toDF("k", "t", "payload")
    def run(dir: String, tol: String) =
      AsOfJoin.join(left, right, Seq("k"), "t", "t", Seq("payload"),
        direction = dir, tolerance = Some(tol))
        .collect().map(_.getString(3)).toSeq
    assert(run("backward", "4") == Seq("b"))
    assert(run("backward", "3") == Seq())     // gap 4 > 3: dropped
    assert(run("forward", "7") == Seq("f"))
    assert(run("forward", "6") == Seq())
    assert(run("nearest", "7") == Seq("b"))   // both in range: 4 < 7
    assert(run("nearest", "3") == Seq())      // neither in range
    // nearest with only the far side in tolerance takes it
    assert(run("nearest", "4") == Seq("b"))
    val onlyF = AsOfJoin.join(Seq((1L, "u", 16L)).toDF("id", "k", "t"),
        right, Seq("k"), "t", "t", Seq("payload"),
        direction = "nearest", tolerance = Some("1"))
      .collect().map(_.getString(3)).toSeq
    assert(onlyF == Seq("f"))
  }

  test("tolerance works in timestamp algebra via INTERVAL expressions") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, "u", ts("2024-01-03 00:00:00"))).toDF("id", "k", "t")
    val right = Seq(("u", ts("2024-01-01 00:00:00"), "old")).toDF("k", "t", "payload")
    def run(tol: String) =
      AsOfJoin.join(left, right, Seq("k"), "t", "t", Seq("payload"),
        tolerance = Some(tol)).count()
    assert(run("INTERVAL 3 DAYS") == 1L)
    assert(run("INTERVAL 1 DAY") == 0L)
  }

  test("every direction/tolerance agrees with a naive reference on seeded data") {
    import spark.implicits._
    val rnd = new scala.util.Random(2026)
    for (trial <- 1 to 5) {
      val keys = Seq("a", "b", "c")
      val left = Seq.tabulate(25)(i =>
        (i.toLong, keys(rnd.nextInt(3)), rnd.nextInt(50).toLong))
      val right = Seq.tabulate(20)(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(50).toLong, s"p$i"))
      val lDf = left.toDF("id", "k", "t")
      val rDf = right.toDF("k", "t", "payload")
      for (dir <- Seq("backward", "forward", "nearest");
           tol <- Seq(None, Some("7"))) {
        val got = AsOfJoin.join(lDf, rDf, Seq("k"), "t", "t", Seq("t"),
            direction = dir, tolerance = tol)
          .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
        val bound = tol.map(_.toLong).getOrElse(Long.MaxValue)
        val want = left.flatMap { case (id, k, t) =>
          val cand = right.filter(_._1 == k).map(_._2)
          val b = cand.filter(rt => rt <= t && t - rt <= bound)
            .sorted.lastOption
          val f = cand.filter(rt => rt >= t && rt - t <= bound)
            .sorted.headOption
          val m = dir match {
            case "backward" => b
            case "forward" => f
            case "nearest" => (b, f) match {
              case (Some(x), Some(y)) =>
                Some(if (t - x <= y - t) x else y) // tie -> backward
              case (x, y) => x.orElse(y)
            }
          }
          m.map(id -> _)
        }.toMap
        assert(got == want, s"trial=$trial dir=$dir tol=$tol " +
          s"diff=${(got.keySet ++ want.keySet)
            .filter(k2 => got.get(k2) != want.get(k2)).take(5)}")
      }
    }
  }

  test("range join matches the BETWEEN predicate and avoids nested loops") {
    import spark.implicits._
    import graft.operators.temporal.RangeJoin
    val pts = Seq((1L, 5.0), (2L, 15.0), (3L, 25.0), (4L, 45.0)).toDF("id", "p")
    val ivs = Seq(("a", 0.0, 10.0), ("b", 10.0, 30.0), ("c", 20.0, 50.0)).toDF("iv", "lo", "hi")
    val out = RangeJoin.join(pts, "p", ivs, "lo", "hi", binWidth = 10.0)
    val got = out.select("id", "iv").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // brute-force expectation
    val want = (for {
      (id, p) <- Seq((1L, 5.0), (2L, 15.0), (3L, 25.0), (4L, 45.0))
      (iv, lo, hi) <- Seq(("a", 0.0, 10.0), ("b", 10.0, 30.0), ("c", 20.0, 50.0))
      if p >= lo && p <= hi
    } yield (id, iv)).toSet
    assert(got == want)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("plan shape: one shuffle on the key, no cartesian/theta join") {
    import spark.implicits._
    val left = Seq((1L, "u", 10L)).toDF("id", "k", "t")
    val right = Seq(("u", 8L, "p")).toDF("k", "t", "payload")
    val plan = AsOfJoin.join(left, right, Seq("k"), "t", "t", Seq("payload"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("a NULL right time never matches (it would sort first and carry forward)") {
    import spark.implicits._
    val left = Seq((1L, "u", 5L)).toDF("id", "k", "t")
    val right = Seq(("u", Option.empty[Long], "ghost"), ("u", Some(99L), "late"))
      .toDF("k", "t", "payload")
    val out = AsOfJoin.join(left, right, Seq("k"), "t", "t", Seq("payload"))
    // no real right row at time <= 5 -> inner as-of drops the left row
    assert(out.count() == 0)
  }

  test("non-orderable payload types are rejected up front with a named error") {
    import spark.implicits._
    val left = Seq((1L, "u", 5L)).toDF("id", "k", "t")
    val right = Seq(("u", 3L, Map("a" -> 1)))
      .toDF("k", "t", "attrs")
    // the payload struct is a tie-break sort key; a map payload used to
    // surface as an opaque AnalysisException on __rp__ (ADVICE r16)
    val ex = intercept[IllegalArgumentException](
      AsOfJoin.join(left, right, Seq("k"), "t", "t", Seq("attrs")))
    assert(ex.getMessage.contains("attrs") &&
      ex.getMessage.contains("non-orderable"), ex.getMessage)
    // orderable payloads (structs without maps included) still pass
    val ok = AsOfJoin.join(left,
      right.withColumn("s",
        org.apache.spark.sql.functions.struct($"t".as("x"))).drop("attrs"),
      Seq("k"), "t", "t", Seq("s"))
    assert(ok.count() == 1)
  }
}
