package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.temporal.SubsequenceSearch

class SubsequenceSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def series(key: Long, vs: Double*): Seq[(Long, Long, Long, Double)] =
    vs.zipWithIndex.map { case (v, i) => (key, i.toLong, i.toLong * 10 + key, v) }

  private def fixture = {
    import spark.implicits._
    (series(1L, 1, 2, 3, 4, 5, 4, 3, 2, 1, 2, 3, 4) ++
      series(2L, 5, 5, 5, 5, 1, 2, 3, 4, 9, 9, 1, 0))
      .toDF("key", "ts", "eid", "v")
  }

  /** Brute force replicating the operator's exact arithmetic contract. */
  private def brute(rows: Seq[(Long, Seq[Double])], q: Seq[Double]): Seq[(Long, Long, Double)] = {
    val m = q.length
    val qn = SubsequenceSearch.znorm(q.toArray).get
    val out = for {
      (key, vs) <- rows
      s <- 0 to vs.length - m
    } yield {
      val win = vs.slice(s, s + m).toArray
      var sum = 0.0; var sumsq = 0.0
      win.foreach { x => sum += x; sumsq += x * x }
      val mu = sum / m
      val va = sumsq / m - mu * mu
      val flat = va <= 0
      val sig = if (flat) 1.0 else math.sqrt(va)
      var d = 0.0
      for (i <- 0 until m) {
        val z = if (flat) 0.0 else (win(i) - mu) / sig
        d += (z - qn(i)) * (z - qn(i))
      }
      (key, s.toLong, math.rint(d * 1e6) / 1e6)
    }
    out.sortBy { case (k, s, d) => (d, k, s) }
  }

  private val rowsFixture = Seq(
    1L -> Seq[Double](1, 2, 3, 4, 5, 4, 3, 2, 1, 2, 3, 4),
    2L -> Seq[Double](5, 5, 5, 5, 1, 2, 3, 4, 9, 9, 1, 0))

  test("topK matches brute force and is chunk-size-invariant") {
    val q = Seq[Double](1, 2, 3, 4) // rising ramp
    val want = brute(rowsFixture, q).take(50)
    for (chunk <- Seq(4, 5, 7, 4096)) {
      val got = SubsequenceSearch
        .topK(fixture, "key", "ts", "v", q, 50, tieCol = Some("eid"), chunk = chunk)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == want, s"chunk=$chunk")
    }
    // the best matches are exact rising ramps at dist 0
    assert(want.head._3 == 0.0)
  }

  test("flat windows z-score as zero; a flat query is rejected") {
    val q = Seq[Double](1, 2, 3, 4)
    // key 2 starts 5,5,5,5 — a flat window, defined dist = sum(qn^2) = m
    val all = SubsequenceSearch
      .topK(fixture, "key", "ts", "v", q, 100, tieCol = Some("eid"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(all((2L, 0L)) == 4.0)
    val err = intercept[IllegalArgumentException](SubsequenceSearch
      .topK(fixture, "key", "ts", "v", Seq(3, 3, 3), 5))
    assert(err.getMessage.contains("constant"))
  }

  test("windows() emits z-normalized slices, drops flat ones, chunk-invariant") {
    val m = 4
    def wantFor(rows: Seq[(Long, Seq[Double])]): Seq[(Long, Long, Seq[Double])] =
      (for {
        (key, vs) <- rows
        s <- 0 to vs.length - m
        z <- SubsequenceSearch.znorm(vs.slice(s, s + m).toArray)
      } yield (key, s.toLong, z.toSeq)).sortBy(t => (t._1, t._2))
    val want = wantFor(rowsFixture)
    // key 2 starts 5,5,5,5 -> its s=0 window is flat and must be absent
    assert(!want.exists(t => t._1 == 2L && t._2 == 0L))
    for (chunk <- Seq(4, 6, 4096)) {
      val got = SubsequenceSearch
        .windows(fixture, "key", "ts", "v", m, tieCol = Some("eid"), chunk = chunk)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(got == want, s"chunk=$chunk")
    }
  }

  test("plan: global top-k is TakeOrdered, never a full sort-limit") {
    val out = SubsequenceSearch
      .topK(fixture, "key", "ts", "v", Seq[Double](1, 2, 3, 4), 5, tieCol = Some("eid"))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
