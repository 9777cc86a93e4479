package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.temporal.Holt

class HoltSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sequential(xs: Seq[Double], a: Double, b0: Double): Seq[(Double, Double)] = {
    var l = xs.head; var b = 0.0
    xs.head -> 0.0
    (l, b) +: xs.tail.map { x =>
      val lNew = a * x + (1 - a) * (l + b)
      val bNew = b0 * (lNew - l) + (1 - b0) * b
      l = lNew; b = bNew
      (l, b)
    }
  }

  test("chunked scan tracks the sequential recurrence within 1e-9 at any chunk size") {
    import spark.implicits._
    val xs = (1 to 120).map(i => math.sin(i * 0.3) * 5 + 0.5 * i + 10)
    val df = xs.zipWithIndex.map { case (x, i) => ("a", i.toLong, x) }
      .toDF("k", "t", "v")
    val expect = sequential(xs, 0.4, 0.2)
    for (chunk <- Seq(5, 16, 1000)) {
      val got = Holt.smooth(df, "k", "t", "v", 0.4, 0.2, chunk)
        .orderBy("t").collect().map(r => (r.getDouble(3), r.getDouble(4)))
      got.zip(expect).zipWithIndex.foreach { case (((gl, gb), (el, eb)), i) =>
        assert(math.abs(gl - el) <= 1e-9 * math.max(1, math.abs(el)), s"l@$i chunk=$chunk")
        assert(math.abs(gb - eb) <= 1e-9 * math.max(1, math.abs(eb)), s"b@$i chunk=$chunk")
      }
    }
  }

  test("bit-identical across partitionings (fixed op order)") {
    import spark.implicits._
    val rows = (1 to 300).map(i => ("a", i.toLong, math.cos(i.toDouble) * 7 + i * 0.1))
    val a = Holt.smooth(rows.toDF("k", "t", "v").repartition(1), "k", "t", "v", 0.3, 0.1, 16)
      .orderBy("t").collect().map(r => (r.getDouble(3), r.getDouble(4))).toSeq
    val b = Holt.smooth(rows.toDF("k", "t", "v").repartition(13), "k", "t", "v", 0.3, 0.1, 16)
      .orderBy("t").collect().map(r => (r.getDouble(3), r.getDouble(4))).toSeq
    assert(a == b)
  }

  test("on a pure ramp the trend estimate converges to the slope") {
    import spark.implicits._
    val df = (0 until 200).map(i => ("a", i.toLong, 3.0 * i + 5))
      .toDF("k", "t", "v")
    val last = Holt.smooth(df, "k", "t", "v", 0.5, 0.25, 32)
      .orderBy("t").collect().last
    assert(math.abs(last.getDouble(4) - 3.0) < 0.01, s"b=${last.getDouble(4)}")
    // one-step forecast ~ next ramp value
    assert(math.abs(last.getDouble(5) - (3.0 * 200 + 5)) < 0.1)
  }
}
