package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.temporal.Ewma

class EwmaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sequential(xs: Seq[Double], alpha: Double): Seq[Double] =
    xs.tail.scanLeft(xs.head)((s, x) => alpha * x + (1 - alpha) * s)

  test("dyadic alpha: chunked scan equals the sequential recurrence exactly") {
    import spark.implicits._
    val xs = (1 to 50).map(i => ((i * 37) % 11 + 1).toDouble)
    val df = xs.zipWithIndex.map { case (x, i) => ("a", i.toLong, x) }
      .toDF("k", "t", "v")
    val expect = sequential(xs, 0.5)
    for (chunk <- Seq(4, 7, 1000)) {
      val got = Ewma.smooth(df, "k", "t", "v", alpha = 0.5, chunk = chunk)
        .orderBy("t").collect().map(_.getDouble(3)).toSeq
      assert(got == expect, s"chunk=$chunk")
    }
  }

  test("inexact alpha: close to sequential and bit-identical across partitionings") {
    import spark.implicits._
    val xs = (1 to 200).map(i => math.sin(i.toDouble) * 10 + 20)
    val rows = xs.zipWithIndex.map { case (x, i) => ("a", i.toLong, x) }
    val df1 = rows.toDF("k", "t", "v").repartition(1)
    val df13 = rows.toDF("k", "t", "v").repartition(13)
    val a = Ewma.smooth(df1, "k", "t", "v", 0.3, chunk = 16)
      .orderBy("t").collect().map(_.getDouble(3)).toSeq
    val b = Ewma.smooth(df13, "k", "t", "v", 0.3, chunk = 16)
      .orderBy("t").collect().map(_.getDouble(3)).toSeq
    assert(a == b, "same op order => bit-identical under any partitioning")
    val seq = sequential(xs, 0.3)
    a.zip(seq).foreach { case (g, e) =>
      assert(math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)), s"$g vs $e")
    }
  }

  test("keys smooth independently; single-row key passes through") {
    import spark.implicits._
    val df = Seq(("a", 0L, 4.0), ("a", 1L, 8.0), ("b", 0L, 100.0))
      .toDF("k", "t", "v")
    val out = Ewma.smooth(df, "k", "t", "v", 0.5, chunk = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(out(("a", 0L)) == 4.0 && out(("a", 1L)) == 6.0)
    assert(out(("b", 0L)) == 100.0)
  }
}
