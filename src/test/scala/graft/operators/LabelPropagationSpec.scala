package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.graph.LabelPropagation

class LabelPropagationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("two triangles joined by a bridge converge to two communities") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L)).toDF("s", "d")
    val out = LabelPropagation.run(e, "s", "d", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), out.toString)
  }

  test("ties resolve to the smallest label deterministically") {
    import spark.implicits._
    // path 1-2-3: node 2 sees labels {1, 3} -> tie -> 1
    val e = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val out = LabelPropagation.run(e, "s", "d", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) == 1L)
    assert(out(1L) == 2L && out(3L) == 2L) // single neighbor's label
  }

  test("result is identical across partitionings") {
    import spark.implicits._
    val edges = (1 to 60).map(i => (i.toLong, ((i % 20) + 1).toLong))
    val a = LabelPropagation.run(edges.toDF("s", "d").repartition(1), "s", "d", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = LabelPropagation.run(edges.toDF("s", "d").repartition(17), "s", "d", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
