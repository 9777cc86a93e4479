package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.graph.Triangles

class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("K4 has 4 triangles, one per corner-triple; clustering 1 everywhere") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L)
    val e = (for (a <- nodes; b <- nodes if a < b) yield (a, b)).toDF("s", "d")
    val out = Triangles.perNode(e, "s", "d")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    nodes.foreach(n => assert(out(n) == ((3L, 3L, 1.0)), s"node $n: ${out(n)}"))
  }

  test("triangle plus pendant: pendant has zero triangles and zero clustering") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val out = Triangles.perNode(e, "s", "d")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((1L, 1.0)) && out(2L) == ((1L, 1.0)))
    assert(out(3L)._1 == 1L && out(3L)._2 == math.rint(2.0 / 6 * 1e6) / 1e6)
    assert(out(4L) == ((0L, 0.0)))
  }

  test("duplicate and reversed edges and self-loops are ignored") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
      .toDF("s", "d")
    val out = Triangles.perNode(e, "s", "d").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("square (4-cycle) has no triangles") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val out = Triangles.perNode(e, "s", "d").collect()
    assert(out.forall(_.getLong(2) == 0L))
  }
}
