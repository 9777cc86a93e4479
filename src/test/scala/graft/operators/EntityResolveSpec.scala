package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.text.EntityResolve

class EntityResolveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def resolve(rows: Seq[(Long, String)], maxDist: Int = 2) = {
    import spark.implicits._
    EntityResolve.resolve(rows.toDF("id", "s"), "id", "s", maxDist)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
  }

  test("transitive chains collapse into one entity with the min-id golden record") {
    // 1≈2 (1 edit), 2≈3 (1 edit), but 1 vs 3 is 2 edits — at maxDist=1
    // linkage alone never pairs 1 with 3; components must
    val rows = Seq((1L, "golden retriever"), (2L, "goldan retriever"),
      (3L, "goldan retriefer"), (9L, "border collie"))
    val r = resolve(rows, maxDist = 1)
    assert(r(1L) == ((1L, "golden retriever")))
    assert(r(2L) == ((1L, "golden retriever")))
    assert(r(3L) == ((1L, "golden retriever")), "transitive member joins via 2")
    assert(r(9L) == ((9L, "border collie")), "singleton is its own entity")
  }

  test("every registry row comes back exactly once") {
    val rows = Seq((5L, "alpha beta"), (6L, "alpha beta"), (7L, "unrelated thing"))
    import spark.implicits._
    val out = EntityResolve.resolve(rows.toDF("id", "s"), "id", "s", 2)
    assert(out.count() == 3)
    assert(resolve(rows)(6L) == ((5L, "alpha beta")))
  }
}
