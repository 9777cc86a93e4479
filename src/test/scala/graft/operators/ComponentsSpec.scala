package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.dedup.Components

/** Both Components paths must produce identical labels: the driver
  * union-find fast path (edge count <= cap) and the distributed
  * pointer-doubling loop (forced here with cap = -1).
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // chain {1-2-3-4}, pair {10,11}, singleton edge {20,21}: exercises
  // transitivity (no 1-4 edge) and multiple components
  private def pairs = {
    import spark.implicits._
    Seq((2L, 1L), (2L, 3L), (3L, 4L), (11L, 10L), (20L, 21L))
      .toDF("a_id", "b_id")
  }

  private val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
    10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L)

  private def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("driver union-find fast path labels components by min id") {
    assert(toMap(Components.labels(pairs)) == expected)
  }

  test("distributed doubling path agrees with the fast path") {
    assert(toMap(Components.labels(pairs, driverCap = -1L)) == expected)
  }

  test("fast path preserves a string id column type") {
    import spark.implicits._
    val p = Seq(("b", "a"), ("b", "c"), ("x", "y")).toDF("a_id", "b_id")
    val out = Components.labels(p)
    assert(out.schema("id").dataType == org.apache.spark.sql.types.StringType)
    val m = out.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }
}
