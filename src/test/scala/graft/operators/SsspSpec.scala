package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.graph.Sssp

class SsspSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sssp(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
                   maxIter: Int = 30,
                   undirected: Boolean = false): Map[Long, Long] = {
    import spark.implicits._
    Sssp.run(edges.toDF("a", "b", "w"), "a", "b", "w",
        seeds.toDF("node"), "node", maxIter, undirected)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("weighted distances beat hop counts: the 2-hop cheap route wins") {
    // 1→3 direct costs 10; 1→2→3 costs 3; 3→4 adds 1
    val e = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L))
    assert(sssp(e, Seq(1L)) == Map(1L -> 0L, 2L -> 1L, 3L -> 3L, 4L -> 4L))
  }

  test("multi-source takes the min over seeds; unreachable nodes are absent") {
    val e = Seq((1L, 2L, 5L), (9L, 2L, 1L), (7L, 8L, 1L))
    assert(sssp(e, Seq(1L, 9L)) == Map(1L -> 0L, 9L -> 0L, 2L -> 1L))
  }

  test("direction matters unless undirected; parallel edges take the min") {
    val e = Seq((2L, 1L, 3L), (2L, 1L, 7L))
    assert(sssp(e, Seq(1L)) == Map(1L -> 0L))
    assert(sssp(e, Seq(1L), undirected = true) == Map(1L -> 0L, 2L -> 3L))
  }

  test("zero-weight edges, cycles, and seeds outside the graph are fine") {
    val e = Seq((1L, 2L, 0L), (2L, 3L, 2L), (3L, 1L, 1L))
    assert(sssp(e, Seq(1L, 42L)) ==
      Map(1L -> 0L, 2L -> 0L, 3L -> 2L, 42L -> 0L))
  }

  test("negative weights are rejected loudly") {
    val ex = intercept[IllegalArgumentException](
      sssp(Seq((1L, 2L, -1L)), Seq(1L)))
    assert(ex.getMessage.contains("nonnegative"))
  }

  test("maxIter too low fails loudly instead of returning short paths") {
    val chain = (1L until 10L).map(i => (i, i + 1, 1L))
    val ex = intercept[IllegalStateException](sssp(chain, Seq(1L), maxIter = 3))
    assert(ex.getMessage.contains("did not converge"))
    // exactly deep enough: 9 relax rounds + the empty detection round
    assert(sssp(chain, Seq(1L), maxIter = 10) ==
      (1L to 10L).map(n => n -> (n - 1)).toMap)
  }

  test("agrees with a naive driver Bellman-Ford on a seeded random graph") {
    val rnd = new scala.util.Random(41)
    val edges = Seq.fill(150)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong,
      rnd.nextInt(9).toLong + 1L)).filter(e => e._1 != e._2).distinct
    val seeds = Seq(0L, 7L)
    def naive(): Map[Long, Long] = {
      var d = seeds.map(_ -> 0L).toMap
      var changed = true
      while (changed) {
        changed = false
        for ((u, v, w) <- edges; du <- d.get(u))
          if (d.get(v).forall(_ > du + w)) { d += v -> (du + w); changed = true }
      }
      d
    }
    assert(sssp(edges, seeds) == naive())
  }
}
