package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.graph.Bfs

class BfsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bfs(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int,
                  undirected: Boolean = false) = {
    import spark.implicits._
    Bfs.hopDistance(edges.toDF("s", "d"), "s", "d",
        seeds.toDF("seed"), "seed", maxHops, undirected)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("single-source levels on a small dag") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L))
    assert(bfs(e, Seq(1L), maxHops = 10) ==
      Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("multi-source takes the minimum over seeds") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(bfs(chain, Seq(1L, 4L), maxHops = 10) ==
      Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 0, 5L -> 1))
  }

  test("maxHops truncates; hop 0 is just the seed set") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(bfs(chain, Seq(1L), maxHops = 2) == Map(1L -> 0, 2L -> 1, 3L -> 2))
    assert(bfs(chain, Seq(1L), maxHops = 0) == Map(1L -> 0))
  }

  test("direction matters unless undirected; cycles settle at first visit") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(bfs(cyc, Seq(2L), maxHops = 10) == Map(2L -> 0, 3L -> 1, 1L -> 2))
    assert(bfs(Seq((2L, 1L)), Seq(1L), maxHops = 5) == Map(1L -> 0))
    assert(bfs(Seq((2L, 1L)), Seq(1L), maxHops = 5, undirected = true) ==
      Map(1L -> 0, 2L -> 1))
  }

  test("a seed outside the edge table still reports dist 0") {
    assert(bfs(Seq((1L, 2L)), Seq(42L), maxHops = 3) == Map(42L -> 0))
  }

  test("null seeds drop instead of minting a null node") {
    import spark.implicits._
    val out = Bfs.hopDistance(Seq((1L, 2L)).toDF("s", "d"), "s", "d",
        Seq(Some(1L), None).toDF("seed"), "seed", maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1))
  }

  test("agrees with a naive driver bfs on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(150)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).distinct
    val seeds = Seq(0L, 7L, 13L)
    def naive(maxHops: Int): Map[Long, Int] = {
      val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
      var dist = seeds.map(_ -> 0).toMap
      var frontier = seeds.toSet
      for (h <- 1 to maxHops if frontier.nonEmpty) {
        val next = frontier.flatMap(u => adj.getOrElse(u, Nil))
          .filterNot(dist.contains)
        dist = dist ++ next.map(_ -> h)
        frontier = next
      }
      dist
    }
    for (h <- Seq(1, 3, 8)) assert(bfs(edges, seeds, h) == naive(h), s"h=$h")
  }

  test("labeled BFS keeps per-seed waves separate; harmonic sums exact integer terms") {
    import spark.implicits._
    // chain 1-2-3-4 undirected, seeds {1, 4}: per-seed distances differ
    // where multi-source hopDistance would collapse to the min
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val labeled = Bfs.hopDistanceLabeled(chain.toDF("s", "d"), "s", "d",
        Seq(1L, 4L).toDF("seed"), "seed", maxHops = 5, undirected = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(labeled((1L, 3L)) == 2 && labeled((4L, 3L)) == 1)
    assert(labeled((1L, 4L)) == 3 && labeled((4L, 1L)) == 3)
    assert(labeled((1L, 1L)) == 0)
    // harmonic_fp(2) = 1e12/1 (seed 1) + 1e12 div 2 (seed 4)
    val h = Bfs.harmonicCentrality(chain.toDF("s", "d"), "s", "d",
        Seq(1L, 4L).toDF("seed"), "seed", maxHops = 5, undirected = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(2L) == 1000000000000L + 500000000000L)
    assert(h(3L) == 1500000000000L)
    // seeds see only each OTHER (own distance 0 excluded): 1e12 div 3
    assert(h(1L) == 333333333333L && h(4L) == 333333333333L)
  }
}
