package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.graph.KCore

class KCoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // localFinishEdges = 0 keeps these semantic pins on the DISTRIBUTED
  // peel loop; the local tail-finish has its own three-way equality test
  private def core(edges: Seq[(Long, Long)], k: Int, maxIter: Int = 30,
                   localFinishEdges: Long = 0L) = {
    import spark.implicits._
    KCore.run(edges.toDF("s", "d"), "s", "d", k, maxIter, localFinishEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangle with a tail: the tail peels, the triangle is the 2-core") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(core(e, k = 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(core(e, k = 3).isEmpty) // a triangle is not a 3-core
  }

  test("peeling cascades: a path graph dissolves layer by layer") {
    // endpoints strip each round; 5 nodes need 2 peel rounds + fixpoint
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(core(path, k = 2).isEmpty)
    // the full path IS the 1-core
    assert(core(path, k = 1).keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("clique degrees come back as within-core degrees") {
    val clique = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    assert(core(clique, k = 4) == (1L to 5L).map(_ -> 4L).toMap)
    // attach a pendant to node 1: core unchanged, and node 1's deg stays
    // 4 (the pendant is outside the core, so it must not count)
    assert(core(clique :+ ((1L, 99L)), k = 4) == (1L to 5L).map(_ -> 4L).toMap)
  }

  test("direction and duplicate edges do not matter; self-loops drop") {
    val e = Seq((2L, 1L), (1L, 2L), (3L, 2L), (3L, 1L), (1L, 1L), (3L, 3L))
    assert(core(e, k = 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("maxIter too low fails loudly instead of returning a half-peel") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    val ex = intercept[IllegalStateException](core(path, k = 2, maxIter = 1))
    assert(ex.getMessage.contains("did not converge"))
  }

  test("adversarial deep peel: a long path strips one layer per round (O(n) depth)") {
    // 2-core of a bare path is empty, reached only after ~n/2 peel rounds
    // (each round removes just the two current endpoints) — the worst
    // case for the delta-peel loop's round count, and the case where its
    // per-round cost advantage matters: the frontier is 2 nodes, so each
    // round must NOT re-aggregate the whole surviving path
    val n = 41
    val path = (1L until n).map(i => (i, i + 1))
    assert(core(path, k = 2, maxIter = n).isEmpty)
    // clique welded onto the path's end survives with within-core degrees
    // intact after the full path has peeled away through it
    val clique = for (i <- 100L to 104L; j <- (i + 1) to 104L) yield (i, j)
    val welded = path ++ clique :+ ((n.toLong, 100L))
    assert(core(welded, k = 4, maxIter = n) == (100L to 104L).map(_ -> 4L).toMap)
  }

  private def coreness(edges: Seq[(Long, Long)], maxK: Int,
                       localFinishEdges: Long = 0L): Map[Long, Long] = {
    import spark.implicits._
    KCore.coreness(edges.toDF("s", "d"), "s", "d", maxK,
        localFinishEdges = localFinishEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("coreness: path=1, triangle=2, clique=4, clamp at maxK") {
    // triangle (1,2,3) with tail 3-4-5; K5 on 100..104 welded at 4
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(coreness(tri, maxK = 5) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
    val k5 = for (i <- 100L to 104L; j <- (i + 1) to 104L) yield (i, j)
    val welded = tri ++ k5 :+ ((4L, 100L))
    val c = coreness(welded, maxK = 6)
    assert((100L to 104L).forall(c(_) == 4L))
    // node 4 bridges the tail and the clique (neighbors 3, 5, 100): it
    // survives the 2-peel (degree 2 after node 5 goes) but not the 3-peel
    assert(c(1L) == 2L && c(4L) == 2L && c(5L) == 1L)
    // clamp: maxK=2 reports the K5 members as ">= 2"
    val clamped = coreness(welded, maxK = 2)
    assert((100L to 104L).forall(clamped(_) == 2L))
    assert(clamped(5L) == 1L)
  }

  test("coreness maxK=0 runs to empty: true core numbers with no ceiling guess") {
    // deep graph where the true degeneracy (8, the K9) exceeds any
    // "reasonable" clamp a user might guess from the path/triangle shell
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val k9 = for (i <- 100L to 108L; j <- (i + 1) to 108L) yield (i, j)
    val welded = tri ++ k9 :+ ((4L, 100L))
    val full = coreness(welded, maxK = 0)
    assert((100L to 108L).forall(full(_) == 8L)) // true degeneracy, not ">= clamp"
    assert(full(1L) == 2L && full(4L) == 2L && full(5L) == 1L)
    // run-to-empty == a clamp set above the degeneracy, on every node
    assert(full == coreness(welded, maxK = 20))
    // and the clamped run reports the K9 members as ">= 3"
    assert(coreness(welded, maxK = 3).filter(_._2 == 3L).keySet ==
      (100L to 108L).toSet)
    // edgeless input: nothing alive, empty result either way
    assert(coreness(Seq((7L, 7L)), maxK = 0).isEmpty)
  }

  test("coreness agrees with iterated run() memberships on a seeded random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(140)((rnd.nextInt(28).toLong, rnd.nextInt(28).toLong))
      .filter(p => p._1 != p._2).distinct
    val maxK = 6
    val c = coreness(edges, maxK)
    // coreness(v) >= k  <=>  v in the k-core, for every k up to the clamp
    for (k <- 1 to maxK) {
      val members = KCore.run(edges.toDF("s", "d"), "s", "d", k)
        .collect().map(_.getLong(0)).toSet
      assert(c.filter(_._2 >= k).keySet == members, s"k=$k")
    }
  }

  test("agrees with a naive driver peel on a seeded random graph") {
    val rnd = new scala.util.Random(99)
    val edges = Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2).distinct
    def naive(k: Int): Map[Long, Long] = {
      var adj = edges.flatMap(p => Seq(p, p.swap)).distinct
      var deg = adj.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
      var changed = true
      while (changed) {
        val dead = deg.filter(_._2 < k).keySet
        changed = dead.nonEmpty
        adj = adj.filter(p => !dead(p._1) && !dead(p._2))
        deg = adj.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
      }
      deg
    }
    for (k <- Seq(2, 3, 4)) assert(core(edges, k) == naive(k), s"k=$k")
  }

  test("local tail-finish is bit-identical to pure distributed peeling") {
    // seeded random graph, deep enough to cascade through several levels;
    // thresholds straddle the graph size so the finish triggers AT ENTRY
    // (1e6: whole graph local), MID-PEEL (after a compaction boundary
    // drops the remnant under the cap), and NEVER (0: pure distributed) —
    // the unique-fixpoint argument says all paths must agree exactly
    val rnd = new scala.util.Random(4242)
    val edges = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2).distinct
    val pureFull = coreness(edges, maxK = 0, localFinishEdges = 0L)
    for (t <- Seq(1000000L, 200L, 100L, 30L))
      assert(coreness(edges, maxK = 0, localFinishEdges = t) == pureFull, s"t=$t")
    val pureClamped = coreness(edges, maxK = 2, localFinishEdges = 0L)
    for (t <- Seq(1000000L, 200L, 30L))
      assert(coreness(edges, maxK = 2, localFinishEdges = t) == pureClamped, s"t=$t")
    val pureCore = core(edges, k = 3, localFinishEdges = 0L)
    for (t <- Seq(1000000L, 200L, 30L))
      assert(core(edges, k = 3, localFinishEdges = t) == pureCore, s"t=$t")
    // isolated stragglers: a star whose center holds every leaf alive —
    // once the center peels nothing has edges, and remnant collection
    // must still label the leaves (they ride the alive list, not the
    // edge table)
    val star = (2L to 12L).map(i => (1L, i))
    val starPure = coreness(star, maxK = 0, localFinishEdges = 0L)
    for (t <- Seq(1000000L, 8L))
      assert(coreness(star, maxK = 0, localFinishEdges = t) == starPure, s"star t=$t")
  }

  test("graft.checkpoint.dir routes loop frames to reliable checkpoints, identical output") {
    // the r18 verdict ask #4: the "swap localCheckpoint for reliable
    // checkpoints at 100 TB" claim is now a conf — a peel run with it set
    // must produce the same fixpoint (unique, so bit-identical maps) while
    // actually writing checkpoint data under the directory
    val rnd = new scala.util.Random(1919)
    val edges = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).distinct
    val local = core(edges, k = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    spark.conf.set(graft.LoopFrames.CheckpointDirKey, dir)
    try {
      val reliable = core(edges, k = 3)
      assert(reliable == local)
      // the switch really engaged: checkpoint files landed under dir
      def anyFile(p: java.io.File): Boolean =
        p.isFile || Option(p.listFiles()).exists(_.exists(anyFile))
      assert(anyFile(new java.io.File(dir)),
        "no checkpoint data written — the conf did not route")
    } finally spark.conf.unset(graft.LoopFrames.CheckpointDirKey)
  }
}
