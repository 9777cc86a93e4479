package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.operators.dedup.{Components, TextDedup}

/** ScalaCheck cross-checks of the dedup cores against independent
  * reference implementations (the repo ships two implementations of
  * several algorithms — driver vs distributed, banded vs exact — which
  * is exactly the shape property testing pays off on):
  *  - connected components: driver union-find ≡ distributed
  *    pointer-doubling ≡ an in-test BFS, on random graphs;
  *  - jaccardSelfJoin ≡ brute-force set jaccard, on random corpora;
  *  - minHashSelfJoin: no false positives ever (exact verify), and no
  *    misses far above threshold (banding miss probability ~e-27 there;
  *    AT the threshold the S-curve's ~63% inflection collision rate
  *    makes exact-equality a flaky non-property by design);
  *  - simHashSelfJoin ≡ brute hamming over the same signatures (the
  *    4×16-bit chunk pigeonhole makes ≤3-bit recall exact, not
  *    probabilistic).
  */
class DedupPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(prop: Prop, n: Int): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n)
      .withWorkers(1), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: components driver union-find == distributed doubling == reference BFS") {
    import spark.implicits._
    val genGraph = for {
      n     <- Gen.choose(2, 50)
      m     <- Gen.choose(1, 80)
      edges <- Gen.listOfN(m, for {
                 a <- Gen.choose(0L, n.toLong)
                 b <- Gen.choose(0L, n.toLong) if a != b
               } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct
    check(Prop.forAll(genGraph) { edges =>
      edges.isEmpty || {
        val pairs = edges.toDF("a_id", "b_id")
        // reference: union-find over the raw edge list
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(k => k -> find(k)).toMap
        // labels() returns a CACHED frame by contract — release it per
        // trial, or dozens of stale cache entries turn every upstream
        // unpersist into a CacheManager rebuild storm (OOM'd at 40 trials)
        def got(cap: Long): Map[Long, Long] = {
          val df = Components.labels(pairs, cap)
          try df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          finally df.unpersist()
        }
        got(Components.DriverEdgeCap) == want && got(0L) == want
      }
    }, n = 8)
  }

  test("property: jaccardSelfJoin equals brute-force set jaccard (cap disabled)") {
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val genDocs = for {
      n    <- Gen.choose(3, 10)
      docs <- Gen.listOfN(n, Gen.choose(2, 9).flatMap(len =>
                Gen.listOfN(len, word).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val threshold = 0.3
    check(Prop.forAll(genDocs) { docs =>
      val sh = TextDedup.shingles(docs.toDF("doc_id", "text"), "doc_id", "text", 2)
      val got = TextDedup.jaccardSelfJoin(sh, threshold, maxDocFreq = 1000000)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getDouble(3))).toSet
      val sets = docs.map { case (id, t) =>
        id -> t.split(" ").toSeq.sliding(2).map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty)
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        common = (sa intersect sb).size if common >= 1
        j = BigDecimal(common.toDouble / (sa.size + sb.size - common))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if j >= threshold
      } yield (a, b, common.toLong, j)).toSet
      if (got != want) println(s"JACCARD MISMATCH docs=$docs got=$got want=$want")
      got == want
    }, n = 6)
  }

  test("property: minHashSelfJoin has no false positives and no misses far above threshold") {
    import spark.implicits._
    // near-dup heavy generator: perturbed copies of a base doc plus noise
    val word = Gen.oneOf("w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8", "w9", "wa")
    val genDocs = for {
      base  <- Gen.listOfN(12, word)
      nCopy <- Gen.choose(2, 5)
      copies <- Gen.listOfN(nCopy, Gen.choose(0, 2).flatMap(k =>
                  Gen.listOfN(k, word).map(extra => base ++ extra)))
      noise <- Gen.listOfN(3, Gen.listOfN(8, word))
    } yield (copies ++ noise).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val threshold = 0.5
    check(Prop.forAll(genDocs) { docs =>
      val sh = TextDedup.shingles(docs.toDF("doc_id", "text"), "doc_id", "text", 2)
      val got = TextDedup.minHashSelfJoinTuned(sh, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val sets = docs.map { case (id, t) =>
        id -> t.split(" ").toSeq.sliding(2).map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty)
      def jac(sa: Set[String], sb: Set[String]): Double = {
        val c = (sa intersect sb).size
        BigDecimal(c.toDouble / (sa.size + sb.size - c))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val above = (for { (a, sa) <- sets; (b, sb) <- sets if a < b
                         j = jac(sa, sb) if j >= threshold } yield (a, b, j)).toSet
      val far = above.filter(_._3 >= 0.85)
      got.subsetOf(above) && far.subsetOf(got)
    }, n = 6)
  }

  test("property: simHashSelfJoin equals brute hamming (chunk pigeonhole recall is exact)") {
    import spark.implicits._
    val word = Gen.oneOf("x1", "x2", "x3", "x4", "x5", "x6")
    val genDocs = for {
      n    <- Gen.choose(3, 8)
      docs <- Gen.listOfN(n, Gen.choose(3, 10).flatMap(len =>
                Gen.listOfN(len, word).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    check(Prop.forAll(genDocs) { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = TextDedup.simHashSelfJoin(df, "doc_id", "text", maxHamming = 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue())).toSet
      val sigs = df.select($"doc_id",
          call_function("simhash64", split($"text", " ")).as("sig"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = (for {
        (a, sa) <- sigs; (b, sb) <- sigs if a < b
        h = java.lang.Long.bitCount(sa ^ sb).toLong if h <= 3
      } yield (a, b, h)).toSet
      if (got != want) println(s"SIMHASH MISMATCH docs=$docs got=$got want=$want")
      got == want
    }, n = 6)
  }
}
