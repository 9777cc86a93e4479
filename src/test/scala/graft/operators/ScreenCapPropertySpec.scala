package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.TestSpark
import graft.operators.multimodal.{ImageDedup, VideoDedup}

/** ScalaCheck pin of the banded-join CAP contract, cross-modal (VERDICT
  * r17 #6): `maxChunkFreq` (batch band joins) has documented drop
  * semantics — a hot chunk key above the cap stops producing candidates
  * — and the invariant every path must satisfy is
  *
  *  1. capped output ⊆ uncapped output (a cap can only DROP pairs), and
  *  2. capped == uncapped when NO bucket exceeds the cap (the cap is
  *     invisible until it binds).
  *
  * Pinned on all three batch band-join shapes over one generator of
  * skew-heavy corpora (hashes drawn from a tiny hot pool with high
  * probability, so small caps actually bind):
  *  - [[ImageDedup.selfJoinFromHashes]] single-chunk AND two-chunk
  *    (pairBands) banding — the image path; the AUDIO energy-hash join
  *    is this same function by design (modality-agnostic), so this pins
  *    audio too;
  *  - [[ImageDedup.joinAgainst]] — the feed-vs-catalog screen, where
  *    the CATALOG side owns the cap;
  *  - [[VideoDedup.selfJoinFromHashes]] — frame-set containment, where
  *    capping drops frame candidates and may sink a pair below
  *    minOverlap (subset at pair level; equality of full rows when the
  *    cap never binds).
  *
  * Bucket occupancy is recomputed here with INDEPENDENT plain-Scala
  * chunk arithmetic (no ImageDedup code), so a banding-arithmetic bug
  * cannot hide by agreeing with itself. The streaming screen's
  * `maxBucketSize` subset contract is pinned in StreamingSpec.
  */
class ScreenCapPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(prop: Prop, n: Int): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n)
      .withWorkers(1), prop)
    assert(r.passed, r.status.toString)
  }

  // --- independent banding arithmetic (test-local, mirrors the spec:
  // n = maxHamming + 1 chunks of base = 64/n bits, last chunk absorbs
  // the remainder; pair banding uses maxHamming + 2 chunks) ---
  private def chunkKey(h: Long, i: Int, n: Int): Long = {
    val base = 64 / n
    val start = i * base
    val len = if (i == n - 1) 64 - start else base
    val mask = if (len >= 64) -1L else (1L << len) - 1L
    (h >>> start) & mask
  }
  private def singleKeys(h: Long, maxH: Int): Seq[(Int, Long)] = {
    val n = maxH + 1
    (0 until n).map(i => i -> chunkKey(h, i, n))
  }
  private def pairKeys(h: Long, maxH: Int): Seq[(Int, Int, Long, Long)] = {
    val n = maxH + 2
    for (i <- 0 until n; j <- i + 1 until n)
      yield (i, j, chunkKey(h, i, n), chunkKey(h, j, n))
  }
  private def comboKeys(h: Long, maxH: Int, w: Int): Seq[(Int, Seq[Long])] = {
    val n = maxH + w
    (0 until n).combinations(w).toSeq.zipWithIndex.map { case (s, cid) =>
      cid -> s.map(chunkKey(h, _, n))
    }
  }
  private def maxBucket[K](keys: Seq[K]): Int =
    if (keys.isEmpty) 0 else keys.groupBy(identity).values.map(_.size).max

  // skew-heavy hash generator: half the rows land on a 3-value hot pool
  // (0 is the flat-image dHash), so caps of 1-4 genuinely bind
  private val genHash: Gen[Long] = Gen.frequency(
    3 -> Gen.oneOf(0L, -1L, 0x0123456789abcdefL),
    2 -> Gen.choose(Long.MinValue, Long.MaxValue))
  private val genCorpus: Gen[(List[Long], Int, Int)] = for {
    n      <- Gen.choose(3, 24)
    hashes <- Gen.listOfN(n, genHash)
    cap    <- Gen.choose(1, 4)
    maxH   <- Gen.oneOf(2, 4, 6)
  } yield (hashes, cap, maxH)

  test("property: selfJoinFromHashes cap = subset, equality when no bucket binds (single + pair bands)") {
    import spark.implicits._
    check(Prop.forAll(genCorpus) { case (hashes, cap, maxH) =>
      val df = hashes.zipWithIndex.map { case (h, i) => (i.toLong, h) }
        .toDF("id", "h")
      // widths 1 (single), 2 (pair), 3 (generalized combo) share the contract
      Seq(1, 2, 3).forall { w =>
        def run(c: Long) = ImageDedup.selfJoinFromHashes(df, "id", "h",
            maxHamming = maxH, maxChunkFreq = c, bandWidth = w)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val capped = run(cap.toLong)
        val uncapped = run(0L)
        val occ = w match {
          case 1 => maxBucket(hashes.flatMap(singleKeys(_, maxH)))
          case 2 => maxBucket(hashes.flatMap(pairKeys(_, maxH)))
          case _ => maxBucket(hashes.flatMap(comboKeys(_, maxH, w)))
        }
        capped.subsetOf(uncapped) &&
          (occ > cap || capped == uncapped)
      }
    }, 12)
  }

  test("property: joinAgainst catalog-side cap = subset, equality when no catalog bucket binds") {
    import spark.implicits._
    check(Prop.forAll(genCorpus) { case (hashes, cap, maxH) =>
      // size >= 3 guarantees both halves are non-empty
      val (feedH, catH) = hashes.splitAt(hashes.size / 2);
      {
        val feed = feedH.zipWithIndex.map { case (h, i) => (i.toLong, h) }
          .toDF("fid", "fh")
        val catalog = catH.zipWithIndex.map { case (h, i) => (1000L + i, h) }
          .toDF("cid", "ch")
        def run(c: Long) = ImageDedup.joinAgainst(feed, "fid", "fh",
            catalog, "cid", "ch", maxHamming = maxH, maxChunkFreq = c)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val capped = run(cap.toLong)
        val uncapped = run(0L)
        // only CATALOG occupancy decides the cap (the feed side is never
        // capped — the documented bounded-side-owns-the-cap contract)
        val occ = maxBucket(catH.flatMap(singleKeys(_, maxH)))
        capped.subsetOf(uncapped) && (occ > cap || capped == uncapped)
      }
    }, 12)
  }

  test("property: video frame-set cap = pair subset, full-row equality when no bucket binds") {
    import spark.implicits._
    val genFrames: Gen[(List[(Long, Int, Long)], Int)] = for {
      nVid   <- Gen.choose(2, 6)
      rows   <- Gen.listOfN(nVid * 3, genHash)
      cap    <- Gen.choose(1, 4)
    } yield (rows.zipWithIndex.map { case (h, k) =>
      ((k % nVid).toLong, k / nVid, h) }, cap)
    check(Prop.forAll(genFrames) { case (rows, cap) =>
      val df = rows.toDF("vid", "fi", "h")
      def run(c: Long) = VideoDedup.selfJoinFromHashes(df, "vid", "fi", "h",
          maxHamming = 4, minOverlap = 0.25, maxChunkFreq = c,
          pairBands = false)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
      val capped = run(cap.toLong)
      val uncapped = run(0L)
      val occ = maxBucket(rows.map(_._3).flatMap(singleKeys(_, 4)))
      val pairsOf = (s: Set[(Long, Long, Long, Long, Long, Long, Double)]) =>
        s.map(t => (t._1, t._2))
      pairsOf(capped).subsetOf(pairsOf(uncapped)) &&
        (occ > cap || capped == uncapped)
    }, 12)
  }
}
