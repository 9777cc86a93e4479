package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.multimodal.{ImageCodec, ImageDedup, ImageGen}

class ImageDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("readMeta returns true header dims for png/jpeg/bmp/gif; None otherwise") {
    val img = ImageGen.pattern(40, 30, seed = 1)
    for (fmt <- Seq("png", "jpg", "bmp", "gif")) {
      val bytes = ImageGen.encode(img, fmt)
      val meta = ImageCodec.readMeta(bytes)
      assert(meta.isDefined, fmt)
      assert(meta.get._2 == 40 && meta.get._3 == 30, s"$fmt dims")
    }
    assert(ImageCodec.readMeta("RIFF0000WAVExxxx".getBytes).isEmpty)
    assert(ImageCodec.readMeta(Array.empty[Byte]).isEmpty)
    // png magic bytes with a garbage body: sniffs as png, but no reader
    // accepts it — meta must be None, not an exception
    val fake = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10) ++
      Array.fill[Byte](64)(7)
    assert(ImageCodec.readMeta(fake).isEmpty && ImageCodec.decode(fake).isEmpty)
  }

  test("grayResize is exact integer box averaging") {
    // 2x2 gray grid -> 1x1: floor mean; -> 2x1: column means
    val g = Array(10, 20, 30, 41)
    assert(ImageCodec.grayResize(g, 2, 2, 1, 1).toSeq == Seq((10 + 20 + 30 + 41) / 4))
    assert(ImageCodec.grayResize(g, 2, 2, 2, 1).toSeq == Seq(20, 30))
    // upscale = nearest-neighbor boxes
    assert(ImageCodec.grayResize(Array(7), 1, 1, 3, 2).toSeq == Seq.fill(6)(7))
  }

  test("dHash: gradient rows set every bit; flat image sets none; packing is row-major") {
    // strictly brightening left->right at grid scale: all 64 bits set
    val inc = new java.awt.image.BufferedImage(90, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 90) {
      val v = x * 255 / 89
      inc.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    assert(ImageCodec.dHashImage(inc) == -1L) // 64 ones
    val flat = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) flat.setRGB(x, y, 0x808080)
    assert(ImageCodec.dHashImage(flat) == 0L)
    // aHash on flat: no cell exceeds the mean -> 0
    assert(ImageCodec.aHashImage(flat) == 0L)
  }

  test("perceptual stability: re-encode and resize preserve dHash; perturbation stays near") {
    val img = ImageGen.pattern(64, 48, seed = 42)
    val h0 = ImageCodec.dHash(ImageGen.encode(img, "png")).get
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // lossless re-encode: identical pixels, identical hash
    assert(ImageCodec.dHash(ImageGen.encode(img, "bmp")).get == h0)
    // JPEG (lossy): small hamming drift, far from random (32)
    assert(ham(ImageCodec.dHash(ImageGen.encode(img, "jpg")).get, h0) <= 6)
    // downscaled copy of the same scene: dHash is scale-invariant-ish
    val half = ImageCodec.grayResize(
      ImageCodec.grayPixels(img)._1, 64, 48, 32, 24)
    val halfPng = ImageCodec.encodeGrayPng(half, 32, 24)
    assert(ham(ImageCodec.dHash(halfPng).get, h0) <= 8)
    // a few flipped pixels: near-dup distance
    val tweaked = ImageGen.encode(ImageGen.perturb(img, n = 3, seed = 7), "png")
    assert(ham(ImageCodec.dHash(tweaked).get, h0) <= 6)
    // a different seeded pattern: far
    val other = ImageGen.png(64, 48, seed = 1043)
    assert(ham(ImageCodec.dHash(other).get, h0) > 8)
  }

  test("thumbnail: real PNG out, decodes back to target dims, volume scales with target") {
    val src = ImageGen.png(128, 96, seed = 5)
    val th = ImageCodec.resizePng(src, 16, 12).get
    val meta = ImageCodec.readMeta(th).get
    assert(meta._1 == "png" && meta._2 == 16 && meta._3 == 12)
    assert(th.length < src.length, "thumbnail must be smaller than the source")
    // deterministic: same bytes + dims -> same thumbnail bytes
    assert(ImageCodec.resizePng(src, 16, 12).get.sameElements(th))
    // pixel grid equals grayResize exactly (PNG is lossless)
    val back = ImageCodec.grayPixels(ImageCodec.decode(th).get)._1
    val (g, w, h) = ImageCodec.grayPixels(ImageCodec.decode(src).get)
    assert(back.toSeq == ImageCodec.grayResize(g, w, h, 16, 12).toSeq)
    assert(ImageCodec.resizePng("not an image".getBytes, 8, 8).isEmpty)
  }

  test("tinyEmbed: real gray-layout feature, unit norm, zero-safe") {
    val img = ImageCodec.decode(ImageGen.png(32, 32, seed = 9)).get
    val e = ImageCodec.tinyEmbed(img, 64)
    assert(e.length == 64)
    val norm = math.sqrt(e.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // identical scene downscaled: high cosine with itself re-encoded
    val e2 = ImageCodec.tinyEmbed(ImageCodec.decode(ImageGen.encode(
      ImageGen.pattern(32, 32, seed = 9), "bmp")).get, 64)
    assert(e.zip(e2).map { case (a, b) => a.toDouble * b }.sum > 0.999)
    // all-black image: zero vector, no NaN blow-up
    val black = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    assert(ImageCodec.tinyEmbed(black, 16).forall(_ == 0.0f))
  }

  test("banding completeness: banded pairs == brute-force pairs within radius (pigeonhole)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // clustered hash population: base values plus few-bit flips, so pairs
    // exist at several distances around each threshold
    val base = Seq.fill(6)(rnd.nextLong())
    val sigs = (0 until 60).map { i =>
      var h = base(i % base.size)
      val flips = rnd.nextInt(9)
      (0 until flips).foreach(_ => h ^= 1L << rnd.nextInt(64))
      (i.toLong, h)
    }
    val df = sigs.toDF("id", "h")
    for (m <- Seq(0, 3, 6, 10)) {
      val got = ImageDedup.selfJoinFromHashes(df, "id", "h", maxHamming = m)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (a, ha) <- sigs; (b, hb) <- sigs if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= m
      } yield (a, b, d)).toSet
      assert(got == want, s"maxHamming=$m")
    }
  }

  test("image near-dup end-to-end: exact dup at 0, perturbed copies near, others apart") {
    import spark.implicits._
    val a = ImageGen.png(64, 48, seed = 100)
    val aCopy = ImageGen.png(64, 48, seed = 100) // byte-identical
    val aTweak = ImageGen.encode(ImageGen.perturb(
      ImageGen.pattern(64, 48, seed = 100), 2, seed = 3), "png")
    val b = ImageGen.png(64, 48, seed = 777)
    val rows = Seq(("a", a), ("a_copy", aCopy), ("a_tweak", aTweak),
      ("b", b), ("bad", "not an image".getBytes))
    val df = rows.toDF("name", "content")
    val pairs = ImageDedup.selfJoin(df, "name", "content", maxHamming = 6)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(pairs(("a", "a_copy")) == 0)
    assert(pairs.contains(("a", "a_tweak")) && pairs(("a", "a_tweak")) <= 6)
    assert(!pairs.keySet.exists(p => p._1 == "b" || p._2 == "b"))
    assert(!pairs.keySet.exists(p => p._1 == "bad" || p._2 == "bad"),
      "undecodable rows are dropped, not paired")
    // hashes() drops only the undecodable row
    assert(ImageDedup.hashes(df, "name", "content").count() == 4)
  }

  test("hot-chunk cap drops capped keys' candidates only") {
    import spark.implicits._
    // 10 identical hashes (one hot bucket in every chunk) + one isolated pair
    val rows = (0L until 10L).map(i => (i, 0L)) ++
      Seq((20L, 123456789L), (21L, 123456789L))
    val df = rows.toDF("id", "h")
    val capped = ImageDedup.selfJoinFromHashes(df, "id", "h",
        maxHamming = 3, maxChunkFreq = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((20L, 21L)), "hot flat-hash group capped away; pair survives")
    val uncapped = ImageDedup.selfJoinFromHashes(df, "id", "h", maxHamming = 3)
    assert(uncapped.count() == 45 + 1)
  }

  test("exactGroups: byte-identical files share a min-id group") {
    import spark.implicits._
    val x = ImageGen.png(16, 16, seed = 1)
    val df = Seq((3L, x), (1L, x), (2L, ImageGen.png(16, 16, seed = 2)))
      .toDF("id", "content")
    val g = ImageDedup.exactGroups(df, "id", "content")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(g == Map(1L -> 1L, 3L -> 1L, 2L -> 2L))
  }

  test("pairBands: two-chunk banding returns exactly the single-chunk pair set") {
    import spark.implicits._
    // seeded hashes with planted near-collisions at several radii; the
    // pigeonhole argument says both bandings have 100% recall within the
    // radius, so the verified pair sets must be IDENTICAL
    val rnd = new scala.util.Random(5150)
    val base = (0 until 60).map(i => (i.toLong, rnd.nextLong()))
    val planted = (0 until 12).map { i =>
      val (_, h) = base(i * 3)
      val flips = (0 to i % 6).map(b => 1L << ((b * 11 + i) % 64))
        .foldLeft(0L)(_ | _) // up to 6 bits flipped
      (1000L + i, h ^ flips)
    }
    val df = (base ++ planted).toDF("id", "h")
    for (r <- Seq(2, 4, 6)) {
      val single = ImageDedup.selfJoinFromHashes(df, "id", "h", maxHamming = r)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      val paired = ImageDedup.selfJoinFromHashes(df, "id", "h", maxHamming = r,
          pairBands = true)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      assert(paired == single, s"r=$r")
      // generalized multi-index banding (r18): width-3 and width-4 combos
      // must return the identical pair set — the pigeonhole holds for any
      // width (differ in <= r of r+w chunks => agree on >= w => some
      // w-subset matches entirely)
      // width 5 exercises the actual-bit-width combo-key packing (r19,
      // ADVICE r18: the old fixed 16-bit slots shifted the leading chunk
      // keys out of the long at width >= 5, silently colliding combos —
      // recall survived but posting lists blew up); r=6 w=5 gives c=11
      // chunks of 5/6/14 bits whose 5-subsets pack to <= 64 bits exactly
      for (w <- Seq(3, 4, 5)) {
        val combo = ImageDedup.selfJoinFromHashes(df, "id", "h", maxHamming = r,
            bandWidth = w)
          .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
        assert(combo == single, s"r=$r width=$w")
      }
      // brute-force ground truth
      val all = base ++ planted
      val brute = (for (a <- all; b <- all if a._1 < b._1;
                        d = java.lang.Long.bitCount(a._2 ^ b._2) if d <= r)
        yield (a._1, b._1, d)).toSet
      assert(single == brute, s"r=$r vs brute force")
    }
  }

  test("joinAgainst: feed-vs-catalog pairs == cross pairs of a union self-join") {
    import spark.implicits._
    // seeded hash sets with planted near-collisions across the two sides
    val rnd = new scala.util.Random(7311)
    val cat = (0 until 40).map(i => (s"c$i", rnd.nextLong()))
    val feed = (0 until 25).map { i =>
      if (i % 3 == 0) (s"f$i", cat(i % 40)._2 ^ (1L << (i % 64))) // 1 bit off
      else (s"f$i", rnd.nextLong())
    }
    val got = ImageDedup.joinAgainst(feed.toDF("id", "h"), "id", "h",
        cat.toDF("id", "h"), "id", "h", maxHamming = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // reference: brute-force cross distances within the radius
    val want = (for ((fi, fh) <- feed; (ci, ch) <- cat
                     if java.lang.Long.bitCount(fh ^ ch) <= 4)
      yield (fi, ci, java.lang.Long.bitCount(fh ^ ch))).toSet
    assert(got == want) // pigeonhole recall is exact across tables too
    assert(want.size >= 9, "fixture must plant cross matches")
    // generalized widths (r18): the catalog-scale knob must not change
    // the result set (pigeonhole recall is exact at any width)
    for (w <- Seq(2, 3)) {
      val combo = ImageDedup.joinAgainst(feed.toDF("id", "h"), "id", "h",
          cat.toDF("id", "h"), "id", "h", maxHamming = 4, bandWidth = w)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(combo == want, s"width=$w")
    }
    // catalog-side cap: a hot catalog hash shared 12x is capped away
    val hotCat = (0 until 12).map(i => (s"h$i", 42L))
    val hotFeed = Seq(("f0", 42L))
    val capped = ImageDedup.joinAgainst(hotFeed.toDF("id", "h"), "id", "h",
      hotCat.toDF("id", "h"), "id", "h", maxHamming = 7, maxChunkFreq = 4L)
    assert(capped.count() == 0)
    // ...at any width (identical hashes share every combo key)
    val cappedW = ImageDedup.joinAgainst(hotFeed.toDF("id", "h"), "id", "h",
      hotCat.toDF("id", "h"), "id", "h", maxHamming = 7, maxChunkFreq = 4L,
      bandWidth = 3)
    assert(cappedW.count() == 0)
  }
}
