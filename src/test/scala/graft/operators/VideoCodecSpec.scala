package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.multimodal.{AviGen, GifGen, ImageCodec, ImageGen, VideoCodec, VideoDedup}

class VideoCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("readAviMeta returns the literal header fields AviGen wrote; None otherwise") {
    val avi = AviGen.pattern(48, 36, nFrames = 8, seed = 1, usPerFrame = 40000)
    val m = VideoCodec.readAviMeta(avi).get
    assert(m.handler == "MJPG")
    assert(m.usPerFrame == 40000 && m.totalFrames == 8)
    assert(m.width == 48 && m.height == 36 && m.nStreams == 1)
    assert(m.durationMs == 320L) // 8 frames x 40ms, exact integer
    assert(VideoCodec.readAviMeta("RIFF0000WAVE".getBytes ++
      Array.fill[Byte](32)(0)).isEmpty) // RIFF but not AVI
    assert(VideoCodec.readAviMeta(Array.empty[Byte]).isEmpty)
    assert(VideoCodec.readAviMeta(null).isEmpty)
    // truncated mid-movi: header still parses, never throws
    assert(VideoCodec.readAviMeta(avi.take(avi.length / 2)).isDefined)
  }

  test("AVI frames decode for REAL: count, dims, and even sampling") {
    val avi = AviGen.pattern(40, 30, nFrames = 20, seed = 5)
    assert(VideoCodec.frameCount(avi).contains(20))
    val all = VideoCodec.sampleFrames(avi, 64)
    assert(all.map(_._1) == (0 until 20))
    assert(all.forall { case (_, img) => img.getWidth == 40 && img.getHeight == 30 })
    // maxFrames < total: integer grid i*total/n, first frame included
    val some = VideoCodec.sampleFrames(avi, 8)
    assert(some.map(_._1) == Seq(0, 2, 5, 7, 10, 12, 15, 17))
    // decoded pixels match a direct decode of the same JPEG bytes
    val direct = ImageCodec.decode(ImageGen.jpeg(40, 30, 5)).get
    assert(ImageCodec.dHashImage(all.head._2) == ImageCodec.dHashImage(direct))
  }

  test("animated GIF frames decode by index; frames differ across the walk") {
    val gif = GifGen.pattern(24, 16, nFrames = 5, seed = 9, step = 50)
    assert(VideoCodec.frameCount(gif).contains(5))
    val fs = VideoCodec.sampleFrames(gif, 16)
    assert(fs.map(_._1) == (0 until 5))
    assert(fs.forall { case (_, img) => img.getWidth == 24 && img.getHeight == 16 })
    val hashes = VideoCodec.frameHashes(gif, 16).get.map(_._2)
    assert(hashes.distinct.size > 1, "step-walked frames must not all hash alike")
    // single-frame (static) gif still works
    assert(VideoCodec.frameCount(ImageGen.encode(ImageGen.pattern(10, 10, 3), "gif"))
      .contains(1))
  }

  test("frameHashes: identical content hashes identically; perturbation stays near") {
    val frames = (0 until 6).map(i => ImageGen.pattern(48, 36, 100L + i * 3))
    val a = AviGen.aviFromJpegs(frames.map(ImageGen.encode(_, "jpg")), 48, 36)
    val b = AviGen.aviFromJpegs(frames.map(ImageGen.encode(_, "jpg")), 48, 36,
      usPerFrame = 20000) // re-mux at a different frame rate: same pixels
    assert(VideoCodec.frameHashes(a, 16) == VideoCodec.frameHashes(b, 16))
    val p = AviGen.aviFromJpegs(
      frames.map(f => ImageGen.encode(ImageGen.perturb(f, 2, seed = 4), "jpg")), 48, 36)
    val ha = VideoCodec.frameHashes(a, 16).get
    val hp = VideoCodec.frameHashes(p, 16).get
    val dists = ha.zip(hp).map { case ((_, x), (_, y)) =>
      java.lang.Long.bitCount(x ^ y) }
    assert(dists.forall(_ <= 7), s"perturbed frames drifted too far: $dists")
    assert(VideoCodec.frameHashes("not a video".getBytes, 16).isEmpty)
  }

  test("VideoDedup end-to-end: re-encode pairs at 1.0, excerpt contains at 1.0") {
    import spark.implicits._
    val frames = (0 until 8).map(i => ImageGen.pattern(48, 36, 500L + i * 3))
    val rows = Seq(
      ("v1", AviGen.aviFromJpegs(frames.map(ImageGen.encode(_, "jpg")), 48, 36)),
      ("v2", AviGen.aviFromJpegs(
        frames.map(f => ImageGen.encode(ImageGen.perturb(f, 2, seed = 9), "jpg")),
        48, 36)),
      ("v3", AviGen.aviFromJpegs( // 4-frame excerpt: the trim case
        frames.drop(4).map(ImageGen.encode(_, "jpg")), 48, 36)),
      ("g1", GifGen.pattern(40, 30, nFrames = 6, seed = 700, step = 5)),
      ("g2", GifGen.animated((0 until 6).map(i =>
        ImageGen.perturb(ImageGen.pattern(40, 30, 700L + i * 5), 2, seed = 11)))),
      ("nv", "not a video at all".getBytes))
    val df = rows.toDF("id", "content")
    val hashed = VideoDedup.frameHashes(df, "id", "content", maxFrames = 16)
    // the undecodable row is dropped, real rows all fingerprint
    assert(hashed.select("id").distinct().as[String].collect().toSet ==
      Set("v1", "v2", "v3", "g1", "g2"))
    val pairs = VideoDedup.selfJoin(df, "id", "content",
        maxFrames = 16, maxHamming = 7, minOverlap = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6)).toMap
    assert(pairs((("v1", "v2"))) == 1.0, "per-frame perturbation within radius")
    assert(pairs((("v1", "v3"))) == 1.0, "excerpt must contain at 1.0")
    assert(pairs((("g1", "g2"))) == 1.0, "gif near-dup pair")
    assert(pairs.values.forall(v => v >= 0.5 && v <= 1.0))
    assert(pairs.keys.forall { case (a, b) => a < b })
    // two-chunk banding is a pure candidate-generation change: the
    // verified pair table must be identical (pigeonhole recall)
    val paired = VideoDedup.selfJoin(df, "id", "content",
        maxFrames = 16, maxHamming = 7, minOverlap = 0.5, pairBands = true)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6)).toMap
    assert(paired == pairs)
  }

  test("VideoScenes: hash-delta cuts segment a clip; static clip is one scene") {
    import spark.implicits._
    import graft.operators.multimodal.VideoScenes
    // three static 3-frame segments: within a segment frames are
    // byte-identical JPEGs (hamming 0), across segments the pattern
    // changes -> cuts exactly at frames 3 and 6
    val segs = Seq(111L, 111L, 111L, 2345L, 2345L, 2345L, 67L, 67L, 67L)
    val cuts = AviGen.aviFromJpegs(segs.map(sd => ImageGen.jpeg(48, 36, sd)), 48, 36)
    val static = AviGen.pattern(48, 36, nFrames = 5, seed = 40, step = 0)
    val df = Seq(("cuts", cuts), ("static", static)).toDF("id", "content")
    val scenes = VideoScenes.detect(df, "id", "content",
        maxFrames = 16, cutThreshold = 10)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getInt(2), r.getBoolean(3), r.getLong(4))).toMap
    assert((0 until 9).map(i => scenes(("cuts", i))._3) ==
      Seq(0L, 0L, 0L, 1L, 1L, 1L, 2L, 2L, 2L))
    assert(scenes(("cuts", 3))._2 && scenes(("cuts", 6))._2)
    assert(scenes(("cuts", 0))._1 == -1) // first frame: no predecessor
    assert(scenes(("cuts", 1))._1 == 0)  // identical bytes -> hamming 0
    assert((0 until 5).forall(i => scenes(("static", i))._3 == 0L))
  }

  test("VideoScreen: excerpt feed clip contains against the catalog at 1.0") {
    import spark.implicits._
    import graft.operators.multimodal.VideoScreen
    val frames = (0 until 8).map(i => ImageGen.pattern(48, 36, 600L + i * 3))
    val catalog = Seq(
      ("cat1", AviGen.aviFromJpegs(frames.map(ImageGen.encode(_, "jpg")), 48, 36)),
      ("cat2", AviGen.pattern(48, 36, nFrames = 6, seed = 7700, step = 5)))
      .toDF("id", "content")
    val feed = Seq(
      ("new1", AviGen.aviFromJpegs( // 4-frame excerpt of cat1: a re-upload
        frames.drop(4).map(ImageGen.encode(_, "jpg")), 48, 36)),
      ("new2", AviGen.pattern(48, 36, nFrames = 6, seed = 991100, step = 8)))
      .toDF("id", "content")
    val catHashes = VideoDedup.frameHashes(catalog, "id", "content", maxFrames = 16)
    val feedHashes = VideoDedup.frameHashes(feed, "id", "content", maxFrames = 16)
    val hits = VideoScreen.screenFromHashes(
        feedHashes, "id", "frame_idx", "frame_hash",
        catHashes, "id", "frame_idx", "frame_hash",
        maxHamming = 7, minOverlap = 0.5)
      .collect().map(r => (r.getString(1), r.getString(0)) -> r.getDouble(6)).toMap
    assert(hits((("cat1", "new1"))) == 1.0, "excerpt contains through its own side")
    assert(!hits.keySet.exists(_._2 == "new2"), "fresh content passes the screen")
    // generalized band width must not change the screen result (r18)
    val hitsW = VideoScreen.screenFromHashes(
        feedHashes, "id", "frame_idx", "frame_hash",
        catHashes, "id", "frame_idx", "frame_hash",
        maxHamming = 7, minOverlap = 0.5, bandWidth = 3)
      .collect().map(r => (r.getString(1), r.getString(0)) -> r.getDouble(6)).toMap
    assert(hitsW == hits, "width-3 screen == single-chunk screen")
  }

  test("VideoDedup hot-hash cap drops capped chunk keys deterministically") {
    import spark.implicits._
    // static clips: every frame of each clip hashes alike -> one hot hash
    val static1 = AviGen.pattern(32, 24, nFrames = 6, seed = 40, step = 0)
    val static2 = AviGen.pattern(32, 24, nFrames = 6, seed = 40, step = 0)
    val df = Seq(("s1", static1), ("s2", static2)).toDF("id", "content")
    val open = VideoDedup.selfJoin(df, "id", "content", maxFrames = 16,
      maxHamming = 7, minOverlap = 0.5)
    assert(open.count() == 1) // the pair matches through every frame
    // cap below the posting-list size (12 identical hashes x each chunk):
    // all chunks of the hot hash are capped away -> no candidates at all
    val capped = VideoDedup.selfJoin(df, "id", "content", maxFrames = 16,
      maxHamming = 7, minOverlap = 0.5, maxChunkFreq = 4L)
    assert(capped.count() == 0)
  }
}
