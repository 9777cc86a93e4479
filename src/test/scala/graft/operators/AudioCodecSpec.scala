package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.operators.multimodal.{AudioCodec, ImageDedup, WavGen}

class AudioCodecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def header(channels: Int, rate: Int, bits: Int,
                     data: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * bits / 8)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
    out.put("data".getBytes).putInt(data.length).put(data)
    out.array()
  }

  test("WAV header meta: exact fields; non-PCM / non-WAV bytes parse to None") {
    val w = WavGen.square(8000, period = 8, amp = 1000)
    val m = AudioCodec.readMeta(w).get
    assert(m.sampleRate == 8000 && m.channels == 1 &&
      m.bitsPerSample == 16 && m.nFrames == 8000 && m.durationMs == 1000L)
    assert(AudioCodec.readMeta("ID3xxxxxxxxxxxxx".getBytes).isEmpty) // mp3
    assert(AudioCodec.readMeta(w.take(30)).isEmpty)                  // truncated
    assert(AudioCodec.readMeta(
      graft.operators.multimodal.ImageGen.png(8, 8, 1)).isEmpty)     // image
  }

  test("features are exact integer DSP: square-wave RMS == amplitude, hand-counted ZCR") {
    // tiny fixture: [5,5,-5,-5,5,5,-5,-5] -> sign flips at i=2,4,6
    val tiny = AudioCodec.features(WavGen.wrap(Array(5, 5, -5, -5, 5, 5, -5, -5))).get
    assert(tiny.rms == 5L && tiny.peak == 5 && tiny.zeroCrossings == 3L)
    assert(tiny.durationMs == 1L) // 8 frames @ 8 kHz
    // constant-amplitude square: RMS is EXACTLY the amplitude; crossings
    // at every multiple of 4 except 0 -> 8000/4 - 1
    val f = AudioCodec.features(WavGen.square(8000, period = 8, amp = 1000)).get
    assert(f.rms == 1000L && f.peak == 1000 && f.zeroCrossings == 1999L)
    // silence: everything zero
    val silent = AudioCodec.features(WavGen.wrap(Array.fill(100)(0))).get
    assert(silent.rms == 0L && silent.peak == 0 && silent.zeroCrossings == 0L)
  }

  test("8-bit and stereo paths: recentering and floor-average mix-down") {
    val eight = header(1, 8000, 8, Array[Byte]((128 + 10).toByte, (128 - 10).toByte))
    assert(AudioCodec.samples(eight).get.toSeq == Seq(10, -10))
    val stereo = {
      val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Seq(10, 20, -10, -20).foreach(v => bb.putShort(v.toShort))
      header(2, 8000, 16, bb.array())
    }
    assert(AudioCodec.samples(stereo).get.toSeq == Seq(15, -15))
  }

  test("isqrt is exact floor sqrt on boundaries") {
    for (x <- Seq(0L, 1L, 2L, 3L, 4L, 15L, 16L, 17L, 999999L, 1000000L,
      (1L << 40) - 1, 1L << 40))
      assert(AudioCodec.isqrt(x) == math.sqrt(x.toDouble).toLong ||
        { val g = AudioCodec.isqrt(x); g * g <= x && (g + 1) * (g + 1) > x })
  }

  test("energy fingerprint: flat envelope hashes 0; near-dups land close, distinct tones far") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // constant-amplitude square: flat envelope, no rises
    assert(AudioCodec.energyHash(WavGen.square(8000, 8, 1000)).get == 0L)
    val a = WavGen.saw(8000, period = 200, amp = 8000, seed = 1)
    val h = AudioCodec.energyHash(a).get
    assert(AudioCodec.energyHash(WavGen.perturb(a, 4, seed = 9)).map(ham(_, h)).get <= 6)
    // clips below one envelope window: None, not garbage
    assert(AudioCodec.energyHash(WavGen.wrap(Array.fill(64)(5))).isEmpty)
  }

  test("mp4 container metadata parses real box structure; rejects non-BMFF") {
    import graft.operators.multimodal.{Mp4Gen, Multimodal, VideoMeta}
    val v = Mp4Gen.mp4(timescale = 1000, durationTicks = 5000L, w = 640, h = 360)
    val m = VideoMeta.readMeta(v).get
    assert(m.majorBrand == "isom" && m.durationMs == 5000L &&
      m.width == 640 && m.height == 360 && m.nTracks == 1)
    // sniffer and parser agree on the container
    assert(Multimodal.sniffFormat(v) == "mp4")
    // odd timescale: integer floor duration
    assert(VideoMeta.readMeta(Mp4Gen.mp4(600, 1001L, 320, 240)).get
      .durationMs == 1001L * 1000L / 600L)
    assert(VideoMeta.readMeta(WavGen.square(100, 4, 5)).isEmpty)
    assert(VideoMeta.readMeta("free text".getBytes).isEmpty)
    // truncated after ftyp: the brand survives, the moov fields honestly
    // report absent (-1 duration, 0 dims/tracks) — no exception
    val trunc = VideoMeta.readMeta(v.take(20)).get
    assert(trunc.majorBrand == "isom" && trunc.durationMs == -1L &&
      trunc.width == 0 && trunc.nTracks == 0)
  }

  test("audio near-dup rides the modality-agnostic banded Hamming join") {
    import spark.implicits._
    // fingerprints vary with AMPLITUDE MODULATION; build clips whose
    // envelopes differ (seeded amp steps), plus a perturbed near-dup
    def modulated(seed: Long): Array[Byte] = {
      var s = seed
      val pcm = Array.tabulate(8000) { i =>
        if (i % 500 == 0) { s = s * 6364136223846793005L + 1442695040888963407L }
        val amp = 2000 + math.abs(s % 12000L).toInt
        ((i % 100) * 2 * amp / 100 - amp)
      }
      WavGen.wrap(pcm)
    }
    val x = modulated(4)
    val rows = Seq(
      ("x", x), ("x_copy", x.clone()),
      ("x_tweak", WavGen.perturb(x, 3, seed = 2)),
      ("y", modulated(99)), ("z", modulated(1234)),
      ("bad", "not audio".getBytes))
    val hashes = rows.toDF("name", "content").select($"name",
      org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
        AudioCodec.energyHash(b)).apply($"content").as("h"))
      .filter($"h".isNotNull)
    assert(hashes.count() == 5) // bad row dropped
    val pairs = ImageDedup.selfJoinFromHashes(hashes, "name", "h", maxHamming = 6)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(pairs(("x", "x_copy")) == 0)
    assert(pairs.contains(("x", "x_tweak")))
    assert(!pairs.keySet.exists(p => p._1 == "y" || p._2 == "y"))
    assert(!pairs.keySet.exists(p => p._1 == "z" || p._2 == "z"))
  }
}
