package graft.operators.multimodal

/** REAL audio decode for WAV/PCM on the bare JDK — a self-contained
  * RIFF/WAVE parser (canonical PCM: 8-bit unsigned / 16-bit signed LE,
  * any channel count) plus integer DSP features, completing the r17
  * multimodal push: images decode via [[ImageCodec]], WAV audio decodes
  * here, and only compressed audio/video (mp3/mp4 — no JDK codec) keeps
  * the documented synthetic-fallback embedding. Reference counterpart:
  * the binary ingestion surfaces (MLSQLBinaryFile.scala); the feature
  * set is the standard curation screen (duration/loudness/activity) a
  * training-data audio pipeline gates on.
  *
  * Determinism: the parser reads little-endian header fields exactly;
  * every feature is pure integer arithmetic over the PCM samples —
  * channel mix-down is floor-average, RMS is an exact integer sqrt of
  * the mean square, zero crossings count sign boundaries, and the
  * energy-envelope fingerprint packs sign-of-delta bits in fixed order
  * ([[ImageCodec.dHash]]'s discipline, applied to the time axis). Same
  * bytes → same outputs on any JVM, executor count, or platform, which
  * makes a persisted (id, hash) stamp a full oracle boundary and lets
  * audio near-dup ride the SAME banded Hamming join as images
  * ([[ImageDedup.selfJoinFromHashes]] is modality-agnostic by design).
  *
  * Scale shape: all per-row work — scan-speed projections at 100 TB; the
  * dedup join is the pigeonhole band join, never all-pairs.
  */
object AudioCodec {

  final case class WavMeta(sampleRate: Int, channels: Int,
                           bitsPerSample: Int, nFrames: Int) {
    def durationMs: Long =
      if (sampleRate <= 0) 0L else nFrames.toLong * 1000L / sampleRate
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    if (i + 4 > b.length) "" else new String(b, i, 4, "US-ASCII")

  /** Locate the fmt and data chunks: Option((meta, dataOffset)). None for
    * anything that is not canonical PCM WAV (never throws — corrupt rows
    * must not kill a stage).
    */
  private def parse(bytes: Array[Byte]): Option[(WavMeta, Int, Int)] = {
    try {
      if (bytes == null || bytes.length < 44) return None
      if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
      var pos = 12
      var meta: Option[WavMeta] = None
      var data: Option[(Int, Int)] = None // (offset, byteLen)
      while (pos + 8 <= bytes.length && (meta.isEmpty || data.isEmpty)) {
        val id = tag(bytes, pos)
        val sz = le32(bytes, pos + 4)
        if (sz < 0 || pos + 8 + sz > bytes.length) return None
        if (id == "fmt " && sz >= 16) {
          val audioFormat = le16(bytes, pos + 8)
          val channels = le16(bytes, pos + 10)
          val rate = le32(bytes, pos + 12)
          val bits = le16(bytes, pos + 22)
          if (audioFormat != 1 || channels < 1 ||
              (bits != 8 && bits != 16) || rate <= 0) return None
          meta = Some(WavMeta(rate, channels, bits, 0))
        } else if (id == "data") data = Some((pos + 8, sz))
        pos += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      for (m <- meta; (off, len) <- data) yield {
        val frameBytes = m.channels * (m.bitsPerSample / 8)
        (m.copy(nFrames = len / frameBytes), off, len)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Header metadata only — None for non-WAV / non-PCM bytes. */
  def readMeta(bytes: Array[Byte]): Option[WavMeta] = parse(bytes).map(_._1)

  /** Mono-mixed integer samples (channels floor-averaged; 8-bit unsigned
    * recentered to signed). Range ±32767 for 16-bit, ±128 for 8-bit.
    */
  def samples(bytes: Array[Byte]): Option[Array[Int]] = parse(bytes).map {
    case (m, off, _) =>
      val bytesPer = m.bitsPerSample / 8
      val out = new Array[Int](m.nFrames)
      var f = 0
      while (f < m.nFrames) {
        var acc = 0L
        var c = 0
        while (c < m.channels) {
          val i = off + (f * m.channels + c) * bytesPer
          acc += (if (m.bitsPerSample == 16) (le16(bytes, i) << 16) >> 16 // sign-extend
                  else (bytes(i) & 0xff) - 128)
          c += 1
        }
        out(f) = math.floorDiv(acc, m.channels).toInt
        f += 1
      }
      out
  }

  /** Exact floor(√x) for non-negative longs (Newton, integer-only). */
  private[graft] def isqrt(x: Long): Long = {
    require(x >= 0, "isqrt of negative")
    if (x < 2) return x
    var g = math.sqrt(x.toDouble).toLong + 1 // seed above the root
    while (g * g > x) g = (g + x / g) / 2
    g
  }

  final case class AudioFeatures(durationMs: Long, rms: Long, peak: Int,
                                 zeroCrossings: Long)

  /** Per-clip curation features, all exact integers:
    *  - `rms` = ⌊√(Σ s²/n)⌋ (loudness; a constant-amplitude square wave
    *    comes back as exactly its amplitude — spec-pinned),
    *  - `peak` = max |s|,
    *  - `zeroCrossings` = boundaries where the sign bit flips (activity/
    *    pitch proxy; silence and DC score 0).
    */
  def features(bytes: Array[Byte]): Option[AudioFeatures] =
    parse(bytes).flatMap { case (m, _, _) =>
      samples(bytes).map { s =>
        var sq = 0L
        var peak = 0
        var zc = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i)
          sq += v.toLong * v
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zc += 1
          i += 1
        }
        val rms = if (s.isEmpty) 0L else isqrt(sq / s.length)
        AudioFeatures(m.durationMs, rms, peak, zc)
      }
    }

  /** 64-bit energy-envelope fingerprint ("dHash for audio"): the clip is
    * cut into 65 equal windows, each reduced to its integer RMS, and bit
    * j (MSB-first) is set when the envelope RISES from window j to j+1 —
    * loudness CONTOUR, invariant to level scaling direction and robust
    * to small edits, so near-dup clips land within a few Hamming bits
    * and ride the banded join. None on undecodable bytes or clips
    * shorter than 65 samples (no meaningful envelope).
    */
  def energyHash(bytes: Array[Byte]): Option[Long] =
    samples(bytes).filter(_.length >= 65).map { s =>
      val n = 65
      val env = new Array[Long](n)
      var j = 0
      while (j < n) {
        val from = (j.toLong * s.length / n).toInt
        val to = math.max(((j + 1).toLong * s.length / n).toInt, from + 1)
        var sq = 0L
        var i = from
        while (i < to && i < s.length) { sq += s(i).toLong * s(i); i += 1 }
        env(j) = isqrt(sq / (to - from))
        j += 1
      }
      var hash = 0L
      j = 0
      while (j < 64) {
        hash <<= 1
        if (env(j) < env(j + 1)) hash |= 1L
        j += 1
      }
      hash
    }
}

/** Deterministic WAV generator for fixtures and specs — integer square /
  * sawtooth waveforms packed into canonical 16-bit PCM mono RIFF bytes
  * (the audio analog of [[ImageGen]]; the WAVES are synthetic, the
  * parser/features/fingerprint that process them are real).
  */
object WavGen {

  /** Canonical 44-byte-header mono 16-bit PCM WAV around `pcm`. */
  def wrap(pcm: Array[Int], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = pcm.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    pcm.foreach(v => out.putShort(v.toShort))
    out.array()
  }

  /** Square wave: ±amp with period `period` samples. */
  def square(n: Int, period: Int, amp: Int, sampleRate: Int = 8000): Array[Byte] =
    wrap(Array.tabulate(n)(i =>
      if ((i / (period / 2)) % 2 == 0) amp else -amp), sampleRate)

  /** Sawtooth with a seeded phase — distinct seeds give distinct
    * envelopes, near seeds stay smooth.
    */
  def saw(n: Int, period: Int, amp: Int, seed: Long,
          sampleRate: Int = 8000): Array[Byte] = {
    val phase = math.floorMod(seed * 2654435761L, period.toLong).toInt
    wrap(Array.tabulate(n)(i =>
      ((i + phase) % period) * 2 * amp / period - amp), sampleRate)
  }

  /** Copy with `k` seeded single-sample perturbations (audio near-dup). */
  def perturb(wav: Array[Byte], k: Int, seed: Long): Array[Byte] = {
    val out = wav.clone()
    val nSamples = (wav.length - 44) / 2
    var s = seed
    var i = 0
    while (i < k) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val idx = 44 + 2 * math.abs(s % nSamples).toInt
      out(idx) = (out(idx) ^ 0x1f).toByte // small amplitude nudge
      i += 1
    }
    out
  }
}
