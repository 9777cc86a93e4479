package graft.operators.multimodal

/** REAL video CONTAINER metadata for MP4 (ISO/IEC 14496-12 base media
  * file format) — box-structure parsing needs no codec: `ftyp` brands,
  * `moov/mvhd` timescale + duration, `moov/trak/tkhd` presentation
  * width/height (16.16 fixed point). This completes the r17 multimodal
  * tier's honest split: image PIXELS decode ([[ImageCodec]]), WAV PCM
  * decodes ([[AudioCodec]]), video CONTAINER metadata parses here — and
  * only the codec layers the JDK does not ship (H.264/AAC frames) stay
  * behind the documented byte-level sampling / synthetic embedding
  * fallback.
  *
  * Determinism: big-endian integer header fields read exactly; duration
  * is integer `duration_ticks * 1000 / timescale`. Non-BMFF bytes parse
  * to None; a file truncated after `ftyp` keeps its brand and honestly
  * reports the missing fields (duration −1, dims/tracks 0). Never
  * throws — a bad row must not kill a 100 TB scan.
  */
object VideoMeta {

  final case class Mp4Meta(majorBrand: String, durationMs: Long,
                           width: Int, height: Int, nTracks: Int)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int): String =
    if (i + 4 > b.length) "" else new String(b, i, 4, "US-ASCII")

  /** Iterate the boxes in [lo, hi): (type, payloadStart, payloadEnd). */
  private def boxes(b: Array[Byte], lo: Int, hi: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var pos = lo
      def hasNext: Boolean = pos + 8 <= hi
      def next(): (String, Int, Int) = {
        val sz32 = be32(b, pos)
        val tp = tag(b, pos + 4)
        // size 1 = 64-bit largesize follows; size 0 = box runs to EOF
        val (hdr, size) =
          if (sz32 == 1L && pos + 16 <= hi) (16, be64(b, pos + 8))
          else if (sz32 == 0L) (8, (hi - pos).toLong)
          else (8, sz32)
        if (size < hdr || pos + size > hi) { pos = hi; ("", hi, hi) }
        else {
          val r = (tp, pos + hdr, pos + size.toInt)
          pos += size.toInt
          r
        }
      }
    }

  def readMeta(bytes: Array[Byte]): Option[Mp4Meta] = {
    try {
      if (bytes == null || bytes.length < 16) return None
      // BMFF requires ftyp (or styp) early; quick reject for non-video
      if (tag(bytes, 4) != "ftyp") return None
      var brand = ""
      var durationMs = -1L
      var w = 0
      var h = 0
      var tracks = 0
      for ((tp, s, e) <- boxes(bytes, 0, bytes.length)) tp match {
        case "ftyp" if e - s >= 4 => brand = tag(bytes, s)
        case "moov" =>
          for ((mt, ms, me) <- boxes(bytes, s, e)) mt match {
            case "mvhd" if me - ms >= 20 =>
              val version = bytes(ms) & 0xff
              if (version == 1 && me - ms >= 28) {
                val timescale = be32(bytes, ms + 20)
                val dur = be64(bytes, ms + 24)
                if (timescale > 0) durationMs = dur * 1000L / timescale
              } else {
                val timescale = be32(bytes, ms + 12)
                val dur = be32(bytes, ms + 16)
                if (timescale > 0) durationMs = dur * 1000L / timescale
              }
            case "trak" =>
              tracks += 1
              for ((tt, ts, te) <- boxes(bytes, ms, me)
                   if tt == "tkhd" && te - ts >= 84) {
                val version = bytes(ts) & 0xff
                // width/height are the LAST 8 payload bytes (16.16 fixed)
                // in both versions — offset from the end dodges the
                // v0/v1 timestamp-width difference
                val tw = (be32(bytes, te - 8) >> 16).toInt
                val th = (be32(bytes, te - 4) >> 16).toInt
                // keep the video track's dims (audio tracks carry 0x0)
                if (tw > 0 && th > 0 && version <= 1) { w = tw; h = th }
              }
            case _ => ()
          }
        case _ => ()
      }
      if (brand.isEmpty) None
      else Some(Mp4Meta(brand, durationMs, w, h, tracks))
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}

/** Deterministic minimal-but-valid ISO BMFF builder for fixtures/specs
  * (the video analog of [[WavGen]]: the FILES are synthetic, the parser
  * that reads them is real and reads any spec-conformant mp4).
  */
object Mp4Gen {
  private def box(tp: String, payload: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + payload.length)
    out.putInt(8 + payload.length).put(tp.getBytes("US-ASCII")).put(payload)
    out.array()
  }

  /** One video track: isom brand, mvhd(timescale, duration), tkhd(w, h). */
  def mp4(timescale: Int, durationTicks: Long, w: Int, h: Int): Array[Byte] = {
    val ftyp = box("ftyp", "isomiso2".getBytes("US-ASCII"))
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100) // v0 mvhd payload
      bb.putInt(0)                   // version/flags
      bb.putInt(0).putInt(0)         // ctime/mtime
      bb.putInt(timescale).putInt(durationTicks.toInt)
      box("mvhd", bb.array())
    }
    val tkhd = {
      val bb = java.nio.ByteBuffer.allocate(84) // v0 tkhd payload
      bb.putInt(0)                   // version/flags
      bb.putInt(0).putInt(0)         // ctime/mtime
      bb.putInt(1)                   // track id
      bb.position(76)
      bb.putInt(w << 16).putInt(h << 16)
      box("tkhd", bb.array())
    }
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    val mdat = box("mdat", Array.fill[Byte](32)(3))
    ftyp ++ moov ++ mdat
  }
}
