package graft.operators.multimodal

/** REAL embedded image metadata on the bare JDK — the curation signals
  * that live INSIDE the file, beyond pixel dims:
  *
  *  - **JPEG EXIF** (JEITA CP-3451 APP1 segment, TIFF 6.0 structure):
  *    camera make/model, orientation, capture timestamp, declared pixel
  *    dimensions — the dedup/provenance/rotation-normalization signals a
  *    scraped-image pipeline gates on. Both byte orders (II/MM), IFD0 +
  *    the Exif sub-IFD, ASCII/SHORT/LONG value types, inline-vs-offset
  *    values.
  *  - **PNG tEXt chunks** (ISO 15948 §11.3.4.3): keyword→text pairs —
  *    where generators and editors stamp software tags and prompts.
  *
  * Determinism: pure big/little-endian integer reads of header bytes —
  * same bytes, same output anywhere, so EXIF fields written by the
  * fixture generator come back as LITERALS (the p137 oracle). Every read
  * is bounds-checked and the parsers never throw: corrupt or truncated
  * rows return None/empty on a 100 TB scan, they do not kill it.
  *
  * Reference counterpart: the `image` source's metadata columns
  * (streamingpro MLSQLImage.scala:62-88), extended with the in-file
  * metadata the reference never decoded.
  */
object ExifCodec {

  final case class Exif(make: String, model: String, orientation: Int,
                        dateTime: String, pixelX: Int, pixelY: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** Walk JPEG segments for APP1/"Exif\0\0"; None when absent. */
  def readExif(bytes: Array[Byte]): Option[Exif] = {
    try {
      if (bytes == null || bytes.length < 4) return None
      if (u8(bytes, 0) != 0xff || u8(bytes, 1) != 0xd8) return None // SOI
      var pos = 2
      while (pos + 4 <= bytes.length && u8(bytes, pos) == 0xff) {
        val marker = u8(bytes, pos + 1)
        if (marker == 0xda || marker == 0xd9) return None // SOS/EOI: no APP1
        val len = (u8(bytes, pos + 2) << 8) | u8(bytes, pos + 3)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        if (marker == 0xe1 && len >= 8 + 6 &&
            new String(bytes, pos + 4, 6, "US-ASCII") == "Exif\u0000\u0000")
          return parseTiff(bytes, pos + 10, pos + 2 + len)
        pos += 2 + len
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** TIFF structure in [base, hi): IFD0 tags + the Exif sub-IFD. */
  private def parseTiff(bytes: Array[Byte], base: Int, hi: Int): Option[Exif] = {
    if (base + 8 > hi) return None
    val le = (bytes(base), bytes(base + 1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => return None
    }
    def r16(i: Int): Int =
      if (i < base || i + 2 > hi) -1
      else if (le) u8(bytes, i) | (u8(bytes, i + 1) << 8)
      else (u8(bytes, i) << 8) | u8(bytes, i + 1)
    def r32(i: Int): Long =
      if (i < base || i + 4 > hi) -1L
      else if (le) u8(bytes, i) | (u8(bytes, i + 1).toLong << 8) |
        (u8(bytes, i + 2).toLong << 16) | (u8(bytes, i + 3).toLong << 24)
      else (u8(bytes, i).toLong << 24) | (u8(bytes, i + 1).toLong << 16) |
        (u8(bytes, i + 2) << 8) | u8(bytes, i + 3)
    if (r16(base + 2) != 42) return None

    var make = ""
    var model = ""
    var orientation = 0
    var dateTime = ""
    var px = 0
    var py = 0

    def ascii(valueField: Int, count: Long): String = {
      // count includes the NUL; values > 4 bytes live at an offset
      val n = count.toInt
      if (n <= 0) return ""
      val off = if (n <= 4) valueField else base + r32(valueField).toInt
      if (off < base || off + n > hi) return ""
      new String(bytes, off, n, "US-ASCII").takeWhile(_ != '\u0000').trim
    }

    def parseIfd(ifdOff: Int, depth: Int): Unit = {
      if (depth > 2 || ifdOff < 0) return
      val at = base + ifdOff
      val count = r16(at)
      if (count < 0 || count > 512) return
      var i = 0
      while (i < count) {
        val e = at + 2 + i * 12
        val tag = r16(e)
        val tpe = r16(e + 2)
        val n = r32(e + 4)
        val vf = e + 8
        tag match {
          case 0x010f if tpe == 2 => make = ascii(vf, n)
          case 0x0110 if tpe == 2 => model = ascii(vf, n)
          // r16/r32 return -1 on out-of-bounds reads (a truncated sub-IFD);
          // a negative value must stay "absent" (field left at 0) or the
          // sentinel is reported as present metadata AND defeats the
          // all-fields-empty => None guard below (ADVICE r17)
          case 0x0112 if tpe == 3 => orientation = math.max(0, r16(vf))
          case 0x0132 if tpe == 2 => dateTime = ascii(vf, n)
          case 0x9003 if tpe == 2 && dateTime.isEmpty => dateTime = ascii(vf, n)
          case 0xa002 =>
            val v = if (tpe == 3) r16(vf).toLong else r32(vf)
            if (v > 0) px = v.toInt
          case 0xa003 =>
            val v = if (tpe == 3) r16(vf).toLong else r32(vf)
            if (v > 0) py = v.toInt
          case 0x8769 if tpe == 4 => parseIfd(r32(vf).toInt, depth + 1)
          case _ => ()
        }
        i += 1
      }
    }
    parseIfd(r32(base + 4).toInt, 0)
    if (make.isEmpty && model.isEmpty && orientation == 0 && dateTime.isEmpty &&
      px == 0 && py == 0) None
    else Some(Exif(make, model, orientation, dateTime, px, py))
  }

  /** PNG tEXt chunks as keyword→text pairs (empty for non-PNG or none). */
  def readPngText(bytes: Array[Byte]): Map[String, String] = {
    try {
      if (bytes == null || bytes.length < 16) return Map.empty
      val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)
      if (!(0 until 4).forall(i => u8(bytes, i) == sig(i))) return Map.empty
      val out = Map.newBuilder[String, String]
      var pos = 8
      while (pos + 8 <= bytes.length) {
        val len = ((u8(bytes, pos) << 24) | (u8(bytes, pos + 1) << 16) |
          (u8(bytes, pos + 2) << 8) | u8(bytes, pos + 3)).toLong & 0xffffffffL
        val tp = new String(bytes, pos + 4, 4, "US-ASCII")
        if (len < 0 || pos + 12 + len > bytes.length) return out.result()
        if (tp == "tEXt") {
          val data = new String(bytes, pos + 8, len.toInt, "ISO-8859-1")
          val nul = data.indexOf('\u0000')
          if (nul > 0) out += data.substring(0, nul) -> data.substring(nul + 1)
        }
        if (tp == "IEND") return out.result()
        pos += 12 + len.toInt // len + type + data + crc
      }
      out.result()
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }
}

/** Deterministic EXIF / tEXt writers for fixtures and specs (the
  * metadata analog of [[ImageGen]]: the FILES are synthetic, the parsers
  * reading them are real and read any spec-conformant file).
  */
object ExifGen {

  /** Minimal little-endian TIFF with IFD0 (Make, Model, Orientation,
    * DateTime, ExifIFD pointer) and an Exif sub-IFD (PixelXDimension,
    * PixelYDimension), wrapped in an APP1 "Exif\0\0" payload.
    */
  def app1(make: String, model: String, orientation: Int, dateTime: String,
           w: Int, h: Int): Array[Byte] = {
    val mk = make + "\u0000"
    val md = model + "\u0000"
    val dt = dateTime + "\u0000"
    val ifd0At = 8
    val ifd0End = ifd0At + 2 + 5 * 12 + 4
    val exifAt = ifd0End
    val exifEnd = exifAt + 2 + 2 * 12 + 4
    var dataAt = exifEnd
    val bb = java.nio.ByteBuffer.allocate(
        exifEnd + mk.length + md.length + dt.length + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifd0At)
    def entry(tag: Int, tpe: Int, count: Int, writeValue: => Unit): Unit = {
      bb.putShort(tag.toShort).putShort(tpe.toShort).putInt(count)
      val before = bb.position()
      writeValue
      while (bb.position() < before + 4) bb.put(0.toByte)
    }
    def asciiEntry(tag: Int, s: String): Unit = entry(tag, 2, s.length, {
      if (s.length <= 4) bb.put(s.getBytes("US-ASCII"))
      else { bb.putInt(dataAt); dataAt += s.length }
    })
    // IFD0
    bb.putShort(5)
    asciiEntry(0x010f, mk)
    asciiEntry(0x0110, md)
    entry(0x0112, 3, 1, bb.putShort(orientation.toShort))
    asciiEntry(0x0132, dt)
    entry(0x8769, 4, 1, bb.putInt(exifAt))
    bb.putInt(0) // next IFD
    // Exif sub-IFD
    bb.putShort(2)
    entry(0xa002, 4, 1, bb.putInt(w))
    entry(0xa003, 4, 1, bb.putInt(h))
    bb.putInt(0)
    // data area (strings > 4 bytes, in asciiEntry emission order)
    for (s <- Seq(mk, md, dt) if s.length > 4) bb.put(s.getBytes("US-ASCII"))
    val tiff = java.util.Arrays.copyOf(bb.array(), bb.position())
    "Exif\u0000\u0000".getBytes("US-ASCII") ++ tiff
  }

  /** Splice an APP1 payload into a JPEG right after SOI. */
  def jpegWithExif(jpeg: Array[Byte], app1Payload: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "not a JPEG")
    val len = app1Payload.length + 2
    val seg = Array[Byte](0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ app1Payload
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }

  /** Splice a tEXt chunk into a PNG before IEND. */
  def pngWithText(png: Array[Byte], keyword: String, text: String): Array[Byte] = {
    val data = (keyword + "\u0000" + text).getBytes("ISO-8859-1")
    val crc = new java.util.zip.CRC32()
    crc.update("tEXt".getBytes("US-ASCII"))
    crc.update(data)
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put("tEXt".getBytes("US-ASCII")).put(data)
      .putInt(crc.getValue.toInt)
    val chunk = bb.array()
    // IEND is the last 12 bytes of a well-formed PNG
    val at = png.length - 12
    require(at > 8 && new String(png, at + 4, 4, "US-ASCII") == "IEND",
      "PNG without trailing IEND")
    png.take(at) ++ chunk ++ png.drop(at)
  }
}
