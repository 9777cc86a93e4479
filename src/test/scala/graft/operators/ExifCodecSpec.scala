package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.multimodal.{ExifCodec, ExifGen, ImageCodec, ImageGen}

class ExifCodecSpec extends AnyFunSuite {

  test("EXIF round-trip: generated APP1 reads back as literals; JPEG still decodes") {
    val jpeg = ImageGen.jpeg(40, 30, seed = 5)
    val withExif = ExifGen.jpegWithExif(jpeg,
      ExifGen.app1("Canon", "EOS-5", orientation = 6,
        dateTime = "2023:07:14 10:30:00", w = 4000, h = 3000))
    val e = ExifCodec.readExif(withExif).get
    assert(e.make == "Canon" && e.model == "EOS-5")
    assert(e.orientation == 6)
    assert(e.dateTime == "2023:07:14 10:30:00")
    assert(e.pixelX == 4000 && e.pixelY == 3000)
    // the spliced JPEG is still a valid image with unchanged pixels
    val img = ImageCodec.decode(withExif).get
    assert(img.getWidth == 40 && img.getHeight == 30)
    assert(ImageCodec.dHash(withExif) == ImageCodec.dHash(jpeg),
      "metadata splice must not change pixel content")
    // short strings (<= 4 bytes incl NUL) take the inline-value path
    val short = ExifCodec.readExif(ExifGen.jpegWithExif(jpeg,
      ExifGen.app1("LG", "V60", 1, "2024:01:01 00:00:00", 100, 50))).get
    assert(short.make == "LG" && short.model == "V60")
  }

  test("EXIF: big-endian (MM) TIFF parses; missing/corrupt inputs return None") {
    // hand-built MM TIFF: IFD0 with one SHORT Orientation entry
    val bb = java.nio.ByteBuffer.allocate(26) // big-endian by default
    bb.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    bb.putShort(1)                      // 1 entry
    bb.putShort(0x0112.toShort).putShort(3).putInt(1)
    bb.putShort(8).putShort(0)          // orientation 8, pad
    bb.putInt(0)                        // next IFD
    val app1 = "Exif\u0000\u0000".getBytes("US-ASCII") ++ bb.array()
    val jpeg = ExifGen.jpegWithExif(ImageGen.jpeg(16, 16, seed = 1), app1)
    assert(ExifCodec.readExif(jpeg).get.orientation == 8)
    // absent / corrupt / truncated: None, never a throw
    assert(ExifCodec.readExif(ImageGen.jpeg(16, 16, seed = 2)).isEmpty)
    assert(ExifCodec.readExif("not a jpeg".getBytes).isEmpty)
    assert(ExifCodec.readExif(jpeg.take(20)).isEmpty) // cut inside the APP1
    assert(ExifCodec.readExif(null).isEmpty)
    assert(ExifCodec.readExif(Array.empty[Byte]).isEmpty)
  }

  test("EXIF: truncated pixel-dimension entry reads as absent, not the -1 sentinel") {
    // ADVICE r17: r16/r32 return -1 on out-of-bounds reads, and 0xa002/0xa003
    // assigned it straight to pixelX/pixelY — a truncated sub-IFD reported
    // Exif(..., -1, -1) as PRESENT metadata and defeated the all-empty guard.
    // MM TIFF with one PixelXDimension (LONG) entry whose 4-byte value field
    // is cut off 2 bytes early: must parse as "no metadata" (None), never -1.
    val bb = java.nio.ByteBuffer.allocate(20)
    bb.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    bb.putShort(1)                                  // 1 entry
    bb.putShort(0xa002.toShort).putShort(4).putInt(1)
    bb.putShort(0x0f00.toShort)                     // value field truncated: 2 of 4 bytes
    val app1 = "Exif\u0000\u0000".getBytes("US-ASCII") ++ bb.array()
    val jpeg = ExifGen.jpegWithExif(ImageGen.jpeg(8, 8, seed = 3), app1)
    assert(ExifCodec.readExif(jpeg).isEmpty)
    // same cut on a SHORT-typed entry (r16 path)
    val bs = java.nio.ByteBuffer.allocate(19)
    bs.put('M'.toByte).put('M'.toByte).putShort(42).putInt(8)
    bs.putShort(1)
    bs.putShort(0xa003.toShort).putShort(3).putInt(1)
    bs.put(0x0f.toByte)                             // 1 of 2 value bytes
    val app1s = "Exif\u0000\u0000".getBytes("US-ASCII") ++ bs.array()
    assert(ExifCodec.readExif(
      ExifGen.jpegWithExif(ImageGen.jpeg(8, 8, seed = 4), app1s)).isEmpty)
  }

  test("PNG tEXt round-trip: chunks read back; PNG stays decodable; non-PNG empty") {
    val png = ImageGen.png(20, 10, seed = 9)
    val tagged = ExifGen.pngWithText(
      ExifGen.pngWithText(png, "Software", "graft-gen 1.0"),
      "prompt", "a seeded gradient")
    val m = ExifCodec.readPngText(tagged)
    assert(m == Map("Software" -> "graft-gen 1.0", "prompt" -> "a seeded gradient"))
    val img = ImageCodec.decode(tagged).get
    assert(img.getWidth == 20 && img.getHeight == 10)
    assert(ExifCodec.readPngText(png).isEmpty)
    assert(ExifCodec.readPngText(ImageGen.jpeg(8, 8, seed = 1)).isEmpty)
    assert(ExifCodec.readPngText(tagged.take(30)).isEmpty) // truncated: no throw
  }
}
