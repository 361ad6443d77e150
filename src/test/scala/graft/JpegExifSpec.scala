package graft

import graft.operators.{Exif, Multimodal}

/** JPEG EXIF: APP1/TIFF parse in both byte orders, the APPn/COM
  * privacy scrub (entropy data byte-preserved, pixels identical),
  * and hostile-input quarantine. Conformance: javax.imageio must
  * still decode both the EXIF-bearing and the scrubbed file to the
  * same pixels as the original. */
class JpegExifSpec extends SparkSpec {

  private def grayJpeg(n: Long): Array[Byte] = {
    val px = Array.tabulate(64)(i => (((n + 1) * (i * 7 + 3)) % 256).toByte)
    Multimodal.jpegEncode(8, 8, 1, px)
  }

  test("inject → parse round-trips Make/Model/Orientation/GPS (big-endian)") {
    val dirty = Exif.jpegInjectExif(grayJpeg(3),
      Exif.exifSegment("CamCorp", "M3", 6, gps = true))
    val Some((make, model, orient, hasGps)) = Exif.jpegExif(dirty)
    assert(make == "CamCorp" && model == "M3" && orient == 6 && hasGps)
  }

  test("little-endian (II) TIFF parses identically") {
    val dirty = Exif.jpegInjectExif(grayJpeg(4),
      Exif.exifSegment("Maker", "Mod", 3, gps = false, littleEndian = true))
    assert(Exif.jpegExif(dirty).contains(("Maker", "Mod", 3, false)))
  }

  test("inline (≤4 byte) and external ASCII values both resolve") {
    // "AB" + NUL = 3 bytes → inline; "LongMaker" + NUL = 10 → external
    val seg = Exif.exifSegment("LongMaker", "AB", 1, gps = false)
    val dirty = Exif.jpegInjectExif(grayJpeg(5), seg)
    assert(Exif.jpegExif(dirty).contains(("LongMaker", "AB", 1, false)))
  }

  test("scrub drops APP1/COM, keeps APP0, pixels byte-identical") {
    val base = grayJpeg(7)
    val seg = Exif.exifSegment("Cam0", "M1", 2, gps = true)
    val dirty = Exif.jpegInjectExif(base, seg)
    val Some((clean, total, removed, removedBytes)) =
      Exif.jpegScrubMetadata(dirty)
    assert(removed == 1 && removedBytes == seg.length.toLong)
    assert(total >= 5) // APP1 + APP0 + DQT + SOF + DHTs before SOS
    assert(Exif.jpegExif(clean).isEmpty)
    // the scrub of the scrubbed file is the identity
    assert(clean.toSeq == base.toSeq)
    assert(Multimodal.jpegDecodePixels(clean).map(_._4.toSeq) ==
      Multimodal.jpegDecodePixels(dirty).map(_._4.toSeq))
  }

  test("segment-size arithmetic matches the documented layout") {
    // payload = 6 (Exif\0\0) + 8 (TIFF hdr) + 2 + n*12 + 4 (IFD0)
    //         + (gps ? 18 : 0) (GPS IFD) + external ASCII (padded even)
    // wire    = 2 (FFE1) + 2 (len) + payload
    // make "Cam0" → 5 bytes + pad = 6 external; model "M1" → 3 inline
    assert(Exif.exifSegment("Cam0", "M1", 1, gps = false).length == 66)
    assert(Exif.exifSegment("Cam0", "M1", 1, gps = true).length == 96)
  }

  test("javax.imageio decodes dirty and scrubbed files alike (conformance)") {
    val base = grayJpeg(9)
    val dirty = Exif.jpegInjectExif(base,
      Exif.exifSegment("CamCorp", "M9", 8, gps = true))
    val Some((clean, _, _, _)) = Exif.jpegScrubMetadata(dirty)
    def pix(b: Array[Byte]): Seq[Int] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        yield img.getRGB(x, y) & 0xff
    }
    assert(pix(dirty) == pix(base) && pix(clean) == pix(base))
  }

  test("hostile input quarantines: truncation, bad magic, bad TIFF") {
    assert(Exif.jpegExif("not a jpeg".getBytes).isEmpty)
    assert(Exif.jpegScrubMetadata("no".getBytes).isEmpty)
    val dirty = Exif.jpegInjectExif(grayJpeg(1),
      Exif.exifSegment("Cam", "M", 1, gps = false))
    // truncate inside the APP1 payload
    assert(Exif.jpegScrubMetadata(dirty.take(20)).isEmpty)
    // corrupt the TIFF byte-order mark: parse refuses, scrub still works
    val bad = dirty.clone(); bad(12) = 'X'.toByte
    assert(Exif.jpegExif(bad).isEmpty)
    assert(Exif.jpegScrubMetadata(bad).isDefined)
    // GPS pointer beyond the segment bounds → quarantine
    val seg = Exif.exifSegment("Cam", "M", 1, gps = true)
    // GPS IFD offset field sits in the 4th IFD0 entry's value slot
    val gpsEntryValue = 4 + 6 + 8 + 2 + 3 * 12 + 8
    val broken = seg.clone()
    broken(gpsEntryValue) = 0x7f.toByte // huge offset
    assert(Exif.jpegExif(
      Exif.jpegInjectExif(grayJpeg(2), broken)).isEmpty)
  }
}
