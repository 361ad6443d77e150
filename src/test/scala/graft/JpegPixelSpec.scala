package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Real baseline JPEG codec (ITU-T T.81). Three exactness tiers:
  *  - uniform 8×8 blocks round-trip BIT-EXACTLY under the flat Q=8
  *    table (DC-only blocks quantize without remainder) — the property
  *    the q113 oracle replays arithmetically;
  *  - general content round-trips within the quantization error bound;
  *  - javax.imageio (the JDK's independent JPEG codec) both READS our
  *    files to the same pixels and WRITES files (standard Annex-K
  *    Huffman tables) that our decoder reads back — so a matched
  *    encoder/decoder bug pair cannot hide. */
class JpegPixelSpec extends AnyFunSuite {

  private def blockPattern(w: Int, h: Int)(f: Int => Int): Array[Byte] = {
    // constant per 8×8 block: block index b = (y/8)*(w/8) + x/8
    val bpr = w / 8
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (f((y / 8) * bpr + x / 8) % 256).toByte
    }
  }

  test("uniform 8x8 blocks round-trip bit-exactly (grayscale)") {
    val (w, h) = (24, 16)
    val px = blockPattern(w, h)(b => b * 37 + 11)
    val jpg = Multimodal.jpegEncode(w, h, 1, px)
    val got = Multimodal.jpegDecodePixels(jpg)
    assert(got.isDefined)
    val (gw, gh, gch, gpx) = got.get
    assert((gw, gh, gch) == (w, h, 1))
    assert(gpx.sameElements(px), "DC-only blocks are exact under Q=8")
  }

  test("javax.imageio reads our uniform-block JPEG to the same pixels") {
    val (w, h) = (32, 24)
    val px = blockPattern(w, h)(b => b * 53 + 5)
    val jpg = Multimodal.jpegEncode(w, h, 1, px)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img != null, "ImageIO accepts the container")
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w) {
      val want = px(y * w + x) & 0xff
      assert(raster.getSample(x, y, 0) == want, s"pixel ($x,$y)")
    }
  }

  test("general grayscale content round-trips within the quantization bound") {
    val (w, h) = (21, 13) // non-multiple-of-8: edge blocks exercised
    val px = Array.tabulate(w * h)(i => ((i * 31 + 7) % 256).toByte)
    val jpg = Multimodal.jpegEncode(w, h, 1, px)
    val got = Multimodal.jpegDecodePixels(jpg)
    assert(got.isDefined)
    val (gw, gh, _, gpx) = got.get
    assert((gw, gh) == (w, h))
    var maxErr = 0; var sumErr = 0L
    for (i <- 0 until w * h) {
      val e = math.abs((gpx(i) & 0xff) - (px(i) & 0xff))
      maxErr = math.max(maxErr, e); sumErr += e
    }
    // flat Q=8: per-coefficient error ≤ 4 → small spatial error
    assert(maxErr <= 16, s"max err $maxErr")
    assert(sumErr.toDouble / (w * h) <= 4.0, s"mean err ${sumErr.toDouble / (w * h)}")
  }

  test("our decoder agrees with javax.imageio on the same file (general content)") {
    val (w, h) = (19, 11)
    val px = Array.tabulate(w * h)(i => ((i * 97 + 13) % 256).toByte)
    val jpg = Multimodal.jpegEncode(w, h, 1, px)
    val ours = Multimodal.jpegDecodePixels(jpg).get._4
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(img != null)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(raster.getSample(x, y, 0) - (ours(y * w + x) & 0xff))
      // independent IDCTs may differ by a rounding step, never more
      assert(d <= 1, s"pixel ($x,$y): ImageIO ${raster.getSample(x, y, 0)} vs ours ${ours(y * w + x) & 0xff}")
    }
  }

  test("our decoder reads ImageIO-WRITTEN JPEGs (standard Annex-K tables)") {
    val (w, h) = (40, 24)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 11 + y * 23) % 256)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val bytes = baos.toByteArray
    val ours = Multimodal.jpegDecodePixels(bytes)
    assert(ours.isDefined, "general DHT/DQT parse handles standard tables")
    val (gw, gh, gch, gpx) = ours.get
    assert((gw, gh, gch) == (w, h, 1))
    // reference: ImageIO decoding its own file
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(ref.getRaster.getSample(x, y, 0) - (gpx(y * w + x) & 0xff))
      assert(d <= 1, s"pixel ($x,$y)")
    }
  }

  test("color (RGB 4:4:4): uniform blocks round-trip within the YCbCr rounding") {
    val (w, h) = (16, 16)
    val bpr = w / 8
    val px = Array.tabulate(w * h * 3) { j =>
      val i = j / 3; val c = j % 3
      val x = i % w; val y = i / w
      val b = (y / 8) * bpr + x / 8
      ((b * 41 + c * 77 + 29) % 256).toByte
    }
    val jpg = Multimodal.jpegEncode(w, h, 3, px)
    val got = Multimodal.jpegDecodePixels(jpg)
    assert(got.isDefined)
    val (gw, gh, gch, gpx) = got.get
    assert((gw, gh, gch) == (w, h, 3))
    for (i <- 0 until w * h * 3) {
      val d = math.abs((gpx(i) & 0xff) - (px(i) & 0xff))
      // the DCT path is exact for uniform blocks; the only loss is the
      // RGB→YCbCr→RGB integer rounding (±2 per channel)
      assert(d <= 2, s"sample $i: ${px(i) & 0xff} -> ${gpx(i) & 0xff}")
    }
  }

  test("4:2:0 subsampled color: we decode ImageIO-written JPEGs (real-world shape)") {
    // the JDK's JPEG writer subsamples chroma by default — exactly the
    // files a crawl contains. Use a smooth image (low-frequency
    // chroma) so replication-vs-fancy upsampling differences stay
    // small, and compare against ImageIO's own decode of the SAME file.
    val (w, h) = (48, 32)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 40 + x * 3; val g = 60 + y * 4; val b = 200 - x * 2
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    val bytes = baos.toByteArray
    // confirm the fixture really is subsampled (SOF factors not all 1x1)
    val sofAt = (0 until bytes.length - 1).find(i =>
      (bytes(i) & 0xff) == 0xFF && (bytes(i + 1) & 0xff) == 0xC0).get
    val lumaHv = bytes(sofAt + 11) & 0xff
    assert(lumaHv != 0x11, f"fixture subsampled (luma hv=$lumaHv%02x)")
    val ours = Multimodal.jpegDecodePixels(bytes)
    assert(ours.isDefined, "subsampled baseline decodes")
    val (gw, gh, gch, gpx) = ours.get
    assert((gw, gh, gch) == (w, h, 3))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var sumErr = 0L; var maxErr = 0
    for (y <- 0 until h; x <- 0 until w) {
      val argb = ref.getRGB(x, y)
      val want = Array((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
      for (c <- 0 until 3) {
        val d = math.abs(want(c) - (gpx((y * w + x) * 3 + c) & 0xff))
        sumErr += d; maxErr = math.max(maxErr, d)
      }
    }
    val mean = sumErr.toDouble / (w * h * 3)
    // luma is full-res (should be ~exact); chroma differs only by the
    // upsampling filter on a smooth gradient
    assert(mean <= 2.0, s"mean err $mean")
    assert(maxErr <= 24, s"max err $maxErr")
  }

  test("grayscale with declared 2x2 factors (non-interleaved scan) still decodes") {
    // single-component scans are non-interleaved: sampling factors in
    // SOF don't change the data-unit order, and some writers declare
    // 2x2 for gray. Patch our own gray file's SOF factors and re-read.
    val (w, h) = (24, 16)
    val px = blockPattern(w, h)(b => b * 29 + 17)
    val jpg = Multimodal.jpegEncode(w, h, 1, px)
    val sofAt = (0 until jpg.length - 1).find(i =>
      (jpg(i) & 0xff) == 0xFF && (jpg(i + 1) & 0xff) == 0xC0).get
    val patched = jpg.clone()
    patched(sofAt + 11) = 0x22.toByte // declared 2x2 on the only component
    val got = Multimodal.jpegDecodePixels(patched)
    assert(got.isDefined, "factors ignored for single-component scans")
    assert(got.get._4.sameElements(px), "pixels unchanged")
  }

  test("hostile/unsupported inputs degrade to None, never throw") {
    val (w, h) = (16, 8)
    val px = Array.tabulate(w * h)(i => (i % 256).toByte)
    val jpg = Multimodal.jpegEncode(w, h, 1, px)
    // truncation mid-scan
    assert(Multimodal.jpegDecodePixels(jpg.take(jpg.length / 2)).isEmpty)
    // progressive marker (SOF2) must be rejected, not mis-parsed
    val prog = jpg.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xFF && (prog(i + 1) & 0xff) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(Multimodal.jpegDecodePixels(prog).isEmpty, "progressive rejected")
    // not a JPEG
    assert(Multimodal.jpegDecodePixels("hello".getBytes).isEmpty)
    assert(Multimodal.jpegDecodePixels(Array.emptyByteArray).isEmpty)
    // the SOF-only synthetic container (header + raw text) from
    // encodeImageContainers parses for DIMENSIONS but not for pixels
    val hdrOnly = Multimodal.jpegHeader(10, 10, 3) ++ "payload".getBytes
    assert(Multimodal.jpegDecodePixels(hdrOnly).isEmpty)
    assert(Multimodal.parseImageHeader(hdrOnly).contains(("jpeg", 10, 10, 3)))
  }

  test("decodeBrightness brightness is real for JPEG payloads now") {
    val (w, h) = (16, 16)
    val px = blockPattern(w, h)(b => b * 19 + 3)
    val jpg = Multimodal.jpegEncode(w, h, 1, px)
    val spark = SparkSpec.spark
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", jpg, Multimodal.MediaMeta(w, h, "jpeg", 1)))
      .toDS()
    val got = Multimodal.decodeBrightness(media).collect().head
    val want = px.map(_ & 0xff).map(_.toLong).sum / px.length
    assert(got.brightness == want, "JPEG path: mean of decoded pixels")
  }
}
