package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Real PNG pixel codec: zlib + per-row filters (RFC 2083). The
  * cross-check against javax.imageio (the JDK's own independent PNG
  * decoder) pins standards conformance — a matched encoder/decoder
  * bug pair that round-trips internally would still fail ImageIO. */
class PngPixelSpec extends AnyFunSuite {

  private def samples(w: Int, h: Int, ch: Int)(f: Int => Int): Array[Byte] =
    Array.tabulate(w * h * ch)(i => (f(i) % 256).toByte)

  test("encode→decode round-trips exact pixels for gray/RGB/RGBA") {
    for (ch <- Seq(1, 3, 4)) {
      // h ≥ 6 so every filter type (row % 5) appears at least once
      val (w, h) = (13, 7)
      val px = samples(w, h, ch)(i => i * 31 + ch * 7)
      val png = Multimodal.pngEncode(w, h, ch, px)
      val got = Multimodal.pngDecodePixels(png)
      assert(got.isDefined, s"ch=$ch decodes")
      val (gw, gh, gch, gpx) = got.get
      assert((gw, gh, gch) == (w, h, ch))
      assert(gpx.sameElements(px), s"ch=$ch pixels exact")
    }
  }

  test("javax.imageio reads our PNGs to the same pixels (conformance)") {
    for (ch <- Seq(1, 3, 4)) {
      val (w, h) = (11, 6)
      val px = samples(w, h, ch)(i => i * 53 + 5)
      val png = Multimodal.pngEncode(w, h, ch, px)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null, s"ch=$ch: ImageIO accepts the container")
      val raster = img.getRaster
      assert(raster.getNumBands == ch)
      for (y <- 0 until h; x <- 0 until w; b <- 0 until ch) {
        val want = px((y * w + x) * ch + b) & 0xff
        assert(raster.getSample(x, y, b) == want,
          s"ch=$ch pixel ($x,$y) band $b")
      }
    }
  }

  test("palette (color type 3) PNGs decode to their RGB expansion") {
    val (w, h) = (10, 7)
    // 5-entry palette of distinct RGB triples
    val palette = Array.tabulate(15)(i => (i * 17 + 3).toByte)
    val indices = Array.tabulate(w * h)(i => (i % 5).toByte)
    val png = Multimodal.pngEncodeIndexed(w, h, palette, indices)
    val got = Multimodal.pngDecodePixels(png)
    assert(got.isDefined)
    val (gw, gh, gch, rgb) = got.get
    assert((gw, gh, gch) == (w, h, 3))
    for (i <- 0 until w * h; b <- 0 until 3)
      assert(rgb(3 * i + b) == palette(3 * (i % 5) + b), s"pixel $i band $b")
    // ImageIO agrees on the expanded colors
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val e = 3 * ((y * w + x) % 5)
      assert(((argb >> 16) & 0xff) == (palette(e) & 0xff) &&
        ((argb >> 8) & 0xff) == (palette(e + 1) & 0xff) &&
        (argb & 0xff) == (palette(e + 2) & 0xff), s"ImageIO pixel ($x,$y)")
    }
    // hostile: an index past the palette is rejected, not mis-read
    val bad = Multimodal.pngEncodeIndexed(2, 1, palette.take(6),
      Array[Byte](0, 3))
    assert(Multimodal.pngDecodePixels(bad).isEmpty, "out-of-range index")
  }

  test("hostile/unsupported inputs degrade to None, never throw") {
    val (w, h, ch) = (9, 5, 3)
    val px = samples(w, h, ch)(i => i)
    val png = Multimodal.pngEncode(w, h, ch, px)
    // corrupt one IDAT byte: chunk CRC must catch it
    val bad = png.clone(); bad(40) = (bad(40) ^ 0x55).toByte
    assert(Multimodal.pngDecodePixels(bad).isEmpty, "CRC rejects corruption")
    // truncation mid-IDAT
    assert(Multimodal.pngDecodePixels(png.take(png.length - 20)).isEmpty)
    // interlace flag set (offset 28 in sig+IHDR layout) + fixed CRC is
    // still rejected: Adam7 is out of scope, must not silently mis-parse
    val inter = png.clone(); inter(28) = 1
    val crc = new java.util.zip.CRC32(); crc.update(inter, 12, 17)
    val cv = crc.getValue.toInt
    for (k <- 0 until 4) inter(29 + k) = (cv >>> (24 - 8 * k)).toByte
    assert(Multimodal.pngDecodePixels(inter).isEmpty, "interlace rejected")
    // not a PNG at all
    assert(Multimodal.pngDecodePixels("hello".getBytes).isEmpty)
    assert(Multimodal.pngDecodePixels(Array.emptyByteArray).isEmpty)
  }

  test("FDICT zlib stream (valid chunk CRCs) returns None, never hangs") {
    // zlib header 0x78 0x3F: deflate/32k window, FDICT bit set, check
    // bytes valid (0x783F % 31 == 0). Inflater.inflate() then returns 0
    // with needsInput()==false and finished()==false forever — the
    // decoder must bail on ANY 0-byte unfinished inflate, not just
    // needsInput(). Chunk CRCs are valid, so CRC checks can't save us.
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val len = body.length
      for (k <- 0 until 4) out.write((len >>> (24 - 8 * k)) & 0xff)
      val tb = tag.getBytes("US-ASCII")
      out.write(tb)
      out.write(body)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      val cv = crc.getValue.toInt
      for (k <- 0 until 4) out.write((cv >>> (24 - 8 * k)) & 0xff)
      out.toByteArray
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    for (k <- 0 until 4) ihdr.write((3 >>> (24 - 8 * k)) & 0xff) // w=3
    for (k <- 0 until 4) ihdr.write((2 >>> (24 - 8 * k)) & 0xff) // h=2
    ihdr.write(8); ihdr.write(2) // depth 8, color type 2 (RGB)
    ihdr.write(0); ihdr.write(0); ihdr.write(0)
    val fdictIdat = Array[Byte](0x78, 0x3f, 1, 2, 3, 4, 0x42, 0x42)
    val png = new java.io.ByteArrayOutputStream()
    png.write(Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    png.write(chunk("IHDR", ihdr.toByteArray))
    png.write(chunk("IDAT", fdictIdat))
    png.write(chunk("IEND", Array.emptyByteArray))
    val bytes = png.toByteArray
    import org.scalatest.concurrent.TimeLimits.failAfter
    import org.scalatest.time.SpanSugar._
    failAfter(10.seconds) {
      assert(Multimodal.pngDecodePixels(bytes).isEmpty, "FDICT rejected")
    }
  }

  test("decodeBrightness: real mean over decoded samples for PNG, byte-sum else") {
    val (w, h, ch) = (8, 6, 1)
    val px = samples(w, h, ch)(i => i * 5)
    val png = Multimodal.pngEncode(w, h, ch, px)
    val spark = SparkSpec.spark
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", png, Multimodal.MediaMeta(w, h, "png", 1)),
      Multimodal.MediaRecord(2L, "image", "plain bytes".getBytes("UTF-8"),
        Multimodal.MediaMeta(0, 0, "raw", 1))).toDS()
    val got = Multimodal.decodeBrightness(media).collect().sortBy(_.doc_id)
    val wantMean = px.map(_ & 0xff).map(_.toLong).sum / px.length
    assert(got(0).brightness == wantMean, "PNG path: mean of decoded pixels")
    val headSum = "plain bytes".getBytes("UTF-8").take(16)
      .foldLeft(0L)((a, b) => a + (b & 0xff)) % 256
    assert(got(1).brightness == headSum, "non-PNG path: byte-sum stand-in")
  }
}
