package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import graft.operators.{Bmp, Multimodal}

/** BMP decode conformance: our writer round-trips, ImageIO agrees in
  * both directions (incl. its own padded/bottom-up output and 8-bit
  * paletted files), and malformed payloads quarantine. */
class BmpPixelSpec extends SparkSpec {
  import spark.implicits._

  test("writer round-trips exactly, incl. non-multiple-of-4 widths") {
    for ((w, h) <- Seq((1, 1), (5, 3), (7, 4), (8, 8))) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
      val got = Bmp.decode(Bmp.bmpBytes(w, h, rgb))
      assert(got.isDefined && got.get.width == w && got.get.height == h)
      assert(got.get.rgb.sameElements(rgb), s"${w}x$h")
    }
  }

  test("ImageIO reads our BMPs; we read ImageIO-written BMPs (24-bit)") {
    val (w, h) = (13, 9)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 29 + 5) % 256).toByte)
    // direction 1: our writer → ImageIO reader
    val ref = ImageIO.read(new ByteArrayInputStream(Bmp.bmpBytes(w, h, rgb)))
    assert(ref != null)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      val want = 0xff000000 | ((rgb(i) & 0xff) << 16) |
        ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff)
      assert(ref.getRGB(x, y) == want, s"ImageIO pixel ($x,$y)")
    }
    // direction 2: ImageIO writer → our reader
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) |
        (rgb(i + 2) & 0xff))
    }
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "bmp", bos))
    val ours = Bmp.decode(bos.toByteArray)
    assert(ours.isDefined, "must read the JDK's own BMP output")
    assert(ours.get.rgb.sameElements(rgb))
  }

  test("paletted BMPs from ImageIO (it writes 4-bit for small palettes) decode to its pixels") {
    val cmap = Array(0xff0000, 0x00ff00, 0x0000ff, 0x123456, 0xfedcba,
      0x000000, 0xffffff, 0x808080)
    val icm = new java.awt.image.IndexColorModel(3, 8,
      cmap.map(c => ((c >> 16) & 0xff).toByte),
      cmap.map(c => ((c >> 8) & 0xff).toByte),
      cmap.map(c => (c & 0xff).toByte))
    val (w, h) = (11, 6)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 5 + y) % 8)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "bmp", bos))
    val ours = Bmp.decode(bos.toByteArray)
    assert(ours.isDefined, "paletted BMP must decode")
    // conformance bar: agree with ImageIO's own read of the same bytes
    // (the writer is free to reorder/shrink the palette)
    val ref = ImageIO.read(new ByteArrayInputStream(bos.toByteArray))
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      val got = 0xff000000 | ((ours.get.rgb(i) & 0xff) << 16) |
        ((ours.get.rgb(i + 1) & 0xff) << 8) | (ours.get.rgb(i + 2) & 0xff)
      assert(got == ref.getRGB(x, y), s"pixel ($x,$y)")
    }
  }

  test("malformed/unsupported payloads degrade to None") {
    val ok = Bmp.bmpBytes(4, 4, new Array[Byte](48))
    assert(Bmp.decode(ok).isDefined)
    assert(Bmp.decode(Array[Byte]()).isEmpty)
    assert(Bmp.decode("BM".getBytes ++ new Array[Byte](20)).isEmpty)
    assert(Bmp.decode(ok.take(40)).isEmpty) // truncated pixels
    val rle = ok.clone(); rle(30) = 1       // BI_RLE8 compression flag
    assert(Bmp.decode(rle).isEmpty)
    val b16 = ok.clone(); b16(28) = 16      // 16-bit: unsupported
    assert(Bmp.decode(b16).isEmpty)
  }

  test("bmpFeatures: exact channel sums; junk drops") {
    val rgb = Array[Byte](10, 20, 30, 40, 50, 60) // 2x1
    val good = Multimodal.MediaRecord(1L, "image", Bmp.bmpBytes(2, 1, rgb),
      Multimodal.MediaMeta(2, 1, "bmp", 1))
    val bad = Multimodal.MediaRecord(2L, "image", Array[Byte](1, 2),
      Multimodal.MediaMeta(0, 0, "?", 0))
    val got = Bmp.bmpFeatures(Seq(good, bad).toDS()).collect()
    assert(got.length == 1)
    val f = got.head
    assert(f.n_pixels == 2L && f.sum_red == 50L && f.sum_green == 70L &&
      f.sum_blue == 90L && f.bits_per_pixel == 24)
  }
}
