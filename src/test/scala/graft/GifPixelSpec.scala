package graft

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.operators.{Gif, Multimodal}

/** GIF decoder conformance: LZW round-trips, a javax.imageio
  * cross-check on REAL compressed streams (composite codes, dictionary
  * growth — the paths a root-code-only round-trip cannot reach), and
  * malformed-payload quarantine. Mirrors PngPixelSpec's method. */
class GifPixelSpec extends SparkSpec {
  import spark.implicits._

  test("lzw: root-code encoder round-trips, incl. dictionary-width growth") {
    for (n <- Seq(1, 7, 255, 300, 5000)) {
      val idx = Array.tabulate(n)(i => ((i * 31 + 7) % 16).toByte)
      val enc = Gif.lzwEncodeRoots(idx, 4)
      val got = Gif.lzwDecode(enc, 4, n)
      assert(got.isDefined && got.get.sameElements(idx), s"n=$n")
    }
  }

  test("decode reproduces javax.imageio pixels on real LZW streams") {
    // 8-entry palette; patterned + runs (runs force composite codes)
    val cmap = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff,
      0x000000, 0x808080, 0xffff00, 0x00ffff)
    val r = cmap.map(c => ((c >> 16) & 0xff).toByte)
    val g = cmap.map(c => ((c >> 8) & 0xff).toByte)
    val b = cmap.map(c => (c & 0xff).toByte)
    val icm = new IndexColorModel(3, 8, r, g, b)
    for ((w, h, f) <- Seq(
        (23, 17, (x: Int, y: Int) => (x * 3 + y) % 8),
        (64, 64, (x: Int, y: Int) => if (y < 32) 0 else (x / 8) % 8),
        (5, 200, (x: Int, y: Int) => (y / 50) % 8))) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, f(x, y))
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "gif", bos))
      val got = Gif.decode(bos.toByteArray)
      assert(got.isDefined, s"decode failed ${w}x$h")
      val gp = got.get
      assert(gp.width == w && gp.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val idx = gp.indices(y * w + x) & 0xff
        val rgb = gp.palette(idx) | 0xff000000
        assert(rgb == img.getRGB(x, y), s"pixel ($x,$y) in ${w}x$h")
      }
    }
  }

  test("gifBytes fixtures decode through ImageIO identically (both ways)") {
    val palette = Array.tabulate(16)(j =>
      (((j * 37) % 256) << 16) | (((j * 59 + 7) % 256) << 8) | ((j * 83 + 13) % 256))
    val w = 13; val h = 9
    val idx = Array.tabulate(w * h)(i => ((i * 5 + 2) % 16).toByte)
    val bytes = Gif.gifBytes(w, h, palette, idx)
    val ours = Gif.decode(bytes).get
    assert(ours.indices.sameElements(idx))
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null, "ImageIO must accept our GIF writer output")
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = palette(idx(y * w + x) & 0xff) | 0xff000000
      assert(ref.getRGB(x, y) == rgb, s"ImageIO pixel ($x,$y)")
    }
  }

  test("malformed payloads quarantine to None, never throw") {
    val palette = Array.tabulate(4)(j => j * 0x404040)
    val ok = Gif.gifBytes(4, 4, palette, Array.fill(16)(1.toByte))
    assert(Gif.decode(ok).isDefined)
    assert(Gif.decode(Array[Byte]()).isEmpty)
    assert(Gif.decode("GIF89a".getBytes("US-ASCII")).isEmpty)
    assert(Gif.decode(ok.take(ok.length / 2)).isEmpty)      // truncated data
    val noGct = ok.clone(); noGct(10) = (noGct(10) & 0x7f).toByte
    assert(Gif.decode(noGct).isEmpty)
    val pos = 13 + 3 * 4 + 8 + 9 // hdr + gct + gce + descriptor packed byte
    // absurd LZW min code size
    val badMin = ok.clone(); badMin(pos + 1) = 12
    assert(Gif.decode(badMin).isEmpty)
    // missing trailer (no 0x3b): malformed
    assert(Gif.decodeFrames(ok.dropRight(1)).isEmpty)
    // corrupt one LZW byte → either None or in-range indices
    // (depends on where it lands), but never a throw
    val corrupt = ok.clone(); corrupt(pos + 3) = 0x5a
    Gif.decode(corrupt)
  }

  test("animated: per-frame decode with local palettes; ImageIO agrees") {
    val global = Array.tabulate(8)(j => j * 0x202020)
    val local = Array(0x112233, 0x445566, 0x778899, 0xaabbcc)
    val w = 11; val h = 7
    val f0 = Array.tabulate(w * h)(i => ((i * 3) % 8).toByte)
    val f1 = Array.tabulate(w * h)(i => ((i * 5 + 1) % 4).toByte)
    val f2 = Array.tabulate(w * h)(i => ((i * 7 + 2) % 8).toByte)
    val bytes = Gif.gifAnimBytes(w, h, global,
      Seq((f0, None), (f1, Some(local)), (f2, None)))
    val (sw, sh, frames) = Gif.decodeFrames(bytes).get
    assert(sw == w && sh == h && frames.size == 3)
    assert(frames(0).indices.sameElements(f0) && !frames(0).localPalette)
    assert(frames(1).indices.sameElements(f1) && frames(1).localPalette)
    assert(frames(1).palette.toSeq == local.toSeq)
    assert(frames(2).indices.sameElements(f2))
    // maxFrames truncation
    assert(Gif.decodeFrames(bytes, maxFrames = 2).get._3.size == 2)
    // ImageIO frame-by-frame cross-check of our animated writer
    val iis = ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getNumImages(true) == 3)
    for ((idx, pal, fi) <- Seq((f0, global, 0), (f1, local, 1), (f2, global, 2))) {
      val img = reader.read(fi)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRGB(x, y) == (pal(idx(y * w + x) & 0xff) | 0xff000000),
          s"frame $fi pixel ($x,$y)")
    }
  }

  test("gifFeatures drops undecodable records and sums exactly") {
    val palette = Array(0x102030, 0x405060, 0x708090, 0xa0b0c0)
    val idx = Array.tabulate(6)(i => (i % 4).toByte)
    val good = Multimodal.MediaRecord(1L, "image",
      Gif.gifBytes(3, 2, palette, idx), Multimodal.MediaMeta(3, 2, "gif", 1))
    val bad = Multimodal.MediaRecord(2L, "image",
      Array[Byte](1, 2, 3), Multimodal.MediaMeta(0, 0, "?", 0))
    val got = Gif.gifFeatures(Seq(good, bad).toDS()).collect()
    assert(got.length == 1)
    val f = got.head
    // indices 0,1,2,3,0,1 → sum 7; reds 0x10*2+0x40*2+0x70+0xa0
    assert(f.doc_id == 1L && f.n_pixels == 6L && f.sum_index == 7L)
    assert(f.sum_red == 0x10 * 2 + 0x40 * 2 + 0x70 + 0xa0)
    assert(f.sum_blue == 0x30 * 2 + 0x60 * 2 + 0x90 + 0xc0)
    assert(f.n_colors == 4)
  }
}
