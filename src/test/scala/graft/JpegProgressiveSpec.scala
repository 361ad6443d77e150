package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import graft.operators.Multimodal

/** Progressive JPEG (SOF2) conformance: the JDK's writer emits real
  * multi-scan progressive streams (spectral selection + successive
  * approximation, EOB runs, AC refinement) — decode them and compare
  * against ImageIO's own read of the same bytes. */
class JpegProgressiveSpec extends SparkSpec {

  private def writeProgressive(img: BufferedImage): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), params)
    writer.dispose(); ios.close()
    val bytes = bos.toByteArray
    // confirm the file really is SOF2 (otherwise this spec tests nothing)
    var pos = 2
    var sof = -1
    while (sof < 0 && pos + 3 < bytes.length) {
      if ((bytes(pos) & 0xff) == 0xff) {
        val m = bytes(pos + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          sof = m
        else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) pos += 2
        else pos += 2 + (((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff))
      } else pos += 1
    }
    assert(sof == 0xc2, s"expected SOF2, got SOF marker 0x$sof%x")
    bytes
  }

  test("grayscale progressive: our decode matches ImageIO's") {
    val (w, h) = (37, 29) // non-multiple-of-8 edges
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 13 + y * 7 + (x * y) % 31) % 256)
    val bytes = writeProgressive(img)
    val ours = Multimodal.jpegDecodePixels(bytes)
    assert(ours.isDefined, "progressive grayscale must decode")
    val (gw, gh, gch, gpx) = ours.get
    assert((gw, gh, gch) == (w, h, 1))
    val ref = ImageIO.read(new ByteArrayInputStream(bytes))
    var maxD = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(ref.getRaster.getSample(x, y, 0) - (gpx(y * w + x) & 0xff))
      if (d > maxD) maxD = d
    }
    assert(maxD <= 1, s"max pixel delta $maxD vs ImageIO")
  }

  test("subsampled color progressive: matches ImageIO within upsample tolerance") {
    val (w, h) = (48, 32)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // smooth gradients: keeps replication-vs-fancy chroma upsampling
      // differences small, as in the baseline 4:2:0 test
      val r = 40 + (x * 3)
      val g = 60 + (y * 4)
      val b = 200 - (x + y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bytes = writeProgressive(img)
    val ours = Multimodal.jpegDecodePixels(bytes)
    assert(ours.isDefined, "progressive 4:2:0 color must decode")
    val (gw, gh, gch, gpx) = ours.get
    assert((gw, gh, gch) == (w, h, 3))
    val ref = ImageIO.read(new ByteArrayInputStream(bytes))
    var sumD = 0L; var maxD = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val rc = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs(rc - (gpx((y * w + x) * 3 + c) & 0xff))
      sumD += d; if (d > maxD) maxD = d
    }
    val mean = sumD.toDouble / (w * h * 3)
    assert(mean <= 2.0, s"mean err $mean")
    assert(maxD <= 24, s"max err $maxD") // chroma-edge upsampling family
  }

  test("progressive streams that are malformed degrade to None") {
    val img = new BufferedImage(24, 16, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 24)
      img.getRaster.setSample(x, y, 0, (x * 9 + y) % 256)
    val ok = writeProgressive(img)
    assert(Multimodal.jpegDecodePixels(ok).isDefined)
    // truncated mid-scan: no EOI → None
    assert(Multimodal.jpegDecodePixels(ok.take(ok.length - 20)).isEmpty)
    // SOS before SOF2: slice from the first SOS onward, prepend SOI
    val sosAt = (2 until ok.length - 1).find(i =>
      (ok(i) & 0xff) == 0xff && (ok(i + 1) & 0xff) == 0xda).get
    val headless = Array[Byte](0xff.toByte, 0xd8.toByte) ++ ok.drop(sosAt)
    assert(Multimodal.jpegDecodePixels(headless).isEmpty)
  }
}
