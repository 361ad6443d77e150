package graft

import graft.operators.{Tiff, Webp}

/** WebP (all three bitstream variants) and standalone TIFF header
  * parsing: bit-layout round trips, both byte orders, hostile-input
  * quarantine. */
class WebpTiffSpec extends SparkSpec {

  test("WebP lossy/lossless/extended dims round-trip the bit layouts") {
    assert(Webp.parse(Webp.encodeLossy(640, 480))
      .contains(("lossy", 640, 480, false)))
    // 14-bit boundary values
    assert(Webp.parse(Webp.encodeLossless(16384, 1, alpha = true))
      .contains(("lossless", 16384, 1, true)))
    assert(Webp.parse(Webp.encodeLossless(3, 16384, alpha = false))
      .contains(("lossless", 3, 16384, false)))
    // 24-bit canvas dims
    assert(Webp.parse(Webp.encodeExtended(70000, 2, alpha = true))
      .contains(("extended", 70000, 2, true)))
  }

  test("WebP hostile input quarantines") {
    assert(Webp.parse("RIFFxxxxWAVE".getBytes).isEmpty) // RIFF, not WebP
    assert(Webp.parse(Array[Byte]()).isEmpty)
    val good = Webp.encodeLossy(8, 8)
    assert(Webp.parse(good.take(16)).isEmpty) // truncated
    val badStart = good.clone(); badStart(23) = 0 // corrupt start code
    assert(Webp.parse(badStart).isEmpty)
    val interFrame = good.clone(); interFrame(20) = 0x01 // not a key frame
    assert(Webp.parse(interFrame).isEmpty)
  }

  test("TIFF dims parse in both byte orders, SHORT and LONG types") {
    for (le <- Seq(true, false); longDims <- Seq(true, false))
      assert(Tiff.parse(Tiff.encode(800, 600, 8, 1, le, longDims))
        .contains((800, 600, 8, 1, le)),
        s"le=$le longDims=$longDims")
  }

  test("TIFF external BitsPerSample array: uniform reads, mixed rejects") {
    assert(Tiff.parse(Tiff.encode(32, 16, 8, 3, littleEndian = true))
      .contains((32, 16, 8, 3, true)))
    // hand-corrupt the second array entry → mixed depth → quarantine
    val t = Tiff.encode(32, 16, 8, 3, littleEndian = true)
    t(t.length - 2 * 3 + 2) = 16.toByte
    assert(Tiff.parse(t).isEmpty)
  }

  test("TIFF hostile input quarantines") {
    assert(Tiff.parse("not a tiff".getBytes).isEmpty)
    val good = Tiff.encode(8, 8, 8, 1, littleEndian = false)
    assert(Tiff.parse(good.take(9)).isEmpty)
    val badMagic = good.clone(); badMagic(3) = 43.toByte
    assert(Tiff.parse(badMagic).isEmpty)
  }
}
