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

  test("TIFF inline SHORT BitsPerSample (count 2, spp=2 gray+alpha): " +
      "value field holds the shorts, NOT an offset") {
    // TIFF 6.0 §2: a 4-byte SHORT[2] is stored inline; the old
    // external-offset read would misinterpret the (8, 8) pair as
    // offset 0x00080008 and garbage-parse or bounds-reject
    for (le <- Seq(true, false))
      assert(Tiff.parse(Tiff.encode(32, 16, 8, 2, le))
        .contains((32, 16, 8, 2, le)), s"le=$le")
    // mixed inline depths quarantine, same as the external path
    val t = Tiff.encode(32, 16, 8, 2, littleEndian = true)
    // entry 3 of 4 (tag 258) starts at 8 + 2 + 2*12; value field +8,
    // second short +10
    val valueField = 8 + 2 + 2 * 12 + 8
    t(valueField + 2) = 16.toByte
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
