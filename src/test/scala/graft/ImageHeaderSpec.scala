package graft

import graft.operators.Multimodal

/** Real PNG/JPEG header codec: byte-level round trips, marker-scan
  * robustness, and rejection of malformed heads. */
class ImageHeaderSpec extends SparkSpec {

  test("PNG round trip: signature + IHDR + CRC parse back exactly") {
    for ((w, h, ch) <- Seq((64, 48, 1), (703, 527, 3), (1, 1, 4), (640, 480, 2))) {
      val hdr = Multimodal.pngHeader(w, h, ch)
      assert(hdr.length == 33)
      assert(Multimodal.parseImageHeader(hdr ++ Array.fill[Byte](10)(42))
        .contains(("png", w, h, ch)))
    }
  }

  test("JPEG round trip: SOI + APP0 + SOF0 parse back exactly") {
    for ((w, h, ch) <- Seq((64, 48, 1), (703, 527, 3), (65535, 1, 3))) {
      val hdr = Multimodal.jpegHeader(w, h, ch)
      assert(hdr.length == (if (ch == 1) 33 else 39))
      assert(Multimodal.parseImageHeader(hdr ++ Array.fill[Byte](10)(42))
        .contains(("jpeg", w, h, ch)))
    }
  }

  test("JPEG marker scan skips extra segments, fill bytes, RST markers") {
    val base = Multimodal.jpegHeader(320, 240, 3)
    val (soi, rest) = base.splitAt(2)
    // splice a COM segment, a fill byte, and a standalone RST0 before APP0
    val com = Array(0xFF.toByte, 0xFE.toByte, 0x00.toByte, 0x06.toByte) ++
      "test".getBytes("US-ASCII")
    val extra = soi ++ com ++ Array(0xFF.toByte) ++
      Array(0xFF.toByte, 0xD0.toByte) ++ rest
    assert(Multimodal.parseImageHeader(extra).contains(("jpeg", 320, 240, 3)))
  }

  test("malformed heads are rejected, not mis-parsed") {
    // truncated PNG (signature only), wrong first chunk, bad JPEG scan
    assert(Multimodal.parseImageHeader(
      Multimodal.pngHeader(10, 10, 3).take(20)).isEmpty)
    val notIhdr = Multimodal.pngHeader(10, 10, 3)
    notIhdr(13) = 'X'.toByte
    assert(Multimodal.parseImageHeader(notIhdr).isEmpty)
    assert(Multimodal.parseImageHeader(Array[Byte](0xFF.toByte, 0xD8.toByte,
      0x00, 0x01, 0x02)).isEmpty) // non-marker byte after SOI
    assert(Multimodal.parseImageHeader("plain text".getBytes).isEmpty)
    assert(Multimodal.parseImageHeader(Array.empty[Byte]).isEmpty)
  }

  test("WAV round trip: chunk traversal past JUNK, PCM duration math") {
    val payload = Array.fill[Byte](32000)(7) // 1s at 16kHz mono 16-bit
    val wav = Multimodal.wavBytes(1, 16000, payload)
    assert(wav.length == 56 + payload.length)
    assert(Multimodal.parseWav(wav).contains((1, 16000, 1000L)))
    // stereo halves the per-channel sample count
    assert(Multimodal.parseWav(Multimodal.wavBytes(2, 16000, payload))
      .contains((2, 16000, 500L)))
    // malformed: not RIFF / truncated data chunk tolerated via clamp
    assert(Multimodal.parseWav("nope".getBytes).isEmpty)
    assert(Multimodal.parseWav(wav.take(40)).isEmpty)
    // hostile chunk size (0xFFFFFFFF) before fmt: must terminate
    // (bounded-advance guard), not walk the cursor backward forever
    val evil = "RIFF".getBytes ++ Array[Byte](8, 0, 0, 0) ++
      "WAVE".getBytes ++ "JUNK".getBytes ++
      Array[Byte](-1, -1, -1, -1) ++ Array.fill[Byte](16)(0)
    assert(Multimodal.parseWav(evil).isEmpty)
  }

  test("MP4 round trip: box scan past free, mvhd v0 and v1") {
    val mp4 = Multimodal.mp4Bytes(600, 1200L, Array.fill[Byte](10)(1))
    assert(mp4.length == 156 + 10)
    assert(Multimodal.parseMp4(mp4).contains(2000L)) // 1200/600 s
    // hand-build a version-1 mvhd (64-bit times) inside moov
    def be4(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def be8(v: Long) = be4((v >>> 32).toInt) ++ be4(v.toInt)
    val mvhdV1 = be4(1 << 24) ++ be8(0) ++ be8(0) ++ be4(1000) ++ be8(2500L)
    val mvhdBox = be4(mvhdV1.length + 8) ++ "mvhd".getBytes ++ mvhdV1
    val moov = be4(mvhdBox.length + 8) ++ "moov".getBytes ++ mvhdBox
    assert(Multimodal.parseMp4(moov).contains(2500L))
    assert(Multimodal.parseMp4("AAAA".getBytes).isEmpty)
  }

  test("dataset decode recovers encoder dimensions over real containers") {
    import spark.implicits._
    val docs = Seq(
      (0L, "even id png gray", "en", "web", 16L),
      (1L, "odd id jpeg here!", "en", "web", 17L),
      (2L, "png again even n", "en", "web", 16L),
      (3L, "jpeg odd n chars", "en", "web", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Multimodal.decodeImage(
        Multimodal.encodeImageContainers(Multimodal.ingest(docs)))
      .collect().map(i => i.doc_id -> i).toMap
    assert(got.size == 4)
    for ((id, i) <- got) {
      val n = docs.where($"doc_id" === id).head.getAs[Long]("n_chars")
      assert(i.format == (if (id % 2 == 0) "png" else "jpeg"))
      assert(i.width == (n % 640 + 64) && i.height == (n % 480 + 48))
      assert(i.channels == (if (n % 2 == 0) 1 else 3))
    }
  }
}
