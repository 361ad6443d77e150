package graft

import graft.operators.Mp3

/** MP3 frame walk: ID3v2 sync-safe skip, header-table arithmetic,
  * VBR detection, and the crawl-truncation stop contract. */
class Mp3Spec extends SparkSpec {

  test("CBR stream: frame count, bytes, duration arithmetic exact") {
    // 5 frames at 128 kbps / 44100 Hz, alternating padding
    val spec = Seq.tabulate(5)(i => (9, i % 2))
    val bytes = Mp3.mp3Encode(spec, 0)
    val Some((frames, audio, rate, durMs, meanBr, vbr)) =
      Mp3.mp3Frames(bytes)
    assert(frames == 5 && rate == 44100 && !vbr && meanBr == 128)
    // frameLen = 144000*128/44100 = 417 (+1 padded)
    assert(audio == 417L * 5 + 2)
    assert(durMs == 5L * 1152 * 1000 / 44100)
  }

  test("ID3v2 sync-safe size skips exactly, including ≥128-byte tags") {
    val spec = Seq((5, 0), (5, 0))
    val plain = Mp3.mp3Frames(Mp3.mp3Encode(spec, 1)).get
    // 200 > 127 exercises the 7-bit carry in the sync-safe encoding
    val tagged = Mp3.mp3Frames(Mp3.mp3Encode(spec, 1, id3v2Bytes = 200)).get
    assert(tagged == plain)
    assert(Mp3.id3v2Size(Mp3.mp3Encode(spec, 1, id3v2Bytes = 200)) == 210)
    // malformed sync-safe byte (high bit set) → quarantine
    val bad = Mp3.mp3Encode(spec, 1, id3v2Bytes = 200)
    bad(6) = 0x80.toByte
    assert(Mp3.id3v2Size(bad) == -1 && Mp3.mp3Frames(bad).isEmpty)
  }

  test("VBR detected; mean bitrate is the integer frame average") {
    val spec = Seq((1, 0), (14, 0), (9, 0)) // 32, 320, 128 kbps
    val Some((_, _, _, _, meanBr, vbr)) =
      Mp3.mp3Frames(Mp3.mp3Encode(spec, 2))
    assert(vbr && meanBr == (32 + 320 + 128) / 3)
  }

  test("truncated tail stops at the last whole frame; ID3v1 stops the walk") {
    val full = Mp3.mp3Encode(Seq((9, 0), (9, 0), (9, 0)), 0)
    val cut = full.take(full.length - 10)
    assert(Mp3.mp3Frames(cut).get._1 == 2)
    val withTag = Mp3.mp3Encode(Seq((9, 0), (9, 0)), 0, id3v1 = true)
    val Some((frames, audio, _, _, _, _)) = Mp3.mp3Frames(withTag)
    assert(frames == 2 && audio == withTag.length - 128L)
  }

  test("hostile input quarantines: non-MP3, free/bad bitrate, reserved rate") {
    assert(Mp3.mp3Frames("RIFFnot an mp3".getBytes).isEmpty)
    assert(Mp3.mp3Frames(Array[Byte]()).isEmpty)
    // a lone header with bitrate index 15 (bad)
    assert(Mp3.mp3Frames(
      Array(0xff, 0xfb, 0xf0, 0x00).map(_.toByte)).isEmpty)
    // reserved sample-rate index 3
    assert(Mp3.mp3Frames(
      Array(0xff, 0xfb, 0x9c, 0x00).map(_.toByte)).isEmpty)
    // MPEG-2 (version bits 10) quarantines — tiering, not mis-parse
    assert(Mp3.mp3Frames(
      Array(0xff, 0xf3, 0x90, 0x00).map(_.toByte)).isEmpty)
  }
}
