package graft.operators

/** MP3 container metadata: ID3v2 tag skip + MPEG-1 Layer III frame
  * walk — the metadata tier for the web's dominant audio format,
  * parallel to the WAV/RIFF (q27) and MP4/BMFF (q27/q114) walks. A
  * crawl audio corpus needs duration/bitrate/sample-rate without
  * decoding audio: every number here comes from the public header
  * tables of ISO 11172-3 (bitrate/sample-rate indices, the
  * 144·bitrate/samplerate+padding frame-length rule, 1152
  * samples/frame) and the ID3v2.3 spec (10-byte header, 28-bit
  * sync-safe size). Hostile bytes degrade to None or stop the walk at
  * the last whole frame — crawl truncation is normal, never an
  * exception.
  *
  * Scope: MPEG-1 Layer III (the "MP3" of the web). MPEG-2/2.5 and
  * other layers quarantine — the same deliberate tiering as the
  * image decoders (unsupported profiles are *detected*, not
  * mis-parsed).
  */
object Mp3 {

  /** kbps by bitrate index, MPEG-1 Layer III (index 0 = "free" and
    * 15 = bad — both quarantine). */
  private[operators] val BitrateKbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** Hz by sample-rate index, MPEG-1 (index 3 reserved). */
  private[operators] val SampleRateHz = Array(44100, 48000, 32000)

  private val SamplesPerFrame = 1152

  /** Byte length of one frame from its header fields. */
  private[operators] def frameLen(bitrateKbps: Int, sampleRate: Int,
      padding: Int): Int =
    144000 * bitrateKbps / sampleRate + padding

  /** Size of a leading ID3v2 tag (including its 10-byte header), or 0
    * when none. The 4 size bytes are SYNC-SAFE: 7 bits each, high bit
    * must be clear — a tag whose size bytes have the high bit set is
    * malformed and reported as -1 so the caller quarantines. */
  def id3v2Size(data: Array[Byte]): Int = {
    if (data.length < 10 || data(0) != 'I' || data(1) != 'D' ||
      data(2) != '3') return 0
    var size = 0
    var i = 6
    while (i < 10) {
      val b = data(i) & 0xff
      if ((b & 0x80) != 0) return -1
      size = (size << 7) | b
      i += 1
    }
    10 + size
  }

  /** Walk the frame sequence. Returns (n_frames, audio_bytes,
    * sample_rate_hz, duration_ms, mean_bitrate_kbps, is_vbr), or None
    * when no valid MPEG-1 Layer III frame starts the stream (after any
    * ID3v2 tag). The walk stops cleanly at: a trailing ID3v1 "TAG"
    * block, a truncated final frame, or any non-frame bytes —
    * everything before the stop still counts (crawl-truncation
    * tolerance, the q22 WET contract). duration_ms is exact integer
    * arithmetic: frames·1152·1000 div rate. */
  def mp3Frames(data: Array[Byte])
      : Option[(Int, Long, Int, Long, Long, Boolean)] =
    try {
      val id3 = id3v2Size(data)
      if (id3 < 0 || id3 >= data.length) return None
      var pos = id3
      var frames = 0
      var bytes = 0L
      var rate = -1
      var brSum = 0L
      var brMin = Int.MaxValue
      var brMax = Int.MinValue
      var stop = false
      while (!stop && pos + 4 <= data.length) {
        val b0 = data(pos) & 0xff; val b1 = data(pos + 1) & 0xff
        if (b0 == 'T' && b1 == 'A' && pos + 2 < data.length &&
          (data(pos + 2) & 0xff) == 'G') {
          stop = true // trailing ID3v1 block
        } else if (b0 != 0xff || (b1 & 0xfe) != 0xfa) {
          // sync + MPEG-1 (version bits 11) + Layer III (layer bits 01):
          // 1111 1111 111 11 01 x — second byte 0xfa or 0xfb
          stop = true
        } else {
          val b2 = data(pos + 2) & 0xff
          val brIdx = (b2 >> 4) & 0xf
          val srIdx = (b2 >> 2) & 0x3
          val padding = (b2 >> 1) & 0x1
          if (brIdx == 0 || brIdx == 15 || srIdx == 3) {
            stop = true // free/bad bitrate, reserved rate: quarantine point
          } else {
            val sr = SampleRateHz(srIdx)
            if (rate == -1) rate = sr
            if (sr != rate) stop = true // rate change mid-stream: stop
            else {
              val len = frameLen(BitrateKbps(brIdx), sr, padding)
              if (pos + len > data.length) stop = true // truncated tail
              else {
                frames += 1
                bytes += len
                brSum += BitrateKbps(brIdx)
                brMin = math.min(brMin, BitrateKbps(brIdx))
                brMax = math.max(brMax, BitrateKbps(brIdx))
                pos += len
              }
            }
          }
        }
      }
      if (frames == 0) None
      else Some((frames, bytes, rate,
        frames.toLong * SamplesPerFrame * 1000L / rate,
        brSum / frames, brMin != brMax))
    } catch { case _: Exception => None }

  /** Test-fixture builder: a syntactically valid MPEG-1 Layer III
    * stream — per-frame (bitrateIdx, padding) headers with
    * deterministic filler payload, an optional leading ID3v2 tag
    * (sync-safe size), an optional trailing ID3v1 block. */
  def mp3Encode(frameSpec: Seq[(Int, Int)], srIdx: Int,
      id3v2Bytes: Int = 0, id3v1: Boolean = false): Array[Byte] = {
    require(srIdx >= 0 && srIdx <= 2, s"bad srIdx $srIdx")
    val out = new java.io.ByteArrayOutputStream()
    if (id3v2Bytes > 0) {
      require(id3v2Bytes < (1 << 28), "tag too big")
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0) // v2.3, no flags
      out.write((id3v2Bytes >> 21) & 0x7f); out.write((id3v2Bytes >> 14) & 0x7f)
      out.write((id3v2Bytes >> 7) & 0x7f); out.write(id3v2Bytes & 0x7f)
      var i = 0; while (i < id3v2Bytes) { out.write(0x54); i += 1 }
    }
    for ((brIdx, padding) <- frameSpec) {
      require(brIdx >= 1 && brIdx <= 14, s"bad brIdx $brIdx")
      require(padding == 0 || padding == 1, s"bad padding $padding")
      val len = frameLen(BitrateKbps(brIdx), SampleRateHz(srIdx), padding)
      out.write(0xff); out.write(0xfb) // sync, MPEG-1, Layer III, no CRC
      out.write((brIdx << 4) | (srIdx << 2) | (padding << 1))
      out.write(0x00) // stereo, no emphasis
      var i = 4; while (i < len) { out.write((i * 37 + brIdx) & 0xff); i += 1 }
    }
    if (id3v1) {
      out.write('T'); out.write('A'); out.write('G')
      var i = 3; while (i < 128) { out.write(0); i += 1 }
    }
    out.toByteArray
  }
}
