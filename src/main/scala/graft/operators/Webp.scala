package graft.operators

/** WebP container metadata: RIFF walk + per-variant dimension decode
  * for all three public bitstream flavors — 'VP8 ' (lossy key-frame
  * header, start code 9D 01 2A, 14-bit dims), 'VP8L' (lossless,
  * signature 0x2F, two 14-bit minus-one dims bit-packed
  * little-endian), and 'VP8X' (extended, 24-bit minus-one canvas
  * dims + feature flags). Everything is the public container spec;
  * dims never require decoding image data. Hostile bytes degrade to
  * None (quarantine), the same contract as every other decoder in
  * the repo. Completes the header tier across PNG/JPEG/GIF/BMP/WebP
  * — the five formats a crawl actually serves.
  */
object Webp {

  private def u24le(d: Array[Byte], i: Int): Int =
    (d(i) & 0xff) | ((d(i + 1) & 0xff) << 8) | ((d(i + 2) & 0xff) << 16)
  private def u32le(d: Array[Byte], i: Int): Long =
    (u24le(d, i).toLong) | ((d(i + 3) & 0xff).toLong << 24)

  /** Parse (variant, width, height, hasAlphaFlag) from a WebP file.
    * variant ∈ {"lossy", "lossless", "extended"}; the alpha flag is
    * only knowable for VP8X (feature bit) and VP8L (bit 28) — lossy
    * VP8 has none and reports false. */
  def parse(data: Array[Byte]): Option[(String, Int, Int, Boolean)] =
    try {
      if (data.length < 20) return None
      if (data(0) != 'R' || data(1) != 'I' || data(2) != 'F' ||
        data(3) != 'F') return None
      if (data(8) != 'W' || data(9) != 'E' || data(10) != 'B' ||
        data(11) != 'P') return None
      val riffLen = u32le(data, 4)
      if (riffLen < 4 || riffLen + 8 > data.length) return None
      val tag = new String(data, 12, 4, "US-ASCII")
      val len = u32le(data, 16)
      val p = 20
      tag match {
        case "VP8 " =>
          // key-frame: 3-byte frame tag, start code, 14-bit dims
          if (len < 10 || p + 10 > data.length) return None
          if ((data(p) & 0x01) != 0) return None // must be key frame
          if ((data(p + 3) & 0xff) != 0x9d || (data(p + 4) & 0xff) != 0x01 ||
            (data(p + 5) & 0xff) != 0x2a) return None
          val w = ((data(p + 6) & 0xff) | ((data(p + 7) & 0x3f) << 8))
          val h = ((data(p + 8) & 0xff) | ((data(p + 9) & 0x3f) << 8))
          if (w <= 0 || h <= 0) return None
          Some(("lossy", w, h, false))
        case "VP8L" =>
          if (len < 5 || p + 5 > data.length) return None
          if ((data(p) & 0xff) != 0x2f) return None
          val bits = u32le(data, p + 1)
          val w = (bits & 0x3fff).toInt + 1
          val h = ((bits >> 14) & 0x3fff).toInt + 1
          val alpha = ((bits >> 28) & 1L) == 1L
          Some(("lossless", w, h, alpha))
        case "VP8X" =>
          if (len < 10 || p + 10 > data.length) return None
          val alpha = ((data(p) & 0x10)) != 0
          val w = u24le(data, p + 4) + 1
          val h = u24le(data, p + 7) + 1
          Some(("extended", w, h, alpha))
        case _ => None
      }
    } catch { case _: Exception => None }

  /** Fixture builders — structurally valid containers with the real
    * bit layouts (payload beyond the parsed header is filler). */
  def encodeLossy(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && w < (1 << 14) && h > 0 && h < (1 << 14))
    val body = Array[Byte](
      0x00, 0x00, 0x00, // frame tag: key frame, version 0
      0x9d.toByte, 0x01, 0x2a,
      (w & 0xff).toByte, ((w >> 8) & 0x3f).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0x3f).toByte,
      0x00, 0x00) // filler
    riff("VP8 ", body)
  }

  def encodeLossless(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
    require(w > 0 && w <= (1 << 14) && h > 0 && h <= (1 << 14))
    val bits = (w - 1).toLong | ((h - 1).toLong << 14) |
      (if (alpha) 1L << 28 else 0L)
    val body = Array[Byte](0x2f,
      (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
      ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte,
      0x00) // filler
    riff("VP8L", body)
  }

  def encodeExtended(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
    require(w > 0 && w <= (1 << 24) && h > 0 && h <= (1 << 24))
    val body = Array[Byte](
      (if (alpha) 0x10 else 0x00).toByte, 0x00, 0x00, 0x00,
      ((w - 1) & 0xff).toByte, (((w - 1) >> 8) & 0xff).toByte,
      (((w - 1) >> 16) & 0xff).toByte,
      ((h - 1) & 0xff).toByte, (((h - 1) >> 8) & 0xff).toByte,
      (((h - 1) >> 16) & 0xff).toByte)
    riff("VP8X", body)
  }

  private def riff(tag: String, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32le(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    w32le(4 + 8 + body.length)
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    out.write(tag.getBytes("US-ASCII"))
    w32le(body.length)
    out.write(body)
    out.toByteArray
  }
}
