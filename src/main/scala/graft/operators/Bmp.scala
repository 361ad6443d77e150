package graft.operators

import org.apache.spark.sql.Dataset

/** BMP (Windows DIB) pixel decode — the uncompressed image tier:
  * screenshots, scanned documents, and legacy exports in any crawl.
  * BITMAPINFOHEADER layout (the near-universal one): 14-byte file
  * header, 40-byte info header, optional palette, 4-byte-aligned rows,
  * bottom-up by default (negative height = top-down). Supported:
  * 24-bit BGR and 8/4-bit paletted (ImageIO writes 4-bit for small
  * palettes), BI_RGB (uncompressed) only — RLE, 16/32-bit bitfields,
  * and V4/V5 headers degrade to None (quarantine, never throw — the
  * same contract as the PNG/JPEG/GIF decoders).
  *
  * Scale shape: one narrow `mapPartitions`; image bytes never shuffle.
  */
object Bmp {

  final case class BmpPixels(width: Int, height: Int,
      rgb: Array[Byte]) // row-major top-down, 3 bytes/px

  final case class BmpFeatures(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, sum_red: Long, sum_green: Long, sum_blue: Long,
      bits_per_pixel: Int)

  def decode(data: Array[Byte]): Option[BmpPixels] =
    try decodeImpl(data)
    catch { case _: Exception => None }

  private def decodeImpl(data: Array[Byte]): Option[BmpPixels] = {
    def u8(i: Int): Int = data(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    def s32(i: Int): Int = u32(i).toInt
    if (data.length < 54 || u8(0) != 'B' || u8(1) != 'M') return None
    val pixelOff = u32(10)
    val hdrSize = u32(14)
    if (hdrSize != 40) return None // BITMAPINFOHEADER only
    val w = s32(18)
    val rawH = s32(22)
    val topDown = rawH < 0
    val h = math.abs(rawH)
    val planes = u16(26)
    val bpp = u16(28)
    val compression = u32(30)
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    if (planes != 1 || compression != 0) return None
    if (bpp != 24 && bpp != 8 && bpp != 4) return None
    val off = pixelOff.toInt
    val palette: Array[Int] =
      if (bpp != 24) {
        // colorsUsed when declared; else whatever fits between the
        // headers and the pixel start (ImageIO writes colorsUsed=0
        // with a minimal table), capped at 2^bpp
        var n = u32(46).toInt
        if (n <= 0) n = math.min(1 << bpp, (off - 54) / 4)
        if (n <= 0 || n > (1 << bpp) || 54 + 4 * n > data.length) return None
        Array.tabulate(n) { j => // BGRA quads
          (u8(54 + 4 * j + 2) << 16) | (u8(54 + 4 * j + 1) << 8) | u8(54 + 4 * j)
        }
      } else null
    val rowSize = ((w * bpp + 7) / 8 + 3) & ~3 // 4-byte row alignment
    if (off < 54 || off.toLong + rowSize.toLong * h > data.length) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = off + (if (topDown) y else h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val dst = (y * w + x) * 3
        if (bpp == 24) { // stored BGR
          out(dst) = data(srcRow + 3 * x + 2)
          out(dst + 1) = data(srcRow + 3 * x + 1)
          out(dst + 2) = data(srcRow + 3 * x)
        } else {
          val idx =
            if (bpp == 8) u8(srcRow + x)
            else { // 4-bit: high nibble first
              val b = u8(srcRow + x / 2)
              if ((x & 1) == 0) b >> 4 else b & 0x0f
            }
          if (idx >= palette.length) return None
          val c = palette(idx)
          out(dst) = ((c >> 16) & 0xff).toByte
          out(dst + 1) = ((c >> 8) & 0xff).toByte
          out(dst + 2) = (c & 0xff).toByte
        }
        x += 1
      }
      y += 1
    }
    Some(BmpPixels(w, h, out))
  }

  /** Minimal 24-bit BI_RGB writer (bottom-up, padded rows) — fixture
    * staging and a valid interchange file any viewer opens. `rgb` is
    * row-major top-down. */
  def bmpBytes(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "3 bytes per pixel")
    val rowSize = (w * 3 + 3) & ~3
    val size = 54 + rowSize * h
    val out = new Array[Byte](size)
    def le16(p: Int, v: Int): Unit = {
      out(p) = v.toByte; out(p + 1) = (v >> 8).toByte
    }
    def le32(p: Int, v: Int): Unit = {
      le16(p, v & 0xffff); le16(p + 2, (v >> 16) & 0xffff)
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, size); le32(10, 54)
    le32(14, 40); le32(18, w); le32(22, h)
    le16(26, 1); le16(28, 24); le32(30, 0)
    le32(34, rowSize * h)
    var y = 0
    while (y < h) {
      val dstRow = 54 + (h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val src = (y * w + x) * 3
        out(dstRow + 3 * x) = rgb(src + 2)     // B
        out(dstRow + 3 * x + 1) = rgb(src + 1) // G
        out(dstRow + 3 * x + 2) = rgb(src)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Per-channel pixel sums per decoded BMP; undecodable payloads
    * drop. */
  def bmpFeatures(media: Dataset[Multimodal.MediaRecord])
      : Dataset[BmpFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decode(r.data).map { b =>
          var sr = 0L; var sg = 0L; var sb = 0L
          var i = 0
          while (i < b.rgb.length) {
            sr += b.rgb(i) & 0xff
            sg += b.rgb(i + 1) & 0xff
            sb += b.rgb(i + 2) & 0xff
            i += 3
          }
          val bpp = (r.data(28) & 0xff) | ((r.data(29) & 0xff) << 8)
          BmpFeatures(r.doc_id, b.width, b.height,
            b.width.toLong * b.height, sr, sg, sb, bpp)
        }
      }
    }
  }
}
