package graft.operators

import org.apache.spark.sql.Dataset

/** GIF87a/89a pixel decode — the third real image codec in the engine
  * (after PNG's inflate+defilter and baseline JPEG's Huffman+IDCT),
  * hermetic like the others: the LZW decompressor is implemented here
  * from the public GIF specification (CompuServe GIF89a, 1990), no
  * codec library. GIFs are a steady fraction of any web crawl, and a
  * pixel-level decode is what perceptual hashing / mean-luma curation
  * needs.
  *
  * Supported: global AND per-frame local color tables, multi-frame
  * animated GIFs via [[decodeFrames]] (up to `maxFrames`, each frame
  * with its own descriptor, palette, interlace flag, and LZW stream —
  * q122 depends on this), interlaced or sequential row order
  * (javax.imageio writes interlaced, so crawls contain plenty), full
  * variable-width LZW (dictionary growth to 12 bits, clear/EOI codes,
  * the KwKwK self-reference case), extension-block skipping (GCE,
  * comments, application). Only the still-image view [[decode]]
  * restricts to a single full-screen first frame. Malformed payloads
  * return None (degrade-to-quarantine, never throw — same contract as
  * the PNG and JPEG decoders; a crawl payload must not be able to hang
  * or kill an executor).
  *
  * Scale shape: per-record byte work inside `mapPartitions`; image
  * bytes never shuffle, only fixed-width feature rows leave.
  */
object Gif {

  final case class GifPixels(width: Int, height: Int,
      indices: Array[Byte], palette: Array[Int]) // palette: 0xRRGGBB

  final case class GifFrame(index: Int, left: Int, top: Int, width: Int,
      height: Int, indices: Array[Byte], palette: Array[Int],
      localPalette: Boolean)

  final case class GifFeatures(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, sum_index: Long, sum_red: Long, sum_green: Long,
      sum_blue: Long, n_colors: Int)

  /** Decode the FIRST frame of a GIF payload (still-image view): the
    * frame must cover the full logical screen at (0,0). None on
    * anything malformed. */
  def decode(data: Array[Byte]): Option[GifPixels] =
    decodeFrames(data, maxFrames = 1).flatMap { case (w, h, frames) =>
      frames.headOption.collect {
        case f if f.left == 0 && f.top == 0 && f.width == w && f.height == h =>
          GifPixels(w, h, f.indices, f.palette)
      }
    }

  /** Decode up to `maxFrames` frames of a (possibly animated) GIF.
    * Each frame decodes independently — its own descriptor, optional
    * LOCAL color table (falling back to the global one), own
    * interlace flag, own LZW stream. No disposal compositing: a
    * frame-sampling pipeline consumes raw frames (compositing is a
    * renderer concern). Returns (screenW, screenH, frames); None if
    * the container is malformed or a frame fails to decode. */
  def decodeFrames(data: Array[Byte],
      maxFrames: Int = 64): Option[(Int, Int, Seq[GifFrame])] =
    try decodeImpl(data, maxFrames)
    catch { case _: Exception => None }

  private def decodeImpl(data: Array[Byte],
      maxFrames: Int): Option[(Int, Int, Seq[GifFrame])] = {
    def u8(i: Int): Int = data(i) & 0xff
    def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (data.length < 13) return None
    val sig = new String(data, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val screenW = u16(6)
    val screenH = u16(8)
    val packed = u8(10)
    var pos = 13
    val global: Option[Array[Int]] =
      if ((packed & 0x80) == 0) None
      else {
        val n = 2 << (packed & 7)
        if (pos + 3 * n > data.length) return None
        val p = Array.tabulate(n) { j =>
          (u8(pos + 3 * j) << 16) | (u8(pos + 3 * j + 1) << 8) |
            u8(pos + 3 * j + 2)
        }
        pos += 3 * n
        Some(p)
      }
    val frames = Seq.newBuilder[GifFrame]
    var nFrames = 0
    while (nFrames < maxFrames) {
      // skip extension blocks between frames
      while (pos + 1 < data.length && u8(pos) == 0x21) {
        pos += 2 // introducer + label
        while (pos < data.length && u8(pos) != 0) pos += 1 + u8(pos)
        pos += 1 // block terminator
      }
      if (pos >= data.length) return None // no trailer: malformed
      if (u8(pos) == 0x3b)                // trailer: done
        return Some((screenW, screenH, frames.result()))
      if (u8(pos) != 0x2c || pos + 10 > data.length) return None
      val left = u16(pos + 1)
      val top = u16(pos + 3)
      val w = u16(pos + 5)
      val h = u16(pos + 7)
      val idPacked = u8(pos + 9)
      val interlaced = (idPacked & 0x40) != 0
      if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
      pos += 10
      val palette: Array[Int] =
        if ((idPacked & 0x80) != 0) { // local color table
          val n = 2 << (idPacked & 7)
          if (pos + 3 * n > data.length) return None
          val p = Array.tabulate(n) { j =>
            (u8(pos + 3 * j) << 16) | (u8(pos + 3 * j + 1) << 8) |
              u8(pos + 3 * j + 2)
          }
          pos += 3 * n
          p
        } else global.getOrElse(return None)
      if (pos >= data.length) return None
      val minCode = u8(pos)
      pos += 1
      if (minCode < 1 || minCode > 8) return None
      val lzw = new java.io.ByteArrayOutputStream()
      while (pos < data.length && u8(pos) != 0) {
        val len = u8(pos)
        if (pos + 1 + len > data.length) return None
        lzw.write(data, pos + 1, len)
        pos += 1 + len
      }
      if (pos >= data.length) return None
      pos += 1 // sub-block terminator
      val raw = lzwDecode(lzw.toByteArray, minCode, w * h).getOrElse(return None)
      if (raw.exists(b => (b & 0xff) >= palette.length)) return None
      val idx = if (interlaced) deinterlace(raw, w, h) else raw
      frames += GifFrame(nFrames, left, top, w, h, idx, palette,
        localPalette = (idPacked & 0x80) != 0)
      nFrames += 1
    }
    Some((screenW, screenH, frames.result()))
  }

  /** GIF 4-pass interlace: decoded rows arrive in pass order (every
    * 8th from 0, every 8th from 4, every 4th from 2, every 2nd from
    * 1); scatter them back to display order. */
  private[graft] def deinterlace(raw: Array[Byte], w: Int,
      h: Int): Array[Byte] = {
    val out = new Array[Byte](raw.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) {
        System.arraycopy(raw, src * w, out, y * w, w)
        src += 1
        y += step
      }
    }
    out
  }

  /** Variable-width LSB-first LZW per the GIF spec. `minCode` is the
    * root code size; clear = 2^minCode, EOI = clear+1; code width
    * grows when the dictionary fills its width, capped at 12 bits
    * (width stays 12 until the next clear). Decodes exactly
    * `nExpected` indices (extra output is truncated; short output →
    * None). */
  private[graft] def lzwDecode(bytes: Array[Byte], minCode: Int,
      nExpected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    // dictionary as (prefixCode, appendedByte); roots are implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var dictSize = eoi + 1
    var width = minCode + 1
    val out = new Array[Byte](nExpected)
    var outLen = 0
    var bitPos = 0
    val nBits = bytes.length * 8
    var prev = -1

    def readCode(): Int = {
      if (bitPos + width > nBits) return -1
      var v = 0
      var i = 0
      while (i < width) {
        val b = bitPos + i
        if ((bytes(b >> 3) & (1 << (b & 7))) != 0) v |= 1 << i
        i += 1
      }
      bitPos += width
      v
    }
    // expand a code to out[] (reversed walk); returns first byte, or -1
    val stack = new Array[Byte](4096)
    def expand(code: Int): Int = {
      var c = code
      var sp = 0
      while (c >= clear) { // composite code
        if (sp >= 4096 || c >= dictSize) return -1
        stack(sp) = append(c); sp += 1
        c = prefix(c)
      }
      val first = c
      if (outLen < nExpected) { out(outLen) = c.toByte; outLen += 1 }
      while (sp > 0) {
        sp -= 1
        if (outLen < nExpected) { out(outLen) = stack(sp); outLen += 1 }
      }
      first
    }

    def firstByteOf(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    def addEntry(pfx: Int, app: Int): Unit =
      if (dictSize < 4096) {
        prefix(dictSize) = pfx; append(dictSize) = app.toByte
        dictSize += 1
        if (dictSize == (1 << width) && width < 12) width += 1
      }

    var done = false
    while (!done) {
      val code = readCode()
      if (code < 0) return None // truncated stream before EOI
      if (code == eoi) done = true
      else if (code == clear) {
        dictSize = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (prev < 0) {
        if (code >= clear) return None // first code after clear must be a root
        if (expand(code) < 0) return None
        prev = code
      } else if (code < dictSize) {
        val first = expand(code)
        if (first < 0) return None
        addEntry(prev, first)
        prev = code
      } else if (code == dictSize) { // KwKwK: entry is prev + first(prev)
        addEntry(prev, firstByteOf(prev))
        if (expand(code) < 0) return None
        prev = code
      } else return None
      if (outLen >= nExpected && !done) {
        // all pixels produced; tolerate missing EOI (seen in the wild)
        done = true
      }
    }
    if (outLen == nExpected) Some(out) else None
  }

  // ---- encoder side (fixture staging; also a valid minimal GIF
  // writer). The LZW stream emits only root codes, mirroring the
  // decoder's dictionary-width bookkeeping exactly and clearing before
  // the table can overflow — the classic "uncompressed GIF" form every
  // conformant decoder accepts. ----

  private[graft] def lzwEncodeRoots(indices: Array[Byte],
      minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val bits = new java.io.ByteArrayOutputStream()
    var cur = 0
    var nCur = 0
    var width = minCode + 1
    def emit(code: Int): Unit = {
      cur |= code << nCur
      nCur += width
      while (nCur >= 8) {
        bits.write(cur & 0xff)
        cur >>= 8
        nCur -= 8
      }
    }
    var dictSize = eoi + 1
    var first = true
    emit(clear)
    var i = 0
    while (i < indices.length) {
      emit(indices(i) & 0xff)
      // mirror the decoder: every code after the first since a clear
      // grows the dictionary (and possibly the code width)
      if (!first) {
        dictSize += 1
        if (dictSize == (1 << width) && width < 12) width += 1
      }
      first = false
      if (dictSize >= 4094) {
        emit(clear)
        dictSize = eoi + 1
        width = minCode + 1
        first = true
      }
      i += 1
    }
    emit(eoi)
    if (nCur > 0) bits.write(cur & 0xff)
    bits.toByteArray
  }

  /** Assemble a complete single-frame GIF89a: header, screen
    * descriptor, global color table, a graphic-control extension (so
    * decode exercises extension skipping), image descriptor, LZW data
    * in ≤255-byte sub-blocks, trailer. `palette` entries are 0xRRGGBB;
    * its length must be a power of two in [2, 256]. */
  def gifBytes(w: Int, h: Int, palette: Array[Int],
      indices: Array[Byte]): Array[Byte] = {
    val n = palette.length
    require(n >= 2 && n <= 256 && (n & (n - 1)) == 0,
      s"palette size must be a power of 2 in [2,256], got $n")
    require(indices.length == w * h, "one index per pixel")
    val gctBits = Integer.numberOfTrailingZeros(n) - 1 // size field
    val minCode = math.max(2, Integer.numberOfTrailingZeros(n))
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0x80 | gctBits); out.write(0); out.write(0)
    palette.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    // graphic control extension (fixed benign payload)
    out.write(0x21); out.write(0xf9); out.write(4)
    out.write(0); le16(0); out.write(0); out.write(0)
    // image descriptor
    out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0)
    out.write(minCode)
    val lzw = lzwEncodeRoots(indices, minCode)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len)
      out.write(lzw, off, len)
      off += len
    }
    out.write(0)    // sub-block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Assemble an animated (multi-frame) GIF89a: every frame is
    * full-screen at (0,0) with a GCE (delay) before it; a frame with
    * `Some(palette)` writes a LOCAL color table, `None` uses the
    * global one. Frames must all be w×h index arrays. */
  def gifAnimBytes(w: Int, h: Int, globalPalette: Array[Int],
      frames: Seq[(Array[Byte], Option[Array[Int]])]): Array[Byte] = {
    val n = globalPalette.length
    require(n >= 2 && n <= 256 && (n & (n - 1)) == 0,
      s"global palette size must be a power of 2 in [2,256], got $n")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0x80 | (Integer.numberOfTrailingZeros(n) - 1))
    out.write(0); out.write(0)
    globalPalette.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    frames.foreach { case (indices, local) =>
      require(indices.length == w * h, "one index per pixel per frame")
      // graphic control extension with a 10cs delay
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); le16(10); out.write(0); out.write(0)
      out.write(0x2c); le16(0); le16(0); le16(w); le16(h)
      local match {
        case Some(p) =>
          require(p.length >= 2 && p.length <= 256 &&
            (p.length & (p.length - 1)) == 0, "local palette power of 2")
          out.write(0x80 | (Integer.numberOfTrailingZeros(p.length) - 1))
          p.foreach { c =>
            out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff)
            out.write(c & 0xff)
          }
        case None => out.write(0)
      }
      val pal = local.getOrElse(globalPalette)
      val minCode = math.max(2, Integer.numberOfTrailingZeros(pal.length))
      out.write(minCode)
      val lzw = lzwEncodeRoots(indices, minCode)
      var off = 0
      while (off < lzw.length) {
        val len = math.min(255, lzw.length - off)
        out.write(len)
        out.write(lzw, off, len)
        off += len
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  final case class FrameFeatures(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, sum_index: Long, sum_luma: Long, local_palette: Boolean)

  /** One row per decoded animation frame — the GIF analog of the MP4
    * frame extraction (q114): frame sampling feeds the same
    * image-level dedup/stats machinery regardless of container.
    * `sum_luma` uses integer ITU-R BT.601 weights (77R+150G+29B)>>8
    * per pixel, exactly replayable. Undecodable payloads drop. */
  def gifFrames(media: Dataset[Multimodal.MediaRecord],
      maxFrames: Int = 64): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeFrames(r.data, maxFrames).toSeq.flatMap { case (_, _, frames) =>
          frames.map { f =>
            var si = 0L; var sl = 0L
            var i = 0
            while (i < f.indices.length) {
              val idx = f.indices(i) & 0xff
              val c = f.palette(idx)
              si += idx
              sl += (77 * ((c >> 16) & 0xff) + 150 * ((c >> 8) & 0xff) +
                29 * (c & 0xff)) >> 8
              i += 1
            }
            FrameFeatures(r.doc_id, f.index, f.width, f.height, si, sl,
              f.localPalette)
          }
        }
      }
    }
  }

  /** Pixel-level features per decoded GIF record; undecodable payloads
    * drop (quarantine semantics, as with the PNG/JPEG paths). */
  def gifFeatures(media: Dataset[Multimodal.MediaRecord])
      : Dataset[GifFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decode(r.data).map { g =>
          var si = 0L; var sr = 0L; var sg = 0L; var sb = 0L
          var i = 0
          while (i < g.indices.length) {
            val idx = g.indices(i) & 0xff
            val c = g.palette(idx)
            si += idx
            sr += (c >> 16) & 0xff
            sg += (c >> 8) & 0xff
            sb += c & 0xff
            i += 1
          }
          GifFeatures(r.doc_id, g.width, g.height, g.indices.length.toLong,
            si, sr, sg, sb, g.palette.length)
        }
      }
    }
  }
}
