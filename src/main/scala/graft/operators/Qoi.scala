package graft.operators

import java.io.ByteArrayOutputStream

/** QOI ("Quite OK Image") codec — encoder + decoder implemented from
  * the one-page public specification (qoiformat.org, CC0): 14-byte
  * header (`qoif`, u32be width/height, channels, colorspace), then a
  * byte-oriented op stream over RGBA pixels with a running 64-entry
  * seen-colors index (hash r·3+g·5+b·7+a·11 mod 64), two-level
  * delta ops (DIFF: per-channel −2..1; LUMA: dg −32..31 with dr−dg /
  * db−dg in −8..7), run-length up to 62, and literal RGB/RGBA
  * fallbacks; 7×0x00 + 0x01 end marker.
  *
  * Why it's in the multimodal tier: QOI is the storage format a
  * training-data pipeline actually uses for intermediate lossless
  * image shards (PNG-class compression at memcpy-class speed, no
  * entropy coder), and unlike the DCT/deflate codecs the round-trip
  * is bit-exact on EVERY input — so the q227 oracle can replay the
  * pixel generator arithmetically with zero codec-specific slack.
  *
  * Both directions are straight-line byte loops (no allocation per
  * pixel beyond the fixed index table) and run inside narrow
  * mapPartitions in queries — encoded bytes never shuffle.
  * Conformance: QoiSpec pins hand-assembled spec vectors (each op
  * byte written out from the spec text) and round-trips adversarial
  * fuzz including index collisions, alpha edges, and 62+ runs.
  */
object Qoi {

  private val OpIndex = 0x00 // 00xxxxxx
  private val OpDiff  = 0x40 // 01xxxxxx
  private val OpLuma  = 0x80 // 10xxxxxx
  private val OpRun   = 0xc0 // 11xxxxxx
  private val OpRgb   = 0xfe
  private val OpRgba  = 0xff

  @inline private def hash(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) % 64

  /** Encode w·h RGBA pixels (4 bytes each, unsigned) to QOI bytes. */
  def encode(w: Int, h: Int, rgba: Array[Byte]): Array[Byte] = {
    require(rgba.length == w * h * 4, s"need ${w * h * 4} bytes")
    val out = new ByteArrayOutputStream(14 + w * h + 8)
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be32(w); be32(h)
    out.write(4) // channels: the engine always carries RGBA
    out.write(0) // colorspace: sRGB with linear alpha
    val index = new Array[Int](64) // packed 0xRRGGBBAA, zero-init per spec
    var pr = 0; var pg = 0; var pb = 0; var pa = 255
    var run = 0
    var i = 0
    val n = w * h
    while (i < n) {
      val r = rgba(i * 4) & 0xff; val g = rgba(i * 4 + 1) & 0xff
      val b = rgba(i * 4 + 2) & 0xff; val a = rgba(i * 4 + 3) & 0xff
      if (r == pr && g == pg && b == pb && a == pa) {
        run += 1
        if (run == 62) { out.write(OpRun | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(OpRun | (run - 1)); run = 0 }
        val packed = (r << 24) | (g << 16) | (b << 8) | a
        val hx = hash(r, g, b, a)
        if (index(hx) == packed) out.write(OpIndex | hx)
        else {
          index(hx) = packed
          if (a == pa) {
            // wrapping channel deltas (spec: differences wrap mod 256)
            val dr = ((r - pr + 128) & 0xff) - 128
            val dg = ((g - pg + 128) & 0xff) - 128
            val db = ((b - pb + 128) & 0xff) - 128
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 &&
                db >= -2 && db <= 1)
              out.write(OpDiff | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            else {
              val drg = ((dr - dg + 128) & 0xff) - 128
              val dbg = ((db - dg + 128) & 0xff) - 128
              if (dg >= -32 && dg <= 31 && drg >= -8 && drg <= 7 &&
                  dbg >= -8 && dbg <= 7) {
                out.write(OpLuma | (dg + 32))
                out.write(((drg + 8) << 4) | (dbg + 8))
              } else {
                out.write(OpRgb); out.write(r); out.write(g); out.write(b)
              }
            }
          } else {
            out.write(OpRgba)
            out.write(r); out.write(g); out.write(b); out.write(a)
          }
        }
        pr = r; pg = g; pb = b; pa = a
      }
      i += 1
    }
    if (run > 0) out.write(OpRun | (run - 1))
    var z = 0
    while (z < 7) { out.write(0); z += 1 }
    out.write(1)
    out.toByteArray
  }

  /** Decoded image: dimensions + flat RGBA samples. */
  final case class Image(w: Int, h: Int, rgba: Array[Byte])

  /** Decode QOI bytes; throws IllegalArgumentException on bad magic,
    * truncation, or a missing end marker. */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 22, "truncated QOI (below header+marker)")
    require(bytes(0) == 'q' && bytes(1) == 'o' && bytes(2) == 'i' &&
      bytes(3) == 'f', "bad QOI magic")
    def be32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    val w = be32(4); val h = be32(8)
    require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue / 4,
      s"bad dimensions ${w}x$h")
    val n = w * h
    val out = new Array[Byte](n * 4)
    val index = new Array[Int](64)
    var r = 0; var g = 0; var b = 0; var a = 255
    var p = 14
    var px = 0
    val dataEnd = bytes.length - 8 // the 8-byte end marker
    // operand reads must not consume end-marker bytes: a truncated
    // stream fails loudly here, never with an array bounds throw
    def needOperands(k: Int, px: Int): Unit =
      require(p + k <= dataEnd, s"truncated op stream at pixel $px")
    while (px < n) {
      require(p < dataEnd, s"truncated op stream at pixel $px")
      val b0 = bytes(p) & 0xff; p += 1
      // emit: 1 for every op except RUN, which carries its own count
      var emit = 1
      if (b0 == OpRgb) {
        needOperands(3, px)
        r = bytes(p) & 0xff; g = bytes(p + 1) & 0xff
        b = bytes(p + 2) & 0xff; p += 3
      } else if (b0 == OpRgba) {
        needOperands(4, px)
        r = bytes(p) & 0xff; g = bytes(p + 1) & 0xff
        b = bytes(p + 2) & 0xff; a = bytes(p + 3) & 0xff; p += 4
      } else (b0 & 0xc0) match {
        case OpIndex =>
          val v = index(b0 & 0x3f)
          r = (v >>> 24) & 0xff; g = (v >>> 16) & 0xff
          b = (v >>> 8) & 0xff; a = v & 0xff
        case OpDiff =>
          r = (r + ((b0 >> 4) & 0x03) - 2) & 0xff
          g = (g + ((b0 >> 2) & 0x03) - 2) & 0xff
          b = (b + (b0 & 0x03) - 2) & 0xff
        case OpLuma =>
          val dg = (b0 & 0x3f) - 32
          needOperands(1, px)
          val b1 = bytes(p) & 0xff; p += 1
          r = (r + dg + ((b1 >> 4) & 0x0f) - 8) & 0xff
          g = (g + dg) & 0xff
          b = (b + dg + (b1 & 0x0f) - 8) & 0xff
        case OpRun =>
          emit = (b0 & 0x3f) + 1 // stored as run-1, range 1..62
      }
      // spec decoder (reference qoi.h) indexes EVERY decoded pixel,
      // including RUN and INDEX ops — a conformant foreign encoder may
      // run the initial (0,0,0,255) and later reference it via
      // OP_INDEX; skipping the write here decoded that wrong (r12
      // advice). Idempotent for INDEX/self-encoded streams.
      index(hash(r, g, b, a)) = (r << 24) | (g << 16) | (b << 8) | a
      require(px + emit <= n, "op stream overruns pixel count")
      while (emit > 0) {
        out(px * 4) = r.toByte; out(px * 4 + 1) = g.toByte
        out(px * 4 + 2) = b.toByte; out(px * 4 + 3) = a.toByte
        px += 1; emit -= 1
      }
    }
    require(bytes.length >= p + 8, "missing end marker")
    var z = 0
    while (z < 7) {
      require(bytes(p + z) == 0, "bad end marker"); z += 1
    }
    require(bytes(p + 7) == 1, "bad end marker terminator")
    Image(w, h, out)
  }
}
