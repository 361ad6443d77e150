package graft.operators

/** Standalone TIFF metadata: the classic scanned-document format of
  * the web's archival corners, parsed by the same public TIFF 6.0
  * IFD structure the EXIF tier walks inside JPEG ([[Exif]]) — here
  * the TIFF header sits at byte 0. Scope: ImageWidth (256) /
  * ImageLength (257) / BitsPerSample (258) / SamplesPerPixel (277),
  * both byte orders, SHORT and LONG value types for the dimension
  * tags (both are legal per spec and both occur in the wild). All
  * offsets bounds-checked; hostile bytes → None. */
object Tiff {

  /** Parse (width, height, bitsPerSample, samplesPerPixel,
    * littleEndian). BitsPerSample with count 2 (4 bytes) is read
    * INLINE from the value field per TIFF 6.0 §2; count > 2 reads the
    * FIRST sample's value from the external array (uniform-depth
    * images — the overwhelmingly common case; mixed depths
    * quarantine). */
  def parse(data: Array[Byte]): Option[(Int, Int, Int, Int, Boolean)] =
    try {
      if (data.length < 8) return None
      val le = (data(0), data(1)) match {
        case ('I', 'I') => true
        case ('M', 'M') => false
        case _ => return None
      }
      def u16(i: Int): Int = {
        if (i < 0 || i + 2 > data.length) throw new IndexOutOfBoundsException
        val a = data(i) & 0xff; val b = data(i + 1) & 0xff
        if (le) (b << 8) | a else (a << 8) | b
      }
      def u32(i: Int): Long = {
        val a = u16(i).toLong; val b = u16(i + 2).toLong
        if (le) (b << 16) | a else (a << 16) | b
      }
      if (u16(2) != 42) return None
      val ifd0 = u32(4)
      if (ifd0 < 8 || ifd0 + 2 > data.length) return None
      val base = ifd0.toInt
      val n = u16(base)
      var w = -1; var h = -1; var bps = 1; var spp = 1
      var i = 0
      while (i < n) {
        val e = base + 2 + i * 12
        if (e + 12 > data.length) return None
        val tag = u16(e); val typ = u16(e + 2); val count = u32(e + 4)
        // SHORT (3) sits in the first 2 value bytes; LONG (4) in all 4
        def scalar(): Long =
          if (typ == 3) u16(e + 8).toLong
          else if (typ == 4) u32(e + 8)
          else -1L
        tag match {
          case 256 => w = scalar().toInt
          case 257 => h = scalar().toInt
          case 258 =>
            if (count == 1) bps = scalar().toInt
            else if (typ == 3 && count == 2) {
              // TIFF 6.0 §2: a value whose total size fits the 4-byte
              // value field is stored INLINE — a SHORT array of count 2
              // (gray+alpha, spp = 2) is 4 bytes, so the value field
              // holds the two shorts, not an offset; reading it as an
              // offset misparses every spp=2 image in the wild
              val a = u16(e + 8); val b = u16(e + 10)
              if (a != b) return None // mixed depths quarantine
              bps = a
            } else {
              // > 4 bytes: external SHORT array behind an offset; read
              // the first entry, require uniform depth across samples
              val off = u32(e + 8).toInt
              if (off < 0 || off + 2 * count.toInt > data.length) return None
              val first = u16(off)
              var j = 1
              while (j < count.toInt) {
                if (u16(off + 2 * j) != first) return None
                j += 1
              }
              bps = first
            }
          case 277 => spp = scalar().toInt
          case _ => ()
        }
        i += 1
      }
      if (w <= 0 || h <= 0 || bps <= 0 || spp <= 0) None
      else Some((w, h, bps, spp, le))
    } catch { case _: Exception => None }

  /** Fixture builder: minimal conformant single-IFD TIFF. Dimension
    * tags written as LONG when `longDims`, SHORT otherwise;
    * BitsPerSample inline for spp ≤ 2 (fits the value field), external
    * array for spp > 2. */
  def encode(w: Int, h: Int, bps: Int, spp: Int,
      littleEndian: Boolean, longDims: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (littleEndian) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (littleEndian) { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
      else { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
    if (littleEndian) { out.write('I'); out.write('I') }
    else { out.write('M'); out.write('M') }
    w16(42); w32(8)
    val n = 4
    val ifdSize = 2 + n * 12 + 4
    val extOff = 8 + ifdSize
    w16(n)
    def dimEntry(tag: Int, v: Int): Unit = {
      w16(tag)
      if (longDims) { w16(4); w32(1); w32(v.toLong) }
      else { w16(3); w32(1); w16(v); w16(0) }
    }
    dimEntry(256, w)
    dimEntry(257, h)
    // BitsPerSample: inline while the SHORT array fits the 4-byte
    // value field (count ≤ 2, per TIFF 6.0 §2 — spp=2 gray+alpha is
    // stored inline in the wild), external array beyond that
    w16(258); w16(3); w32(spp.toLong)
    if (spp == 1) { w16(bps); w16(0) }
    else if (spp == 2) { w16(bps); w16(bps) }
    else w32(extOff.toLong)
    w16(277); w16(3); w32(1); w16(spp); w16(0)
    w32(0) // next IFD
    if (spp > 2) (0 until spp).foreach(_ => w16(bps))
    out.toByteArray
  }
}
