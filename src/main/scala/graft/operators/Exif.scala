package graft.operators

/** JPEG EXIF metadata: real APP1/TIFF parsing and a privacy scrub —
  * the JPEG counterpart of the PNG ancillary-chunk scrub
  * ([[Multimodal.pngScrubMetadata]]). Crawled JPEGs carry camera
  * serials, author strings, timestamps and GPS coordinates in APP1
  * (EXIF) / APPn / COM segments; a training corpus must be able to
  * (a) EXTRACT those fields for auditing (how many images are
  * geotagged?) and (b) STRIP them without re-encoding (pixels and
  * entropy data byte-identical, no generation loss).
  *
  * Everything here is public spec: JPEG segment framing per ITU-T
  * T.81 §B, the EXIF APP1 layout and TIFF 6.0 IFD structure per
  * JEITA CP-3451 (byte order II/MM, 12-byte tagged entries,
  * inline-when-≤4-bytes value rule). Both byte orders are parsed;
  * all offsets are bounds-checked so hostile crawl bytes degrade to
  * None, never throw. Scope: IFD0 Make (0x010F) / Model (0x0110) /
  * Orientation (0x0112) and the GPS IFD pointer (0x8825) — the
  * fields privacy audits actually key on; unknown tags are skipped
  * by the fixed 12-byte entry stride.
  */
object Exif {

  private val SOI = 0xFFD8

  private def be2(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** Serialize a minimal conformant EXIF APP1 segment (test-fixture
    * builder, like [[Multimodal.pngInjectMetadata]]): TIFF header in
    * the chosen byte order, IFD0 with Make/Model (ASCII — inline when
    * the NUL-terminated value fits 4 bytes, else in the external data
    * area padded to even length per TIFF convention), Orientation
    * (SHORT), and optionally a GPS IFD holding one GPSLatitudeRef
    * entry. Returns the full segment including the FFE1 marker and
    * length field. */
  def exifSegment(make: String, model: String, orientation: Int,
      gps: Boolean, littleEndian: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w2(v: Int): Unit =
      if (littleEndian) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w4(v: Int): Unit =
      if (littleEndian) { w2(v & 0xffff); w2((v >> 16) & 0xffff) }
      else { w2((v >> 16) & 0xffff); w2(v & 0xffff) }
    val makeB = make.getBytes("US-ASCII") :+ 0.toByte
    val modelB = model.getBytes("US-ASCII") :+ 0.toByte
    def padded(b: Array[Byte]): Array[Byte] =
      if (b.length % 2 == 1) b :+ 0.toByte else b
    val n = if (gps) 4 else 3
    val ifd0Size = 2 + n * 12 + 4
    val gpsSize = if (gps) 2 + 12 + 4 else 0
    val dataOff = 8 + ifd0Size + gpsSize
    val ext = new java.io.ByteArrayOutputStream()
    // entry value field: inline when the byte count fits 4 (zero-padded),
    // else a 4-byte offset into the data area appended after the IFDs
    def asciiEntry(tag: Int, v: Array[Byte]): Unit = {
      w2(tag); w2(2); w4(v.length)
      if (v.length <= 4) {
        out.write(v, 0, v.length)
        var i = v.length; while (i < 4) { out.write(0); i += 1 }
      } else {
        w4(dataOff + ext.size())
        val p = padded(v); ext.write(p, 0, p.length)
      }
    }
    out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0)
    val tiffStart = out.size()
    if (littleEndian) { out.write('I'); out.write('I') }
    else { out.write('M'); out.write('M') }
    w2(42); w4(8)
    // IFD0 — entries in ascending tag order as TIFF requires
    w2(n)
    asciiEntry(0x010F, makeB)
    asciiEntry(0x0110, modelB)
    w2(0x0112); w2(3); w4(1)
    // SHORT value is left-justified: the first two bytes of the field
    w2(orientation); w2(0)
    if (gps) { w2(0x8825); w2(4); w4(1); w4(8 + ifd0Size) }
    w4(0) // next-IFD pointer
    if (gps) {
      w2(1)
      w2(0x0001); w2(2); w4(2) // GPSLatitudeRef, ASCII "N\0" inline
      out.write('N'); out.write(0); out.write(0); out.write(0)
      w4(0)
    }
    require(out.size() - tiffStart == dataOff,
      s"layout drift: ${out.size() - tiffStart} != $dataOff")
    out.write(ext.toByteArray)
    val payload = out.toByteArray
    // the 2-byte segment length caps a JPEG marker segment at 65535;
    // oversized Make/Model strings would silently WRAP the length
    // field and emit a corrupt APP1 — refuse loudly instead
    require(payload.length + 2 <= 0xFFFF,
      s"EXIF payload ${payload.length} bytes overflows the APP1 " +
        "2-byte length field")
    Array(0xFF.toByte, 0xE1.toByte) ++ be2(payload.length + 2) ++ payload
  }

  /** Insert a pre-serialized APP1 segment immediately after SOI. */
  def jpegInjectExif(jpeg: Array[Byte], segment: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 &&
      ((jpeg(0) & 0xff) << 8 | (jpeg(1) & 0xff)) == SOI, "not a JPEG")
    jpeg.take(2) ++ segment ++ jpeg.drop(2)
  }

  /** Parse the EXIF APP1 segment of a JPEG. Returns
    * (make, model, orientation, hasGps) with empty-string / 0 /
    * false for absent fields, or None when no well-formed EXIF APP1
    * exists (including malformed TIFF structures — quarantine, never
    * a partial read). */
  def jpegExif(data: Array[Byte]): Option[(String, String, Int, Boolean)] =
    try {
      var pos = 2
      if (data.length < 4 ||
        ((data(0) & 0xff) << 8 | (data(1) & 0xff)) != SOI) return None
      while (pos + 4 <= data.length) {
        if ((data(pos) & 0xff) != 0xFF) return None
        var marker = data(pos + 1) & 0xff
        var mPos = pos + 1
        while (marker == 0xFF && mPos + 1 < data.length) { // fill bytes
          mPos += 1; marker = data(mPos) & 0xff
        }
        if (marker == 0xDA || marker == 0xD9) return None // into entropy data
        if ((marker >= 0xD0 && marker <= 0xD7) || marker == 0x01) {
          pos = mPos + 1
        } else {
          if (mPos + 3 >= data.length) return None
          val len = ((data(mPos + 1) & 0xff) << 8) | (data(mPos + 2) & 0xff)
          if (len < 2 || mPos + 1 + len > data.length) return None
          if (marker == 0xE1 && len >= 8 &&
            data(mPos + 3) == 'E' && data(mPos + 4) == 'x' &&
            data(mPos + 5) == 'i' && data(mPos + 6) == 'f' &&
            data(mPos + 7) == 0 && data(mPos + 8) == 0) {
            return parseTiff(data, mPos + 9, len - 8)
          }
          pos = mPos + 1 + len
        }
      }
      None
    } catch { case _: Exception => None }

  /** TIFF 6.0 IFD0 walk at `data(off, off+len)`. */
  private def parseTiff(data: Array[Byte], off: Int,
      len: Int): Option[(String, String, Int, Boolean)] = {
    if (len < 8) return None
    val le = (data(off) & 0xff, data(off + 1) & 0xff) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => return None
    }
    def u16(i: Int): Int = {
      if (i < off || i + 2 > off + len) throw new IndexOutOfBoundsException
      val a = data(i) & 0xff; val b = data(i + 1) & 0xff
      if (le) (b << 8) | a else (a << 8) | b
    }
    def u32(i: Int): Long = {
      val a = u16(i).toLong; val b = u16(i + 2).toLong
      if (le) (b << 16) | a else (a << 16) | b
    }
    if (u16(off + 2) != 42) return None
    val ifd0 = u32(off + 4)
    if (ifd0 < 8 || ifd0 + 2 > len) return None
    val base = off + ifd0.toInt
    val n = u16(base)
    var make = ""; var model = ""; var orientation = 0; var hasGps = false
    var i = 0
    while (i < n) {
      val e = base + 2 + i * 12
      if (e + 12 > off + len) return None
      val tag = u16(e); val typ = u16(e + 2); val count = u32(e + 4)
      def ascii(): Option[String] = {
        if (typ != 2 || count <= 0 || count > 65536) return None
        val c = count.toInt
        val vOff = if (c <= 4) e + 8 else off + u32(e + 8).toInt
        if (vOff < off || vOff + c > off + len) return None
        val raw = new String(data, vOff, c, "US-ASCII")
        Some(raw.takeWhile(_ != 0.toChar))
      }
      tag match {
        case 0x010F => make = ascii().getOrElse(return None)
        case 0x0110 => model = ascii().getOrElse(return None)
        case 0x0112 =>
          if (typ != 3 || count != 1) return None
          orientation = u16(e + 8)
        case 0x8825 =>
          if (typ != 4 || count != 1) return None
          val g = u32(e + 8)
          // a GPS IFD must at least hold its entry count
          if (g < 8 || g + 2 > len) return None
          hasGps = true
        case _ => () // unknown tags skipped by the 12-byte stride
      }
      i += 1
    }
    Some((make, model, orientation, hasGps))
  }

  /** PRIVACY SCRUB: drop the APP1/APP3–APP13/APP15 and COM segments
    * from a JPEG — the EXIF/XMP/comment channels that carry camera
    * serials, GPS fixes, author names and editor fingerprints.
    * DECODE-AFFECTING application segments are preserved: APP14
    * (Adobe color-transform flag — removing it changes how decoders
    * interpret YCCK/CMYK components, breaking pixel identity) and
    * APP2 (ICC profile — color-managed viewers would render shifted
    * colors without it; it carries no PII channel). APP0/JFIF and all
    * structural segments (DQT/DHT/SOF/SOS/…) are byte-copied;
    * everything from SOS on (the entropy-coded image data, including
    * embedded RST markers) is copied verbatim — no re-encode, decoded
    * pixels identical by construction for ALL variants, including
    * Adobe-encoded YCCK/CMYK. Returns
    * (scrubbed bytes, segments seen before SOS, segments removed,
    * bytes removed); None for malformed input (quarantine, never
    * mis-scrub — the q149 contract). */
  def jpegScrubMetadata(data: Array[Byte])
      : Option[(Array[Byte], Int, Int, Long)] =
    try {
      if (data.length < 4 ||
        ((data(0) & 0xff) << 8 | (data(1) & 0xff)) != SOI) return None
      val out = new java.io.ByteArrayOutputStream()
      out.write(data, 0, 2)
      var pos = 2
      var total = 0
      var removed = 0
      var removedBytes = 0L
      while (pos + 2 <= data.length) {
        if ((data(pos) & 0xff) != 0xFF) return None
        val marker = data(pos + 1) & 0xff
        if (marker == 0xDA) { // SOS: entropy data follows, copy verbatim
          out.write(data, pos, data.length - pos)
          return Some((out.toByteArray, total, removed, removedBytes))
        }
        if ((marker >= 0xD0 && marker <= 0xD7) || marker == 0x01 ||
          marker == 0xD9) {
          total += 1
          out.write(data, pos, 2)
          pos += 2
        } else {
          if (pos + 4 > data.length) return None
          val len = ((data(pos + 2) & 0xff) << 8) | (data(pos + 3) & 0xff)
          if (len < 2 || pos + 2 + len > data.length) return None
          total += 1
          // keep APP2 (0xE2, ICC) + APP14 (0xEE, Adobe transform) —
          // both feed the decode path, neither is a PII channel
          val drop = ((marker >= 0xE1 && marker <= 0xEF) ||
            marker == 0xFE) && marker != 0xE2 && marker != 0xEE
          if (drop) { removed += 1; removedBytes += 2L + len }
          else out.write(data, pos, 2 + len)
          pos += 2 + len
        }
      }
      None // never reached SOS/EOI — truncated stream
    } catch { case _: Exception => None }
}
