package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed by per-partition batch workers.
  *
  * Decode here is REAL for every format with a tractable public spec,
  * all implemented in-repo with zero codec libraries: PNG (zlib +
  * filters), baseline AND progressive JPEG (Huffman + IDCT), GIF
  * (LZW, animation, local palettes), BMP, MP4 sample-table demux,
  * PCM/G.711 audio — `decodeBrightness` feeds actually-decoded pixels
  * from all four image codecs into one brightness surface, and
  * `parseImageHeader` reads actual PNG IHDR chunks and JPEG SOF
  * segments from real containers built by `encodeImageContainers`.
  * Formats whose entropy tier is impractical in-repo (H.264, lossy
  * VP8…) quarantine to clearly-marked byte-level stand-ins
  * (`frameSampleStub`'s stride checksums, `byteBandHash`'s sampled
  * bytes, the byte-sum branch of `decodeBrightness`). Everything
  * Spark-cares-about is identical in both tiers: the binary column
  * representation, the typed
  * metadata struct, the case-class Encoders, the mapPartitions batch
  * shape (one worker per partition, streaming iterator, no per-row
  * JVM↔lib churn), and the partitioning (narrow — media bytes never
  * shuffle; only extracted features move downstream).
  *
  * At 100 TB: media bytes live in parquet binary columns (or object
  * storage with a path column); feature extraction is a narrow
  * mapPartitions; all joins/aggregations happen on the small feature
  * output. This is the standard large-scale media-pipeline shape.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(width: Int, height: Int, codec: String, nFrames: Int)

  final case class MediaRecord(doc_id: Long, media_type: String,
      data: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
      brightness: Long, width: Int, height: Int, n_frames: Int)

  final case class Frame(doc_id: Long, frame_idx: Int, frame_off: Long,
      frame_checksum: Long)

  /** Synthesize a media table from `documents`: the UTF-8 bytes of the
    * text stand in for an encoded image/video payload; metadata is
    * derived deterministically so the oracle can recompute it.
    */
  def ingest(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    // balance the 1-row-group dev scan so every decode/feature worker
    // downstream (mapPartitions preserves partitioning) is parallel;
    // project FIRST so the exchange moves only the three columns the
    // fixture reads, never the full document row (guide §2.3 project
    // before the exchange)
    graft.QueryUtil.balanced(documents.select("doc_id", "text", "n_chars")).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, lit("video")).otherwise(lit("image"))
        .as("media_type"),
      encode(col("text"), "UTF-8").as("data"),
      struct(
        (col("n_chars") % 640 + 64).cast("int").as("width"),
        (col("n_chars") % 480 + 48).cast("int").as("height"),
        when(col("doc_id") % 3 === 0, lit("h264")).otherwise(lit("png"))
          .as("codec"),
        (floor(col("n_chars") / 100) + 1).cast("int").as("nFrames")).as("meta")
    ).as[MediaRecord]
  }

  /** Decode + feature extraction. For PNG and baseline-JPEG payloads
    * the brightness is REAL — the mean over actually-decoded samples
    * via [[pngDecodePixels]] / [[jpegDecodePixels]] (zlib inflate +
    * defilter, resp. Huffman + IDCT; no external codec needed). For
    * every other payload the codec libraries are absent in this
    * container, so the deterministic byte-sum stand-in remains (sum of
    * the first 16 bytes mod 256), clearly separable by whether the
    * payload decodes. Batch shape is the production one either way:
    * per-partition worker, streaming iterator, bytes never shuffle.
    */
  def decodeBrightness(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would open non-PNG codecs once here, not per row
      it.map { r =>
        val brightness = pngDecodePixels(r.data)
          .orElse(jpegDecodePixels(r.data))
          .orElse(Gif.decode(r.data).map { g =>
            // palette GIF → grayscale view via integer BT.601 luma
            val px = new Array[Byte](g.indices.length)
            var i = 0
            while (i < px.length) {
              val c = g.palette(g.indices(i) & 0xff)
              px(i) = ((77 * ((c >> 16) & 0xff) + 150 * ((c >> 8) & 0xff) +
                29 * (c & 0xff)) >> 8).toByte
              i += 1
            }
            (g.width, g.height, 1, px)
          })
          .orElse(Bmp.decode(r.data).map(b =>
            (b.width, b.height, 3, b.rgb))) match {
          case Some((_, _, _, px)) =>
            var s = 0L; var i = 0
            while (i < px.length) { s += px(i) & 0xff; i += 1 }
            s / px.length
          case None =>
            r.data.take(16).foldLeft(0L)((acc, b) => acc + (b & 0xff)) % 256
        }
        MediaFeatures(r.doc_id, r.data.length.toLong, brightness,
          r.meta.width, r.meta.height, r.meta.nFrames)
      }
    }
  }

  /** STUB frame sampler: emits meta.nFrames frames per video row at a
    * fixed 64-byte stride, checksumming the real byte at each offset.
    * Kept for payloads with no parseable container (and q39's oracle);
    * the REAL path is [[frameExtract]], which demuxes actual MP4
    * sample tables into frame bytes. flatMap keeps it narrow — one
    * input row explodes into ≤ nFrames output rows on the same
    * partition.
    */
  def frameSampleStub(media: Dataset[MediaRecord]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").flatMap { r =>
      (0 until r.meta.nFrames).iterator.map { i =>
        val off = i.toLong * 64
        val checksum =
          if (off < r.data.length) (r.data(off.toInt) & 0xff).toLong else -1L
        Frame(r.doc_id, i, off, checksum)
      }
    }
  }

  // ---- Real image-container codec (public formats: PNG, ISO JPEG) ----
  //
  // The pixel-decode stubs above stand in for codec libraries the
  // container lacks; DIMENSION decoding needs no library at all — the
  // PNG IHDR chunk and the JPEG SOF segment are ~60 lines of public
  // byte format. encodeImageContainers wraps each payload in a REAL header
  // (PNG with a real CRC-32; JPEG with an APP0/JFIF segment the parser
  // must skip over), and parseImageHeader reads it back the way any
  // production header sniffer does: signature check + chunk/marker
  // scan. The mapPartitions batch shape is identical to decodeBrightness's.

  final case class ImageInfo(doc_id: Long, format: String, width: Int,
      height: Int, channels: Int, n_bytes: Long)

  private def be2(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
  private def be4(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  /** PNG signature + IHDR chunk (real CRC-32 over type+data), 33 bytes.
    * channels → color type: 1→grayscale(0), 2→gray+alpha(4), 3→RGB(2),
    * 4→RGBA(6). */
  def pngHeader(w: Int, h: Int, channels: Int): Array[Byte] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case _ => 6
    }
    val typ = "IHDR".getBytes("US-ASCII")
    val data = be4(w) ++ be4(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0)
    val crc = new java.util.zip.CRC32()
    crc.update(typ); crc.update(data)
    sig ++ be4(13) ++ typ ++ data ++ be4(crc.getValue.toInt)
  }

  /** JPEG SOI + APP0/JFIF + SOF0 (baseline), 33 bytes for 1 component /
    * 39 for 3 — the APP0 segment exists so the parser has to do a real
    * marker scan, not a fixed-offset read. */
  def jpegHeader(w: Int, h: Int, channels: Int): Array[Byte] = {
    val app0 = Array(0xFF.toByte, 0xE0.toByte) ++ be2(16) ++
      "JFIF\u0000".getBytes("US-ASCII") ++ Array[Byte](1, 1, 0) ++
      be2(1) ++ be2(1) ++ Array[Byte](0, 0)
    val comps = (1 to channels)
      .flatMap(c => Array(c.toByte, 0x11.toByte, 0.toByte)).toArray
    val sof = Array(0xFF.toByte, 0xC0.toByte) ++ be2(8 + 3 * channels) ++
      Array[Byte](8) ++ be2(h) ++ be2(w) ++ Array(channels.toByte) ++ comps
    Array(0xFF.toByte, 0xD8.toByte) ++ app0 ++ sof
  }

  /** Real image-header parse: (format, width, height, channels), or
    * None for anything that isn't a well-formed PNG/JPEG head.
    *
    * PNG: 8-byte signature, then the mandatory first chunk must be a
    * 13-byte IHDR; width/height big-endian, color type → channel count.
    * JPEG: SOI, then a standard marker scan (fill bytes and standalone
    * RST/TEM markers handled, variable-length segments skipped by their
    * declared length) to the first SOF0–SOF15 frame header (excluding
    * DHT/JPG/DAC which share the 0xC* range), whose payload carries
    * precision, height, width, component count. */
  def parseImageHeader(data: Array[Byte]): Option[(String, Int, Int, Int)] = {
    def u8(i: Int): Int = data(i) & 0xff
    def rd2(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def rd4(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (data.length >= 33 && (0 until 8).forall(i => u8(i) == pngSig(i))) {
      if (rd4(8) != 13 ||
          !data.slice(12, 16).sameElements("IHDR".getBytes("US-ASCII"))) None
      else {
        val w = rd4(16); val h = rd4(20)
        val ch = u8(25) match {
          case 0 | 3 => 1; case 2 => 3; case 4 => 2; case 6 => 4; case _ => -1
        }
        if (w > 0 && h > 0 && ch > 0) Some(("png", w, h, ch)) else None
      }
    } else if (data.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      def isSof(m: Int): Boolean =
        m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC
      var pos = 2
      var res: Option[(String, Int, Int, Int)] = None
      var done = false
      while (!done && res.isEmpty && pos + 1 < data.length) {
        if (u8(pos) != 0xFF) done = true
        else {
          val m = u8(pos + 1)
          if (m == 0xFF) pos += 1 // fill byte
          else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) pos += 2 // standalone
          else if (pos + 3 >= data.length) done = true
          else {
            val segLen = rd2(pos + 2)
            if (segLen < 2) done = true
            else if (isSof(m)) {
              if (segLen >= 8 && pos + 9 < data.length) {
                val h = rd2(pos + 5); val w = rd2(pos + 7); val ch = u8(pos + 9)
                if (w > 0 && h > 0 && ch > 0) res = Some(("jpeg", w, h, ch))
              }
              done = true
            } else pos += 2 + segLen
          }
        }
      }
      res
    } else None
  }

  /** Wrap each payload in a REAL image container: PNG for even doc_id,
    * JPEG for odd; dimensions from the record's meta; grayscale when
    * the width is even, RGB otherwise. The original payload follows the
    * header as the entropy-coded body would. Narrow per-partition pass;
    * the synthesized corpus is what [[decodeImage]]'s oracle-checked
    * parse runs against. */
  def encodeImageContainers(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val ch = if (r.meta.width % 2 == 0) 1 else 3
        val png = r.doc_id % 2 == 0
        val hdr = if (png) pngHeader(r.meta.width, r.meta.height, ch)
          else jpegHeader(r.meta.width, r.meta.height, ch)
        r.copy(media_type = "image", data = hdr ++ r.data,
          meta = r.meta.copy(codec = if (png) "png" else "jpeg"))
      }
    }
  }

  /** REAL dimension decode: parse each payload's PNG/JPEG header.
    * Unparseable payloads are dropped (a production pipeline would
    * route them to a quarantine sink). One narrow mapPartitions —
    * bytes never shuffle, only the tiny parsed features move on. */
  def decodeImage(media: Dataset[MediaRecord]): Dataset[ImageInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        parseImageHeader(r.data).map { case (fmt, w, h, ch) =>
          ImageInfo(r.doc_id, fmt, w, h, ch, r.data.length.toLong)
        }
      }
    }
  }

  // ---- Real PNG pixel codec (RFC 2083: zlib + per-row filters) ----
  //
  // The one image format whose PIXEL tier needs no external codec:
  // PNG's compression is zlib (java.util.zip.{Deflater,Inflater}) and
  // its per-scanline filters (none/sub/up/average/paeth) are ~40 lines
  // of public spec. With these, `decodeBrightness`'s "brightness" becomes a
  // REAL mean over decoded samples for PNG payloads — the media
  // feature tier is fully real end to end for one format. Scope: bit
  // depth 8, color types 0/2/4/6, no interlace (Adam7 is a scan-order
  // permutation, not more decoding — rejected, not mis-parsed); CRCs
  // are verified per chunk the way a production decoder must on
  // crawl-origin bytes.

  /** Paeth predictor (RFC 2083 §6.6): the neighbor closest to the
    * linear estimate a + b − c, ties broken left, up, upper-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def pngChunk(typ: String, content: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(content)
    be4(content.length) ++ t ++ content ++ be4(crc.getValue.toInt)
  }

  /** Encode raw 8-bit samples (row-major, `w*h*channels` bytes) as a
    * complete standards-conformant PNG. Each row is filtered with
    * `rowIndex % 5` — cycling through ALL five filter types so a
    * decoder's defilter path is genuinely exercised, not just
    * filter-0 passthrough. (javax.imageio reads the output; the spec
    * cross-checks exactly that.) */
  /** Filter `h` scanlines of `rowBytes = w·bpp` data, cycling the five
    * filter types by row, into the raw pre-compression stream. */
  private def filterScanlines(h: Int, rowBytes: Int, bpp: Int,
      data: Array[Byte]): Array[Byte] = {
    val raw = new Array[Byte](h * (rowBytes + 1))
    var r = 0
    while (r < h) {
      val ft = r % 5
      raw(r * (rowBytes + 1)) = ft.toByte
      var x = 0
      while (x < rowBytes) {
        val cur = data(r * rowBytes + x) & 0xff
        val a = if (x >= bpp) data(r * rowBytes + x - bpp) & 0xff else 0
        val b = if (r > 0) data((r - 1) * rowBytes + x) & 0xff else 0
        val c = if (r > 0 && x >= bpp) data((r - 1) * rowBytes + x - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(r * (rowBytes + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      r += 1
    }
    raw
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    out.toByteArray
  }

  def pngEncode(w: Int, h: Int, channels: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h * channels,
      s"pixels ${pixels.length} != $w*$h*$channels")
    val raw = filterScanlines(h, w * channels, channels, pixels)
    pngHeader(w, h, channels) ++ pngChunk("IDAT", deflate(raw)) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Palette (color type 3) PNG: `palette` is ≤ 256 RGB triples in a
    * PLTE chunk, `indices` one byte per pixel. Decodes back (via
    * [[pngDecodePixels]] or any conformant reader) to the RGB
    * expansion — the indexed layout web crawls are full of. */
  def pngEncodeIndexed(w: Int, h: Int, palette: Array[Byte],
      indices: Array[Byte]): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.nonEmpty && palette.length <= 768,
      s"palette ${palette.length} must be 3..768 bytes of RGB triples")
    require(indices.length == w * h, s"indices ${indices.length} != $w*$h")
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = be4(w) ++ be4(h) ++ Array[Byte](8, 3, 0, 0, 0)
    val raw = filterScanlines(h, w, 1, indices)
    sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("PLTE", palette) ++
      pngChunk("IDAT", deflate(raw)) ++ pngChunk("IEND", Array.emptyByteArray)
  }

  /** Insert serialized ancillary chunks immediately after IHDR (test
    * fixture builder for metadata-bearing PNGs: tEXt/tIME/eXIf/…).
    * Chunks are serialized with real CRCs so conformant readers accept
    * the result. */
  def pngInjectMetadata(png: Array[Byte],
      chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
    val ihdrEnd = 8 + 4 + 4 + 13 + 4 // signature + IHDR chunk
    require(png.length >= ihdrEnd, "not a PNG with an IHDR")
    val injected = chunks.map { case (t, c) => pngChunk(t, c) }
      .foldLeft(Array.emptyByteArray)(_ ++ _)
    png.take(ihdrEnd) ++ injected ++ png.drop(ihdrEnd)
  }

  /** PRIVACY SCRUB: drop every ANCILLARY chunk from a PNG — tEXt,
    * zTXt, iTXt, eXIf, tIME, pHYs and anything else whose type's
    * first letter is lowercase (bit 5 set = ancillary per the PNG
    * spec), the channels that carry author names, GPS EXIF blobs,
    * timestamps, and editor fingerprints into a training corpus.
    * Critical chunks (IHDR/PLTE/IDAT/IEND — uppercase first letter)
    * are byte-copied untouched, CRCs and pixel data preserved; no
    * re-encode. This is the maximal-privacy profile: it also drops
    * rendering hints like gAMA/tRNS — a product that needs them would
    * allowlist specific ancillary types, the rule stays one bit test.
    * Returns (scrubbed bytes, total chunks seen, chunks removed,
    * bytes removed); None for malformed input (quarantine, never
    * mis-scrub). */
  def pngScrubMetadata(data: Array[Byte])
      : Option[(Array[Byte], Int, Int, Long)] =
    try {
      def u8(i: Int): Int = data(i) & 0xff
      def rd4(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      if (data.length < 8 || (0 until 8).exists(i => u8(i) != pngSig(i)))
        return None
      val out = new java.io.ByteArrayOutputStream()
      out.write(data, 0, 8)
      var pos = 8
      var total = 0
      var removed = 0
      var removedBytes = 0L
      var sawEnd = false
      while (!sawEnd && pos + 12 <= data.length) {
        val len = rd4(pos)
        if (len < 0 || pos + 12 + len > data.length) return None
        val chunkLen = 12 + len
        total += 1
        val ancillary = (u8(pos + 4) & 0x20) != 0
        if (ancillary) { removed += 1; removedBytes += chunkLen }
        else out.write(data, pos, chunkLen)
        if (u8(pos + 4) == 'I' && u8(pos + 5) == 'E' &&
          u8(pos + 6) == 'N' && u8(pos + 7) == 'D') sawEnd = true
        pos += chunkLen
      }
      if (!sawEnd) return None
      Some((out.toByteArray, total, removed, removedBytes))
    } catch { case _: Exception => None }

  /** REAL PNG pixel decode: chunk walk (CRC-verified), concatenated
    * IDAT inflate, per-row defilter. Returns (width, height, channels,
    * samples) with samples row-major `w*h*channels` bytes, or None for
    * anything that isn't a well-formed 8-bit non-interlaced PNG —
    * truncated or corrupt crawl bytes degrade to None, never throw. */
  def pngDecodePixels(data: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try {
      def u8(i: Int): Int = data(i) & 0xff
      def rd4(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      if (data.length < 8 || (0 until 8).exists(i => u8(i) != pngSig(i))) return None
      var w = 0; var h = 0; var ch = -1; var indexed = false
      var palette: Array[Byte] = null
      var pos = 8
      var ended = false
      val idat = new java.io.ByteArrayOutputStream()
      while (!ended && pos + 12 <= data.length) {
        val len = rd4(pos)
        if (len < 0 || pos + 12 + len > data.length) return None
        val typ = new String(data, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val crc = new java.util.zip.CRC32()
        crc.update(data, pos + 4, 4 + len)
        if (crc.getValue.toInt != rd4(pos + 8 + len)) return None
        typ match {
          case "IHDR" =>
            if (len != 13) return None
            w = rd4(pos + 8); h = rd4(pos + 12)
            val depth = u8(pos + 16)
            // ch = SAMPLES per pixel in the scanline stream (palette
            // images carry one index byte per pixel, expanded later)
            ch = u8(pos + 17) match {
              case 0 => 1; case 2 => 3; case 3 => indexed = true; 1
              case 4 => 2; case 6 => 4; case _ => -1
            }
            // depth 8, compression 0, filter method 0, no interlace
            if (w <= 0 || h <= 0 || ch < 0 || depth != 8 ||
              u8(pos + 18) != 0 || u8(pos + 19) != 0 || u8(pos + 20) != 0) return None
          case "PLTE" =>
            if (len == 0 || len % 3 != 0 || len > 768) return None
            palette = java.util.Arrays.copyOfRange(data, pos + 8, pos + 8 + len)
          case "IDAT" => idat.write(data, pos + 8, len)
          case "IEND" => ended = true
          case _ => () // ancillary chunks skipped by declared length
        }
        pos += 12 + len
      }
      if (ch < 0 || !ended || (indexed && palette == null)) return None
      val rowBytes = w * ch
      // bound the decode buffer BEFORE inflating: a hostile IHDR must
      // not make us allocate from attacker-declared dimensions unchecked
      val expect = h.toLong * (rowBytes + 1)
      if (expect > (1L << 30)) return None
      val raw = new Array[Byte](expect.toInt)
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        // inflate()==0 with the stream unfinished is ALWAYS malformed
        // for PNG — needsInput (truncated), needsDictionary (FDICT is
        // illegal in PNG zlib streams), or any other stuck state. Only
        // checking needsInput() would let a crafted FDICT stream (with
        // valid chunk CRCs) spin this loop forever on an executor.
        if (n == 0 && !inflater.finished()) { inflater.end(); return None }
        got += n
      }
      inflater.end()
      if (got != raw.length) return None
      val px = new Array[Byte](h * rowBytes)
      val bpp = ch
      var r = 0
      while (r < h) {
        val ft = raw(r * (rowBytes + 1)) & 0xff
        if (ft > 4) return None
        var x = 0
        while (x < rowBytes) {
          val f = raw(r * (rowBytes + 1) + 1 + x) & 0xff
          val a = if (x >= bpp) px(r * rowBytes + x - bpp) & 0xff else 0
          val b = if (r > 0) px((r - 1) * rowBytes + x) & 0xff else 0
          val c = if (r > 0 && x >= bpp) px((r - 1) * rowBytes + x - bpp) & 0xff else 0
          val pred = ft match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) / 2
            case 4 => paeth(a, b, c)
          }
          px(r * rowBytes + x) = ((f + pred) & 0xff).toByte
          x += 1
        }
        r += 1
      }
      if (!indexed) Some((w, h, ch, px))
      else {
        // palette expansion: every index must address a PLTE triple —
        // an out-of-range index is hostile bytes, not a pixel
        val nEntries = palette.length / 3
        val rgb = new Array[Byte](px.length * 3)
        var i = 0
        while (i < px.length) {
          val idx = px(i) & 0xff
          if (idx >= nEntries) return None
          rgb(3 * i) = palette(3 * idx)
          rgb(3 * i + 1) = palette(3 * idx + 1)
          rgb(3 * i + 2) = palette(3 * idx + 2)
          i += 1
        }
        Some((w, h, 3, rgb))
      }
    } catch { case _: Exception => None }

  /** Per-image features over DECODED pixels. */
  final case class PixelFeatures(doc_id: Long, width: Int, height: Int,
      channels: Int, n_samples: Long, sum_v: Long, wsum: Long, mean_luma: Long)

  /** Real pixel-tier feature extraction: decode each PNG or baseline
    * JPEG payload and reduce its samples — count, exact sum,
    * position-weighted sum Σ(i+1)·vᵢ (order-sensitive, so a defilter /
    * IDCT that permutes or off-by-ones any byte breaks it), and
    * integer mean. Undecodable payloads are dropped (quarantine-sink
    * semantics, as [[decodeImage]]). Narrow mapPartitions; bytes never
    * shuffle. */
  def decodePixelFeatures(media: Dataset[MediaRecord]): Dataset[PixelFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { rec =>
        pngDecodePixels(rec.data).orElse(jpegDecodePixels(rec.data))
          .map { case (w, h, ch, px) =>
          var sum = 0L; var ws = 0L; var i = 0
          while (i < px.length) {
            val v = px(i) & 0xff
            sum += v; ws += (i + 1).toLong * v
            i += 1
          }
          PixelFeatures(rec.doc_id, w, h, ch, px.length.toLong, sum, ws,
            sum / px.length)
        }
      }
    }
  }

  // ---- Real baseline JPEG codec (ITU-T T.81, public byte format) ----
  //
  // The second image format with a fully REAL pixel tier: baseline
  // sequential DCT needs no external library — Huffman coding, 8×8
  // DCT, and the JFIF wrapper are all public spec. Scope: SOF0
  // (baseline), 8-bit precision, 1 component (grayscale) or 3
  // components (YCbCr, JFIF BT.601) in the standard chroma layouts —
  // 4:4:4, 4:2:2 (both orientations) and 4:2:0, i.e. luma factors up
  // to 2×2 with 1×1 chroma, upsampled by replication. DHT/DQT are
  // parsed generally (any valid tables, so real-world baseline files
  // with the Annex-K tables decode too), restart markers honored.
  // Progressive (SOF2), 12-bit, arithmetic coding, and exotic factor
  // mixes degrade to None — the SOF-dimension tier still covers them.
  // (The WRITER stays 4:4:4/grayscale: subsampling is a decode-side
  // compatibility need; the oracle fixtures need exactness.)
  //
  // The encoder quantizes with a FLAT all-8s table. That choice makes
  // a block of CONSTANT pixels round-trip EXACTLY: such a block has
  // only a DC coefficient 8·(v−128), which quantizes to v−128 with no
  // remainder and reconstructs to v bit-exactly — the property the
  // q113 oracle is built on (uniform 8×8 blocks are recomputable
  // arithmetically by DuckDB; general content is covered by the
  // tolerance + javax.imageio conformance specs instead).

  /** Zig-zag scan order: scan position → natural block index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) scaled by C(u) — the shared 1-D DCT basis. */
  private lazy val DctBasis: Array[Array[Double]] = Array.tabulate(8, 8) {
    (u, x) =>
      val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Flat quantization table (see codec note above). */
  private val FlatQ: Array[Int] = Array.fill(64)(8)

  /** Writer-side Huffman tables, chosen for simplicity not optimality
    * (any prefix-free table a DHT can describe is legal): DC = the 12
    * size categories as 4-bit codes (code == symbol); AC = the 162
    * emittable run/size symbols (EOB, ZRL, run 0–15 × size 1–10) as
    * 9-bit codes, canonical code == index in the symbol list. (A DHT
    * `Li` count is one byte, so "all 256 symbols at one length" is
    * not encodable — and Kraft 162/512 is comfortably valid.) */
  private val EncDcBits: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncDcVals: Array[Int] = (0 until 12).toArray
  private val EncAcVals: Array[Int] =
    Array(0x00, 0xF0) ++
      (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size)
  private val EncAcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 0, EncAcVals.length, 0, 0, 0, 0, 0, 0, 0)
  /** symbol → canonical 9-bit code (its index in [[EncAcVals]]). */
  private val EncAcCode: Array[Int] = {
    val a = Array.fill(256)(-1)
    EncAcVals.zipWithIndex.foreach { case (s, i) => a(s) = i }
    a
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 §B.2.1). */
    def flush(): Array[Byte] = {
      if (nBits > 0) {
        acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
        out.write(acc)
        if (acc == 0xFF) out.write(0x00)
        acc = 0; nBits = 0
      }
      out.toByteArray
    }
  }

  /** Magnitude category (bit size) of a DC diff / AC coefficient. */
  private def magBits(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  private def fdctQuantized(block: Array[Double]): Array[Int] = {
    // separable 2-D FDCT: rows then columns against the shared basis
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += block(y * 8 + x) * DctBasis(u)(x); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    val out = new Array[Int](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * DctBasis(v)(yy); yy += 1 }
        val coef = s / 4.0
        out(v * 8 + u) = math.round(coef / FlatQ(v * 8 + u)).toInt
        u += 1
      }
      v += 1
    }
    out
  }

  private def dhtSegment(tableClass: Int, id: Int, bits: Array[Int],
      vals: Array[Int]): Array[Byte] = {
    val body = Array((tableClass << 4 | id).toByte) ++
      bits.map(_.toByte) ++ vals.map(_.toByte)
    Array(0xFF.toByte, 0xC4.toByte) ++ be2(2 + body.length) ++ body
  }

  /** Encode 8-bit samples (`w*h*channels`, row-major, channels 1 = gray
    * or 3 = RGB) as a complete baseline JFIF JPEG. */
  def jpegEncode(w: Int, h: Int, channels: Int, pixels: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels $channels not in {1,3}")
    require(pixels.length == w * h * channels,
      s"pixels ${pixels.length} != $w*$h*$channels")
    // color: JFIF BT.601 RGB → YCbCr, rounded to the nearest sample
    val planes: Array[Array[Int]] =
      if (channels == 1) Array(Array.tabulate(w * h)(i => pixels(i) & 0xff))
      else {
        val ys = new Array[Int](w * h); val cb = new Array[Int](w * h)
        val cr = new Array[Int](w * h)
        var i = 0
        while (i < w * h) {
          val r = pixels(3 * i) & 0xff; val g = pixels(3 * i + 1) & 0xff
          val b = pixels(3 * i + 2) & 0xff
          def clamp(d: Double): Int =
            math.max(0, math.min(255, math.round(d).toInt))
          ys(i) = clamp(0.299 * r + 0.587 * g + 0.114 * b)
          cb(i) = clamp(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)
          cr(i) = clamp(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
          i += 1
        }
        Array(ys, cb, cr)
      }
    val mcuX = (w + 7) / 8; val mcuY = (h + 7) / 8
    val bw = new BitWriter
    val dcPred = new Array[Int](planes.length)
    var my = 0
    while (my < mcuY) {
      var mx = 0
      while (mx < mcuX) {
        var c = 0
        while (c < planes.length) {
          val plane = planes(c)
          val block = new Array[Double](64)
          var by = 0
          while (by < 8) {
            var bx = 0
            while (bx < 8) {
              // edge replication for partial blocks (standard practice)
              val sx = math.min(w - 1, mx * 8 + bx)
              val sy = math.min(h - 1, my * 8 + by)
              block(by * 8 + bx) = plane(sy * w + sx) - 128.0
              bx += 1
            }
            by += 1
          }
          val q = fdctQuantized(block)
          // DC: category code + magnitude bits
          val diff = q(0) - dcPred(c); dcPred(c) = q(0)
          val dcSize = magBits(diff)
          bw.put(dcSize, 4) // EncDc: code == symbol, length 4
          if (dcSize > 0) {
            val bits = if (diff < 0) diff + (1 << dcSize) - 1 else diff
            bw.put(bits, dcSize)
          }
          // AC: run/size symbols in zig-zag order
          var run = 0; var k = 1
          while (k < 64) {
            val coef = q(Zigzag(k))
            if (coef == 0) run += 1
            else {
              while (run > 15) { bw.put(EncAcCode(0xF0), 9); run -= 16 } // ZRL
              val sz = magBits(coef)
              bw.put(EncAcCode((run << 4) | sz), 9)
              val bits = if (coef < 0) coef + (1 << sz) - 1 else coef
              bw.put(bits, sz)
              run = 0
            }
            k += 1
          }
          if (run > 0) bw.put(EncAcCode(0x00), 9) // EOB
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    val app0 = Array(0xFF.toByte, 0xE0.toByte) ++ be2(16) ++
      "JFIF\u0000".getBytes("US-ASCII") ++ Array[Byte](1, 1, 0) ++
      be2(1) ++ be2(1) ++ Array[Byte](0, 0)
    val dqt = Array(0xFF.toByte, 0xDB.toByte) ++ be2(67) ++
      Array(0x00.toByte) ++ Zigzag.map(i => FlatQ(i).toByte) // Pq=0, Tq=0
    val comps = (1 to planes.length)
      .flatMap(c => Array(c.toByte, 0x11.toByte, 0.toByte)).toArray
    val sof = Array(0xFF.toByte, 0xC0.toByte) ++
      be2(8 + 3 * planes.length) ++ Array[Byte](8) ++ be2(h) ++ be2(w) ++
      Array(planes.length.toByte) ++ comps
    val dht = dhtSegment(0, 0, EncDcBits, EncDcVals) ++
      dhtSegment(1, 0, EncAcBits, EncAcVals)
    val scanComps = (1 to planes.length)
      .flatMap(c => Array(c.toByte, 0x00.toByte)).toArray
    val sos = Array(0xFF.toByte, 0xDA.toByte) ++
      be2(6 + 2 * planes.length) ++ Array(planes.length.toByte) ++
      scanComps ++ Array[Byte](0, 63, 0)
    Array(0xFF.toByte, 0xD8.toByte) ++ app0 ++ dqt ++ sof ++ dht ++ sos ++
      bw.flush() ++ Array(0xFF.toByte, 0xD9.toByte)
  }

  /** Canonical Huffman table in T.81 DECODE form. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17); val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  /** Entropy-segment bit reader: unstuffs FF00, stops at any real
    * marker, resets cleanly across restart markers. */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0; private var nBits = 0
    var hitMarker = false
    def nextBit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) { hitMarker = true; return -1 }
        var b = data(pos) & 0xff
        if (b == 0xFF) {
          if (pos + 1 >= data.length) { hitMarker = true; return -1 }
          val nxt = data(pos + 1) & 0xff
          if (nxt == 0x00) { pos += 2 } // stuffed FF
          else { hitMarker = true; return -1 } // real marker: stop
        } else pos += 1
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >>> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val b = nextBit(); if (b < 0) return Int.MinValue
        v = (v << 1) | b; i += 1
      }
      v
    }
    /** Skip a restart marker at the current (byte-aligned) position;
      * true if one was consumed. */
    def restart(): Boolean = {
      nBits = 0; hitMarker = false
      if (pos + 1 < data.length && (data(pos) & 0xff) == 0xFF) {
        val m = data(pos + 1) & 0xff
        if (m >= 0xD0 && m <= 0xD7) { pos += 2; return true }
      }
      false
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = nextBit(); if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l) && code >= t.minCode(l))
          return t.value(l, code)
        val b = nextBit(); if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      -1
    }
  }

  /** EXTEND (T.81 F.12): map `v` of `size` bits to its signed value. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0 else if (v < (1 << (size - 1))) v - (1 << size) + 1 else v

  /** REAL JPEG pixel decode: general DQT/DHT/SOF/SOS parse, Huffman
    * entropy decode, dequantize, float IDCT, level shift; YCbCr→RGB
    * (BT.601) for 3-component scans; 4:2:0/4:2:2 chroma subsampling by
    * replication upsample. SOF0 baseline decodes inline; SOF2
    * progressive dispatches to [[jpegDecodeProgressive]]. Returns
    * (width, height, channels, samples row-major), or None for
    * anything outside the supported profile (12-bit, lossless,
    * arithmetic coding) or malformed — crawl bytes degrade to None,
    * never throw or hang. */
  def jpegDecodePixels(data: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try {
      def u8(i: Int): Int = data(i) & 0xff
      def rd2(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      if (data.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None
      val qTables = new Array[Array[Int]](4)
      val dcTables = new Array[HuffTable](4); val acTables = new Array[HuffTable](4)
      var w = 0; var h = 0; var nComp = 0
      var compQ: Array[Int] = null // per-component quant table id
      var compH: Array[Int] = null; var compV: Array[Int] = null // sampling
      var restartInterval = 0
      var pos = 2
      var sofSeen = false
      while (pos + 3 < data.length) {
        if (u8(pos) != 0xFF) return None
        val m = u8(pos + 1)
        if (m == 0xFF) { pos += 1 } // fill byte
        else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) pos += 2
        else {
          val len = rd2(pos + 2)
          if (len < 2 || pos + 2 + len > data.length) return None
          val seg = pos + 4
          m match {
            case 0xDB => // DQT: one or more tables
              var p = seg
              while (p < pos + 2 + len) {
                val pq = u8(p) >> 4; val tq = u8(p) & 0x0F
                if (pq != 0 || tq > 3 || p + 65 > pos + 2 + len) return None
                val t = new Array[Int](64)
                var k = 0
                while (k < 64) { t(Zigzag(k)) = u8(p + 1 + k); k += 1 }
                qTables(tq) = t
                p += 65
              }
            case 0xC4 => // DHT: one or more tables
              var p = seg
              while (p < pos + 2 + len) {
                val tc = u8(p) >> 4; val th = u8(p) & 0x0F
                if (tc > 1 || th > 3) return None
                val bits = Array.tabulate(16)(i => u8(p + 1 + i))
                val total = bits.sum
                if (total > 256 || p + 17 + total > pos + 2 + len) return None
                val vals = Array.tabulate(total)(i => u8(p + 17 + i))
                val t = new HuffTable(bits, vals)
                if (tc == 0) dcTables(th) = t else acTables(th) = t
                p += 17 + total
              }
            case 0xC0 => // SOF0 baseline
              if (u8(seg) != 8) return None // precision
              h = rd2(seg + 1); w = rd2(seg + 3); nComp = u8(seg + 5)
              if (w <= 0 || h <= 0 || (nComp != 1 && nComp != 3)) return None
              if (w.toLong * h * nComp > (1L << 30)) return None
              compQ = new Array[Int](nComp)
              compH = new Array[Int](nComp); compV = new Array[Int](nComp)
              var c = 0
              while (c < nComp) {
                val hv = u8(seg + 7 + 3 * c)
                compH(c) = hv >> 4; compV(c) = hv & 0x0F
                if (compH(c) < 1 || compH(c) > 2 ||
                  compV(c) < 1 || compV(c) > 2) return None
                compQ(c) = u8(seg + 8 + 3 * c)
                if (compQ(c) > 3) return None
                c += 1
              }
              // the standard chroma layouts only: luma may be 1×1,
              // 2×1, 1×2 or 2×2; chroma must be 1×1 (covers 4:4:4,
              // 4:2:2 both orientations, and 4:2:0 — the shapes real
              // crawl JPEGs use). Exotic factor mixes degrade to None.
              if (nComp == 3 && (compH(1) != 1 || compV(1) != 1 ||
                compH(2) != 1 || compV(2) != 1)) return None
              sofSeen = true
            case 0xC2 => // SOF2: progressive — dedicated multi-scan path
              return jpegDecodeProgressive(data)
            case 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
                 0xCB | 0xCD | 0xCE | 0xCF =>
              return None // extended/lossless/arithmetic
            case 0xDD => // DRI
              if (len != 4) return None
              restartInterval = rd2(seg)
            case 0xDA => // SOS: decode the scan and finish
              if (!sofSeen) return None
              val ns = u8(seg)
              if (ns != nComp) return None
              val dcSel = new Array[Int](nComp); val acSel = new Array[Int](nComp)
              var c = 0
              while (c < ns) {
                dcSel(c) = u8(seg + 2 + 2 * c) >> 4
                acSel(c) = u8(seg + 2 + 2 * c) & 0x0F
                c += 1
              }
              c = 0
              while (c < nComp) {
                if (qTables(compQ(c)) == null || dcTables(dcSel(c)) == null ||
                  acTables(acSel(c)) == null) return None
                c += 1
              }
              // sampling geometry: a single-component scan is
              // non-interleaved (one block per data unit) so factors
              // don't apply; an interleaved 3-component MCU carries
              // Hi×Vi blocks per component and covers 8·hmax × 8·vmax
              // pixels. Component planes decode PADDED to whole MCUs
              // and upsample by replication at assembly.
              val hs = if (nComp == 1) Array(1) else compH
              val vs = if (nComp == 1) Array(1) else compV
              val hmax = hs.max; val vmax = vs.max
              val mcuX = (w + 8 * hmax - 1) / (8 * hmax)
              val mcuY = (h + 8 * vmax - 1) / (8 * vmax)
              val pw = Array.tabulate(nComp)(c => mcuX * 8 * hs(c))
              val ph = Array.tabulate(nComp)(c => mcuY * 8 * vs(c))
              val planes = Array.tabulate(nComp)(c => new Array[Int](pw(c) * ph(c)))
              val br = new BitReader(data, pos + 2 + len)
              val dcPred = new Array[Int](nComp)
              val coeff = new Array[Int](64)
              val tmp = new Array[Double](64)
              // decode one block of component ci into its padded plane
              // at block coords (bx, by); false = malformed stream
              def decodeBlock(ci: Int, bx: Int, by: Int): Boolean = {
                java.util.Arrays.fill(coeff, 0)
                val q = qTables(compQ(ci))
                val s = br.decodeHuff(dcTables(dcSel(ci)))
                if (s < 0 || s > 11) return false
                val diffBits = br.receive(s)
                if (diffBits == Int.MinValue) return false
                dcPred(ci) += extend(diffBits, s)
                coeff(0) = dcPred(ci) * q(0)
                var k = 1
                var eob = false
                while (k < 64 && !eob) {
                  val rs = br.decodeHuff(acTables(acSel(ci)))
                  if (rs < 0) return false
                  val run = rs >> 4; val sz = rs & 0x0F
                  if (sz == 0) {
                    if (run == 15) k += 16 // ZRL
                    else eob = true
                  } else {
                    k += run
                    if (k > 63) return false
                    val bits = br.receive(sz)
                    if (bits == Int.MinValue) return false
                    coeff(Zigzag(k)) = extend(bits, sz) * q(Zigzag(k))
                    k += 1
                  }
                }
                // separable IDCT: columns then rows
                var x = 0
                while (x < 8) {
                  var y = 0
                  while (y < 8) {
                    var s2 = 0.0; var v = 0
                    while (v < 8) {
                      s2 += DctBasis(v)(y) * coeff(v * 8 + x); v += 1
                    }
                    tmp(y * 8 + x) = s2
                    y += 1
                  }
                  x += 1
                }
                val plane = planes(ci)
                val rowBase = by * 8; val colBase = bx * 8
                var y = 0
                while (y < 8) {
                  var x2 = 0
                  while (x2 < 8) {
                    var s2 = 0.0; var u = 0
                    while (u < 8) { s2 += DctBasis(u)(x2) * tmp(y * 8 + u); u += 1 }
                    val v = math.round(s2 / 4.0 + 128.0).toInt
                    plane((rowBase + y) * pw(ci) + colBase + x2) =
                      math.max(0, math.min(255, v))
                    x2 += 1
                  }
                  y += 1
                }
                true
              }
              var mcu = 0
              val nMcu = mcuX * mcuY
              while (mcu < nMcu) {
                if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
                  if (!br.restart()) return None
                  java.util.Arrays.fill(dcPred, 0)
                }
                val my = mcu / mcuX; val mx = mcu % mcuX
                var ci = 0
                while (ci < nComp) {
                  var bv = 0
                  while (bv < vs(ci)) {
                    var bh = 0
                    while (bh < hs(ci)) {
                      if (!decodeBlock(ci, mx * hs(ci) + bh, my * vs(ci) + bv))
                        return None
                      bh += 1
                    }
                    bv += 1
                  }
                  ci += 1
                }
                mcu += 1
              }
              // assemble output samples: crop padding, replicate-
              // upsample subsampled components to full resolution
              val out = new Array[Byte](w * h * nComp)
              if (nComp == 1) {
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    out(y * w + x) = planes(0)(y * pw(0) + x).toByte
                    x += 1
                  }
                  y += 1
                }
              } else {
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val i = y * w + x
                    def samp(ci: Int): Int =
                      planes(ci)((y * vs(ci) / vmax) * pw(ci) + x * hs(ci) / hmax)
                    val yv = samp(0); val cb = samp(1) - 128; val cr = samp(2) - 128
                    def clamp(d: Double): Byte =
                      math.max(0, math.min(255, math.round(d).toInt)).toByte
                    out(3 * i) = clamp(yv + 1.402 * cr)
                    out(3 * i + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
                    out(3 * i + 2) = clamp(yv + 1.772 * cb)
                    x += 1
                  }
                  y += 1
                }
              }
              return Some((w, h, nComp, out))
            case _ => () // APPn/COM/other: skip by declared length
          }
          if (m != 0xDA) pos += 2 + len else pos = data.length
        }
      }
      None
    } catch { case _: Exception => None }

  /** REAL progressive JPEG decode (SOF2, T.81 Annex G): coefficients
    * accumulate across every scan — first/refinement DC scans
    * (successive-approximation bit Al), non-interleaved spectral AC
    * scans with EOB-run coding, and the G.1.2.3 AC refinement
    * correction-bit walk — then one dequantize + IDCT + assembly pass
    * at EOI. Same supported profile as the baseline path (8-bit,
    * 1 or 3 components, luma factors ≤2×2 with 1×1 chroma); anything
    * else, or any malformed stream, degrades to None — crawl bytes
    * never throw or hang an executor. */
  private def jpegDecodeProgressive(
      data: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] =
    try {
      def u8(i: Int): Int = data(i) & 0xff
      def rd2(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      if (data.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None
      val qTables = new Array[Array[Int]](4)
      val dcTables = new Array[HuffTable](4); val acTables = new Array[HuffTable](4)
      var w = 0; var h = 0; var nComp = 0
      var compQ: Array[Int] = null
      var compH: Array[Int] = null; var compV: Array[Int] = null
      var restartInterval = 0
      // per-component coefficient store over the MCU-padded block grid
      var coefs: Array[Array[Int]] = null
      var bw: Array[Int] = null                     // padded blocks per row
      var cbW: Array[Int] = null; var cbH: Array[Int] = null // coded grid
      var qSnap: Array[Array[Int]] = null           // quant at first scan
      var hmax = 1; var vmax = 1; var mcuX = 0; var mcuY = 0
      var sofSeen = false
      var pos = 2
      while (pos + 1 < data.length) {
        if (u8(pos) != 0xFF) return None
        val m = u8(pos + 1)
        if (m == 0xFF) { pos += 1 }
        else if (m == 0xD9) { // EOI: dequantize + IDCT + assemble
          if (!sofSeen || qSnap == null) return None
          return assembleProgressive(w, h, nComp, compH, compV, hmax, vmax,
            mcuX, mcuY, bw, coefs, qSnap)
        } else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) pos += 2
        else {
          val len = rd2(pos + 2)
          if (len < 2 || pos + 2 + len > data.length) return None
          val seg = pos + 4
          m match {
            case 0xDB =>
              var p = seg
              while (p < pos + 2 + len) {
                val pq = u8(p) >> 4; val tq = u8(p) & 0x0F
                if (pq != 0 || tq > 3 || p + 65 > pos + 2 + len) return None
                val t = new Array[Int](64)
                var k = 0
                while (k < 64) { t(Zigzag(k)) = u8(p + 1 + k); k += 1 }
                qTables(tq) = t
                p += 65
              }
            case 0xC4 =>
              var p = seg
              while (p < pos + 2 + len) {
                val tc = u8(p) >> 4; val th = u8(p) & 0x0F
                if (tc > 1 || th > 3) return None
                val bits = Array.tabulate(16)(i => u8(p + 1 + i))
                val total = bits.sum
                if (total > 256 || p + 17 + total > pos + 2 + len) return None
                val vals = Array.tabulate(total)(i => u8(p + 17 + i))
                val t = new HuffTable(bits, vals)
                if (tc == 0) dcTables(th) = t else acTables(th) = t
                p += 17 + total
              }
            case 0xC2 =>
              if (sofSeen || u8(seg) != 8) return None
              h = rd2(seg + 1); w = rd2(seg + 3); nComp = u8(seg + 5)
              if (w <= 0 || h <= 0 || (nComp != 1 && nComp != 3)) return None
              if (w.toLong * h * nComp > (1L << 30)) return None
              compQ = new Array[Int](nComp)
              compH = new Array[Int](nComp); compV = new Array[Int](nComp)
              var c = 0
              while (c < nComp) {
                val hv = u8(seg + 7 + 3 * c)
                compH(c) = hv >> 4; compV(c) = hv & 0x0F
                if (compH(c) < 1 || compH(c) > 2 ||
                  compV(c) < 1 || compV(c) > 2) return None
                compQ(c) = u8(seg + 8 + 3 * c)
                if (compQ(c) > 3) return None
                c += 1
              }
              if (nComp == 3 && (compH(1) != 1 || compV(1) != 1 ||
                compH(2) != 1 || compV(2) != 1)) return None
              if (nComp == 1) { compH(0) = 1; compV(0) = 1 }
              hmax = compH.max; vmax = compV.max
              mcuX = (w + 8 * hmax - 1) / (8 * hmax)
              mcuY = (h + 8 * vmax - 1) / (8 * vmax)
              bw = Array.tabulate(nComp)(c => mcuX * compH(c))
              val bhArr = Array.tabulate(nComp)(c => mcuY * compV(c))
              // coded (non-interleaved) grid: ceil(compDim/8)
              cbW = Array.tabulate(nComp)(c =>
                ((w * compH(c) + hmax - 1) / hmax + 7) / 8)
              cbH = Array.tabulate(nComp)(c =>
                ((h * compV(c) + vmax - 1) / vmax + 7) / 8)
              coefs = Array.tabulate(nComp)(c =>
                new Array[Int](bw(c) * bhArr(c) * 64))
              sofSeen = true
            case 0xC0 | 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA |
                 0xCB | 0xCD | 0xCE | 0xCF =>
              return None // a second frame type inside a progressive file
            case 0xDD =>
              if (len != 4) return None
              restartInterval = rd2(seg)
            case 0xDA =>
              if (!sofSeen) return None
              val ns = u8(seg)
              if (ns < 1 || ns > nComp) return None
              val scanComp = new Array[Int](ns)
              val dcSel = new Array[Int](ns); val acSel = new Array[Int](ns)
              var i = 0
              while (i < ns) {
                val cid = u8(seg + 1 + 2 * i)
                // JFIF writers number components 1..nComp in SOF
                // order, so scan ids resolve positionally; anything
                // else degrades to None (same stance as baseline)
                if (cid < 1 || cid > nComp) return None
                scanComp(i) = cid - 1
                dcSel(i) = u8(seg + 2 + 2 * i) >> 4
                acSel(i) = u8(seg + 2 + 2 * i) & 0x0F
                i += 1
              }
              val ss = u8(seg + 1 + 2 * ns)
              val se = u8(seg + 2 + 2 * ns)
              val ahal = u8(seg + 3 + 2 * ns)
              val ah = ahal >> 4; val al = ahal & 0x0F
              if (ss > 63 || se > 63 || se < ss || al > 13) return None
              if (qSnap == null) qSnap = Array.tabulate(nComp) { c =>
                val q = qTables(compQ(c)); if (q == null) return None
                q.clone()
              }
              val br = new BitReader(data, pos + 2 + len)
              if (ss == 0) { // DC scan (first or refinement)
                if (se != 0) return None
                i = 0
                while (i < ns) {
                  if (ah == 0 && dcTables(dcSel(i)) == null) return None
                  i += 1
                }
                val dcPred = new Array[Int](ns)
                // interleaved over the scan's components (ns==1 → the
                // component's own padded grid, which equals its MCU
                // tiling when it is the only scan component)
                val sHs = Array.tabulate(ns)(i2 =>
                  if (ns == 1) 1 else compH(scanComp(i2)))
                val sVs = Array.tabulate(ns)(i2 =>
                  if (ns == 1) 1 else compV(scanComp(i2)))
                val units =
                  if (ns == 1) cbW(scanComp(0)) * cbH(scanComp(0))
                  else mcuX * mcuY
                val unitsX = if (ns == 1) cbW(scanComp(0)) else mcuX
                var mcu = 0
                while (mcu < units) {
                  if (restartInterval > 0 && mcu > 0 &&
                      mcu % restartInterval == 0) {
                    if (!br.restart()) return None
                    java.util.Arrays.fill(dcPred, 0)
                  }
                  val my = mcu / unitsX; val mx = mcu % unitsX
                  i = 0
                  while (i < ns) {
                    val ci = scanComp(i)
                    var bv = 0
                    while (bv < sVs(i)) {
                      var bh2 = 0
                      while (bh2 < sHs(i)) {
                        val bx = mx * sHs(i) + bh2
                        val by = my * sVs(i) + bv
                        val off = (by * bw(ci) + bx) * 64
                        if (ah == 0) {
                          val s = br.decodeHuff(dcTables(dcSel(i)))
                          if (s < 0 || s > 11) return None
                          val bits = br.receive(s)
                          if (bits == Int.MinValue) return None
                          dcPred(i) += extend(bits, s)
                          coefs(ci)(off) = dcPred(i) << al
                        } else {
                          val b = br.nextBit()
                          if (b < 0) return None
                          if (b == 1) coefs(ci)(off) |= 1 << al
                        }
                        bh2 += 1
                      }
                      bv += 1
                    }
                    i += 1
                  }
                  mcu += 1
                }
              } else { // AC scan: exactly one component (T.81 G.1.1.1)
                if (ns != 1) return None
                val ci = scanComp(0)
                val ac = acTables(acSel(0))
                if (ac == null) return None
                val nb = cbW(ci) * cbH(ci)
                var eobrun = 0
                var b = 0
                while (b < nb) {
                  if (restartInterval > 0 && b > 0 &&
                      b % restartInterval == 0) {
                    if (!br.restart()) return None
                    eobrun = 0
                  }
                  val by = b / cbW(ci); val bx = b % cbW(ci)
                  val off = (by * bw(ci) + bx) * 64
                  val cf = coefs(ci)
                  if (ah == 0) { // first AC scan for this band
                    if (eobrun > 0) eobrun -= 1
                    else {
                      var k = ss
                      var stop = false
                      while (k <= se && !stop) {
                        val rs = br.decodeHuff(ac)
                        if (rs < 0) return None
                        val r = rs >> 4; val s = rs & 0x0F
                        if (s == 0) {
                          if (r < 15) {
                            eobrun = (1 << r) - 1
                            if (r > 0) {
                              val x = br.receive(r)
                              if (x == Int.MinValue) return None
                              eobrun += x
                            }
                            stop = true
                          } else k += 16
                        } else {
                          k += r
                          if (k > se) return None
                          val bits = br.receive(s)
                          if (bits == Int.MinValue) return None
                          cf(off + Zigzag(k)) = extend(bits, s) << al
                          k += 1
                        }
                      }
                    }
                  } else { // AC refinement (G.1.2.3, correction bits)
                    val delta = 1 << al
                    def refine(idx: Int): Boolean = {
                      val bit = br.nextBit()
                      if (bit < 0) return false
                      if (bit == 1 && (cf(idx) & delta) == 0) {
                        if (cf(idx) > 0) cf(idx) += delta
                        else cf(idx) -= delta
                      }
                      true
                    }
                    if (eobrun > 0) {
                      eobrun -= 1
                      var k = ss
                      while (k <= se) {
                        val idx = off + Zigzag(k)
                        if (cf(idx) != 0 && !refine(idx)) return None
                        k += 1
                      }
                    } else {
                      var k = ss
                      while (k <= se) {
                        val rs = br.decodeHuff(ac)
                        if (rs < 0) return None
                        var r = rs >> 4; val s = rs & 0x0F
                        var newVal = 0
                        if (s == 0) {
                          if (r < 15) { // EOBn: refine the rest, place none
                            eobrun = (1 << r) - 1
                            if (r > 0) {
                              val x = br.receive(r)
                              if (x == Int.MinValue) return None
                              eobrun += x
                            }
                            r = 64
                          }
                        } else {
                          if (s != 1) return None
                          val bit = br.nextBit()
                          if (bit < 0) return None
                          newVal = if (bit == 1) delta else -delta
                        }
                        var placed = false
                        while (k <= se && !placed) {
                          val idx = off + Zigzag(k)
                          if (cf(idx) != 0) {
                            if (!refine(idx)) return None
                          } else if (r == 0) {
                            if (newVal != 0) cf(idx) = newVal
                            placed = true
                          } else r -= 1
                          k += 1
                        }
                      }
                    }
                  }
                  b += 1
                }
              }
              // resume marker parsing after the entropy-coded segment:
              // skip to the next real marker (trailing RSTs consumed)
              pos = br.pos
              var found = false
              while (!found) {
                if (pos + 1 >= data.length) return None
                if (u8(pos) == 0xFF && u8(pos + 1) != 0x00) {
                  if (u8(pos + 1) >= 0xD0 && u8(pos + 1) <= 0xD7) pos += 2
                  else if (u8(pos + 1) == 0xFF) pos += 1
                  else found = true
                } else pos += 1
              }
            case _ => ()
          }
          if (m != 0xDA) pos += 2 + len
        }
      }
      None
    } catch { case _: Exception => None }

  /** Final pass of the progressive path: per-block dequantize + IDCT
    * into padded planes, then the same crop/replicate-upsample/YCbCr
    * assembly as the baseline decoder. */
  private def assembleProgressive(w: Int, h: Int, nComp: Int,
      compH: Array[Int], compV: Array[Int], hmax: Int, vmax: Int,
      mcuX: Int, mcuY: Int, bw: Array[Int], coefs: Array[Array[Int]],
      qSnap: Array[Array[Int]]): Option[(Int, Int, Int, Array[Byte])] = {
    val pw = Array.tabulate(nComp)(c => bw(c) * 8)
    val ph = Array.tabulate(nComp)(c => mcuY * compV(c) * 8)
    val planes = Array.tabulate(nComp)(c => new Array[Int](pw(c) * ph(c)))
    val tmp = new Array[Double](64)
    val block = new Array[Int](64)
    var ci = 0
    while (ci < nComp) {
      val q = qSnap(ci)
      val nbx = bw(ci); val nby = mcuY * compV(ci)
      var byi = 0
      while (byi < nby) {
        var bxi = 0
        while (bxi < nbx) {
          val off = (byi * nbx + bxi) * 64
          var k = 0
          while (k < 64) { block(k) = coefs(ci)(off + k) * q(k); k += 1 }
          var x = 0
          while (x < 8) {
            var y = 0
            while (y < 8) {
              var s2 = 0.0; var v = 0
              while (v < 8) { s2 += DctBasis(v)(y) * block(v * 8 + x); v += 1 }
              tmp(y * 8 + x) = s2
              y += 1
            }
            x += 1
          }
          val plane = planes(ci)
          val rowBase = byi * 8; val colBase = bxi * 8
          var y = 0
          while (y < 8) {
            var x2 = 0
            while (x2 < 8) {
              var s2 = 0.0; var u = 0
              while (u < 8) { s2 += DctBasis(u)(x2) * tmp(y * 8 + u); u += 1 }
              val v = math.round(s2 / 4.0 + 128.0).toInt
              plane((rowBase + y) * pw(ci) + colBase + x2) =
                math.max(0, math.min(255, v))
              x2 += 1
            }
            y += 1
          }
          bxi += 1
        }
        byi += 1
      }
      ci += 1
    }
    val out = new Array[Byte](w * h * nComp)
    if (nComp == 1) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) = planes(0)(y * pw(0) + x).toByte
          x += 1
        }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          def samp(c: Int): Int =
            planes(c)((y * compV(c) / vmax) * pw(c) + x * compH(c) / hmax)
          val yv = samp(0); val cb = samp(1) - 128; val cr = samp(2) - 128
          def clamp(d: Double): Byte =
            math.max(0, math.min(255, math.round(d).toInt)).toByte
          out(3 * i) = clamp(yv + 1.402 * cr)
          out(3 * i + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          out(3 * i + 2) = clamp(yv + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    }
    Some((w, h, nComp, out))
  }

  // ---- Audio/video containers: RIFF/WAVE and ISO BMFF (MP4) ----
  // Same two-tier honesty as images: codec payloads stay opaque, but
  // the CONTAINER metadata decode is real — RIFF chunk traversal to
  // `fmt `/`data` (little-endian fields, unknown chunks skipped by
  // declared size) and MP4 box traversal into moov/mvhd (big-endian,
  // version 0 and 1 layouts) — the fields an ingest pipeline filters
  // on (sample rate, channels, duration) before any codec runs.

  final case class AvInfo(doc_id: Long, format: String,
      channels: Option[Int], sample_rate: Option[Int], duration_ms: Long,
      n_bytes: Long)

  private def le2(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)
  private def le4(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  /** RIFF/WAVE container: header + a JUNK chunk (the parser must skip
    * it by size, not assume fmt comes first) + 16-byte PCM `fmt ` +
    * `data` wrapping the payload. 56 bytes of framing + payload. */
  def wavBytes(channels: Int, sampleRate: Int, payload: Array[Byte]): Array[Byte] =
    wavBytesFmt(1, 16, channels, sampleRate, payload)

  /** Generalized WAV writer: any fmt code / bit depth (1 = integer
    * PCM, 6 = G.711 A-law, 7 = G.711 μ-law). */
  def wavBytesFmt(fmtCode: Int, bitsPerSample: Int, channels: Int,
      sampleRate: Int, payload: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * (bitsPerSample / 8)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le4(16) ++ le2(fmtCode) ++
      le2(channels) ++ le4(sampleRate) ++ le4(sampleRate * blockAlign) ++
      le2(blockAlign) ++ le2(bitsPerSample)
    val junk = "JUNK".getBytes("US-ASCII") ++ le4(4) ++ Array[Byte](0, 0, 0, 0)
    val data = "data".getBytes("US-ASCII") ++ le4(payload.length) ++ payload
    val body = "WAVE".getBytes("US-ASCII") ++ junk ++ fmt ++ data
    "RIFF".getBytes("US-ASCII") ++ le4(body.length) ++ body
  }

  private def box(typ: String, content: Array[Byte]): Array[Byte] =
    be4(content.length + 8) ++ typ.getBytes("US-ASCII") ++ content

  /** Minimal ISO BMFF (MP4): ftyp + a free box (must be skipped) +
    * moov/mvhd (full 100-byte version-0 body) + mdat wrapping the
    * payload. 156 bytes of framing + payload. */
  def mp4Bytes(timescale: Int, duration: Long, payload: Array[Byte]): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be4(0) ++ "isom".getBytes("US-ASCII"))
    val free = box("free", Array[Byte](0, 0, 0, 0))
    val mvhd = box("mvhd",
      be4(0) ++ be4(0) ++ be4(0) ++ be4(timescale) ++ be4(duration.toInt) ++
        be4(0x00010000) ++ le2(0) ++ Array.fill[Byte](10)(0) ++
        Array.fill[Byte](36)(0) ++ Array.fill[Byte](24)(0) ++ be4(2))
    ftyp ++ free ++ box("moov", mvhd) ++ box("mdat", payload)
  }

  /** Real RIFF/WAVE metadata parse: (channels, sample_rate,
    * duration_ms) from chunk traversal; None for malformed input. */
  def parseWav(data: Array[Byte]): Option[(Int, Int, Long)] = {
    def u8(i: Int): Int = data(i) & 0xff
    def rdLe2(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def rdLe4(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong | (u8(i + 3).toLong << 24)
    def tag(i: Int): String = new String(data, i, 4, "US-ASCII")
    if (data.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, rate, blockAlign
    var dataLen = -1L
    var halt = false
    while (!halt && pos + 8 <= data.length && (fmt.isEmpty || dataLen < 0)) {
      val id = tag(pos)
      val sz = rdLe4(pos + 4)
      if (id == "fmt " && sz >= 16 && pos + 8 + 16 <= data.length)
        fmt = Some((rdLe2(pos + 10), rdLe4(pos + 12).toInt, rdLe2(pos + 20)))
      else if (id == "data") dataLen = math.min(sz, data.length - pos - 8L)
      // advance in Long: a hostile 32-bit size must neither overflow
      // (negative toInt → the cursor walks BACKWARD, an infinite
      // loop on untrusted bytes) nor scan past the buffer
      val next = pos + 8L + sz + (sz & 1L) // RIFF chunks pad to even
      if (next <= pos || next > data.length) halt = true else pos = next.toInt
    }
    fmt match {
      case Some((ch, rate, ba)) if dataLen >= 0 && ch > 0 && rate > 0 && ba > 0 =>
        Some((ch, rate, dataLen / ba * 1000L / rate))
      case _ => None
    }
  }

  /** Real MP4 metadata parse: duration_ms from a top-level box scan
    * descending into moov → mvhd (version 0 and 1 bodies); None for
    * malformed input. */
  def parseMp4(data: Array[Byte]): Option[Long] = {
    def u8(i: Int): Int = data(i) & 0xff
    def rdBe4(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3))
    def rdBe8(i: Int): Long = (rdBe4(i) << 32) | rdBe4(i + 4)
    def tag(i: Int): String = new String(data, i, 4, "US-ASCII")
    def scan(from: Int, to: Int, want: String): Option[Int] = {
      var pos = from
      while (pos + 8 <= to) {
        val sz = rdBe4(pos)
        if (sz < 8 || pos + sz > to) return None // 64-bit/odd sizes: malformed here
        if (tag(pos + 4) == want) return Some(pos)
        pos += sz.toInt
      }
      None
    }
    for {
      moov <- scan(0, data.length, "moov")
      mvhd <- scan(moov + 8, moov + rdBe4(moov).toInt, "mvhd")
      body = mvhd + 8
      version = u8(body)
      res <- version match {
        case 0 if body + 20 <= data.length =>
          val ts = rdBe4(body + 12); val dur = rdBe4(body + 16)
          if (ts > 0) Some(dur * 1000L / ts) else None
        case 1 if body + 32 <= data.length =>
          val ts = rdBe4(body + 20); val dur = rdBe8(body + 24)
          if (ts > 0) Some(dur * 1000L / ts) else None
        case _ => None
      }
    } yield res
  }

  // ---- Real video frame extraction (ISO BMFF sample tables) ----
  //
  // Beyond mvhd metadata: a REAL sample-table path. The writer builds
  // an MP4 whose moov carries a structurally-valid video trak with
  // stsd/stts/stsc/stsz/stco, and the reader recovers every frame's
  // (offset, size) by the same box arithmetic any demuxer uses —
  // stsc's run-length chunk map × stco chunk offsets + stsz prefix
  // sums — then slices the frame bytes straight out of the file.
  // With MJPEG frames (each sample a complete baseline JPEG from
  // [[jpegEncode]]) the extracted bytes feed [[jpegDecodePixels]]:
  // container → frames → pixels is real end to end, no codec library.

  /** One extracted frame: real bytes sliced from the container. */
  final case class FrameData(doc_id: Long, frame_idx: Int, frame_off: Long,
      n_bytes: Int, data: Array[Byte])

  /** Build an MP4 holding `frames` as one video trak of MJPEG samples,
    * one chunk per sample (stco carries every frame's absolute file
    * offset; stsz every frame's size — the layout crawl-origin MP4s
    * commonly have after faststart remuxing). */
  def mp4VideoBytes(frames: Seq[Array[Byte]], timescale: Int = 600,
      frameDur: Int = 20): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val n = frames.length
    def full(typ: String, body: Array[Byte]): Array[Byte] =
      box(typ, be4(0) ++ body) // version 0, flags 0
    val stsd = full("stsd", be4(1) ++ box("jpeg",
      Array.fill[Byte](6)(0) ++ be2(1) ++ Array.fill[Byte](70)(0)))
    val stts = full("stts", be4(1) ++ be4(n) ++ be4(frameDur))
    val stsc = full("stsc", be4(1) ++ be4(1) ++ be4(1) ++ be4(1))
    val stsz = full("stsz",
      be4(0) ++ be4(n) ++ frames.toArray.flatMap(f => be4(f.length)))
    def stcoWith(offs: Seq[Int]): Array[Byte] =
      full("stco", be4(n) ++ offs.toArray.flatMap(be4))
    def moovWith(stco: Array[Byte]): Array[Byte] = {
      val stbl = box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
      val vmhd = box("vmhd", be4(1) ++ Array.fill[Byte](8)(0))
      val dinf = box("dinf", full("dref", be4(1) ++ full("url ", Array.emptyByteArray)))
      val minf = box("minf", vmhd ++ dinf ++ stbl)
      val hdlr = full("hdlr",
        be4(0) ++ "vide".getBytes("US-ASCII") ++ Array.fill[Byte](13)(0))
      val mdhd = full("mdhd", be4(0) ++ be4(0) ++ be4(timescale) ++
        be4(n * frameDur) ++ be2(0x55c4) ++ be2(0))
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      val tkhd = box("tkhd", be4(7) ++ be4(0) ++ be4(0) ++ be4(1) ++ be4(0) ++
        be4(n * frameDur) ++ Array.fill[Byte](8)(0) ++ be2(0) ++ be2(0) ++
        be2(0) ++ be2(0) ++ Array.fill[Byte](36)(0) ++ be4(0) ++ be4(0))
      val mvhd = box("mvhd",
        be4(0) ++ be4(0) ++ be4(0) ++ be4(timescale) ++ be4(n * frameDur) ++
          be4(0x00010000) ++ le2(0) ++ Array.fill[Byte](10)(0) ++
          Array.fill[Byte](36)(0) ++ Array.fill[Byte](24)(0) ++ be4(2))
      box("moov", mvhd ++ box("trak", tkhd ++ mdia))
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be4(0) ++ "isom".getBytes("US-ASCII"))
    // stco entries are fixed-width, so the moov size is offset-
    // independent: measure once with zeros, then write real offsets
    val moovLen = moovWith(stcoWith(Seq.fill(n)(0))).length
    val base = ftyp.length + moovLen + 8 // + mdat header
    val offs = frames.scanLeft(base)((a, f) => a + f.length).init
    ftyp ++ moovWith(stcoWith(offs)) ++
      box("mdat", frames.toArray.flatten)
  }

  /** Recover per-sample (absolute offset, size) from the FIRST sample
    * table in the file: general stsc run-length chunk mapping, stco or
    * co64 chunk offsets, fixed- or variable-size stsz. None for
    * anything malformed or out of bounds — demuxing crawl bytes must
    * degrade, not throw. */
  def parseMp4Samples(data: Array[Byte]): Option[Seq[(Long, Int)]] =
    try {
      def u8(i: Int): Int = data(i) & 0xff
      def rdBe4(i: Int): Long =
        (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def rdBe8(i: Int): Long = (rdBe4(i) << 32) | rdBe4(i + 4)
      def tag(i: Int): String = new String(data, i, 4, "US-ASCII")
      val containers = Set("moov", "trak", "mdia", "minf", "stbl")
      var stsz = -1; var stco = -1; var co64 = -1; var stsc = -1
      def walk(from: Int, to: Int): Unit = {
        var pos = from
        while (pos + 8 <= to) {
          val sz = rdBe4(pos)
          if (sz < 8 || pos + sz > to) return
          val t = tag(pos + 4)
          if (containers(t)) walk(pos + 8, pos + sz.toInt)
          else t match {
            case "stsz" if stsz < 0 => stsz = pos
            case "stco" if stco < 0 => stco = pos
            case "co64" if co64 < 0 => co64 = pos
            case "stsc" if stsc < 0 => stsc = pos
            case _ => ()
          }
          pos += sz.toInt
        }
      }
      walk(0, data.length)
      if (stsz < 0 || (stco < 0 && co64 < 0) || stsc < 0) return None
      // stsz: fullbox, sample_size, sample_count
      val fixedSize = rdBe4(stsz + 12)
      val nSamples = rdBe4(stsz + 16).toInt
      if (nSamples <= 0 || nSamples > (1 << 22)) return None
      val sizes: Array[Int] =
        if (fixedSize != 0) Array.fill(nSamples)(fixedSize.toInt)
        else {
          if (stsz + 20 + 4L * nSamples > data.length) return None
          Array.tabulate(nSamples)(i => rdBe4(stsz + 20 + 4 * i).toInt)
        }
      // chunk offsets
      val (chunkBase, entW, nChunks) =
        if (stco >= 0) (stco + 16, 4, rdBe4(stco + 12).toInt)
        else (co64 + 16, 8, rdBe4(co64 + 12).toInt)
      if (nChunks <= 0 || chunkBase + entW.toLong * nChunks > data.length) return None
      def chunkOff(c: Int): Long =
        if (entW == 4) rdBe4(chunkBase + 4 * c) else rdBe8(chunkBase + 8 * c)
      // stsc: (first_chunk, samples_per_chunk, sdi) runs
      val nRuns = rdBe4(stsc + 12).toInt
      if (nRuns <= 0 || stsc + 16 + 12L * nRuns > data.length) return None
      val runs = Array.tabulate(nRuns)(i =>
        (rdBe4(stsc + 16 + 12 * i).toInt, rdBe4(stsc + 20 + 12 * i).toInt))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
      var sample = 0
      var run = 0
      var chunk = 1
      while (sample < nSamples && chunk <= nChunks) {
        while (run + 1 < nRuns && runs(run + 1)._1 <= chunk) run += 1
        val spc = runs(run)._2
        if (spc <= 0) return None
        var off = chunkOff(chunk - 1)
        var s = 0
        while (s < spc && sample < nSamples) {
          val sz = sizes(sample)
          if (sz < 0 || off < 0 || off + sz > data.length) return None
          out += ((off, sz))
          off += sz
          sample += 1; s += 1
        }
        chunk += 1
      }
      if (sample < nSamples) None else Some(out.toSeq)
    } catch { case _: Exception => None }

  /** REAL frame extraction: demux each MP4 payload's sample table and
    * slice out every frame's actual bytes (narrow flatMap — one video
    * row explodes into its frames on the same partition; only frames
    * that survive a downstream filter should ever shuffle). The
    * extracted bytes are complete codec payloads: MJPEG samples decode
    * via [[jpegDecodePixels]] end to end. */
  def frameExtract(media: Dataset[MediaRecord]): Dataset[FrameData] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      parseMp4Samples(r.data).toSeq.flatMap(_.iterator.zipWithIndex.map {
        case ((off, sz), i) =>
          FrameData(r.doc_id, i, off,
            sz, java.util.Arrays.copyOfRange(r.data, off.toInt, off.toInt + sz))
      })
    }
  }

  /** Wrap each payload in a real A/V container: WAV for even doc_id
    * (channels/rate from n_chars-derived meta), MP4 for odd
    * (timescale/duration likewise). Mirrors [[encodeImageContainers]]. */
  def encodeAvStub(media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val n = r.data.length // == n_chars for the ASCII corpus
        if (r.doc_id % 2 == 0) {
          val ch = 1 + (r.meta.width % 2) // width parity == n_chars parity
          val rate = 8000 * (1 + r.meta.height % 3)
          r.copy(media_type = "audio", data = wavBytes(ch, rate, r.data),
            meta = r.meta.copy(codec = "pcm_s16le"))
        } else {
          val ts = 600 + r.meta.width % 1000
          r.copy(media_type = "video",
            data = mp4Bytes(ts, n.toLong * 40, r.data),
            meta = r.meta.copy(codec = "mp4"))
        }
      }
    }
  }

  /** REAL A/V metadata decode over the containers: WAV → channels +
    * sample rate + PCM duration; MP4 → mvhd duration. Unparseable
    * rows drop (quarantine in production). Narrow mapPartitions. */
  def decodeAv(media: Dataset[MediaRecord]): Dataset[AvInfo] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        parseWav(r.data).map { case (ch, rate, ms) =>
          AvInfo(r.doc_id, "wav", Some(ch), Some(rate), ms, r.data.length.toLong)
        }.orElse(parseMp4(r.data).map { ms =>
          AvInfo(r.doc_id, "mp4", None, None, ms, r.data.length.toLong)
        })
      }
    }
  }

  // ---- Real audio sample decode (PCM: the samples ARE the bytes) ----
  //
  // WAV/PCM is the one audio format whose SAMPLE tier needs no codec:
  // the data chunk is raw little-endian PCM. parsePcmSamples walks the
  // RIFF chunks (same hostile-size hygiene as parseWav), checks the
  // fmt says integer PCM (format 1) at 16-bit, and exposes the
  // samples; audioFeatures reduces them to the loudness/shape signals
  // an audio-corpus curation pass filters on. Compressed codecs (MP3,
  // AAC, format != 1) degrade to None — the q27 metadata tier still
  // covers them.

  /** Per-clip features over DECODED samples (integer-exact, so a SQL
    * oracle can replay them): count, Σ|s|, peak |s|, Σs² (energy; RMS
    * = sqrt(sum_sq/n) derivable), and sign-change count (the cheap
    * spectral-ish signal; silence → 0). */
  final case class AudioFeatures(doc_id: Long, channels: Int,
      sample_rate: Int, n_samples: Long, sum_abs: Long, peak: Int,
      sum_sq: Long, zero_crossings: Long)

  /** Parse a 16-bit integer-PCM WAV into (channels, rate, samples,
    * interleaved). None for malformed / non-PCM / non-16-bit. */
  def parsePcmSamples(data: Array[Byte]): Option[(Int, Int, Array[Short])] =
    parseAudioSamples(data).collect {
      case (ch, rate, "pcm_s16le", s) => (ch, rate, s)
    }

  /** G.711 μ-law expansion (8-bit companded byte → 16-bit linear):
    * bit-inverted sign/exponent/mantissa, magnitude
    * ((mant·8 + 132) << exp) − 132, max 32124. Identical to the
    * javax.sound.sampled ULAW converter (conformance-checked). */
  private[graft] def ulawToLinear(b: Int): Int = {
    val u = ~b & 0xff
    val exp = (u >> 4) & 7
    val mant = u & 0x0f
    val v = (((mant << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -v else v
  }

  /** G.711 μ-law COMPRESSION (16-bit linear → 8-bit companded byte),
    * the exact inverse pairing of [[ulawToLinear]] (round-trip
    * identity spec-pinned): bias by 132, find the segment (exponent),
    * take the 4 mantissa bits under it, bit-invert. Used by fixtures
    * that need a genuine lossy telephony re-encode of a PCM signal. */
  private[graft] def linearToUlaw(sample: Int): Int = {
    var x = sample
    val sign = if (x < 0) { x = -x; 0x80 } else 0
    if (x > 32635) x = 32635
    x += 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (x >> (exp + 3)) & 0x0f
    ~(sign | (exp << 4) | mant) & 0xff
  }

  /** G.711 A-law expansion: even-bit inversion (XOR 0x55), segment 0
    * linear, higher segments exponential; MSB SET means positive,
    * max 32256 (A-law has no true zero — silence decodes to ±8). */
  private[graft] def alawToLinear(b: Int): Int = {
    val a = b ^ 0x55
    val seg = (a >> 4) & 0x07
    var t = (a & 0x0f) << 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  /** WAV sample decode across the integer tiers a crawl contains:
    * fmt 1 (16-bit PCM — the bytes ARE the samples), fmt 6 (G.711
    * A-law) and fmt 7 (G.711 μ-law) expanded to 16-bit linear by the
    * standard companding arithmetic. Returns (channels, rate, codec,
    * samples); anything else (float, ADPCM, 24-bit) degrades to None
    * with the q27 metadata tier still covering it. */
  def parseAudioSamples(
      data: Array[Byte]): Option[(Int, Int, String, Array[Short])] =
    try {
      def u8(i: Int): Int = data(i) & 0xff
      def rdLe2(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def rdLe4(i: Int): Long =
        (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong | (u8(i + 3).toLong << 24)
      def tag(i: Int): String = new String(data, i, 4, "US-ASCII")
      if (data.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var pos = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // fmtCode, ch, rate, bits
      var dataAt = -1; var dataLen = 0
      while (pos + 8 <= data.length && (fmt.isEmpty || dataAt < 0)) {
        val id = tag(pos)
        val sz = rdLe4(pos + 4)
        if (id == "fmt " && sz >= 16 && pos + 8 + 16 <= data.length)
          fmt = Some((rdLe2(pos + 8), rdLe2(pos + 10), rdLe4(pos + 12).toInt,
            rdLe2(pos + 22)))
        else if (id == "data") {
          dataAt = pos + 8
          dataLen = math.min(sz, data.length - pos - 8L).toInt
        }
        val next = pos + 8L + sz + (sz & 1L)
        if (next <= pos || next > data.length) return {
          // tolerate a final truncated chunk only if both pieces found
          if (fmt.isDefined && dataAt >= 0) assemble(fmt.get, dataAt, dataLen)
          else None
        }
        pos = next.toInt
      }
      def assemble(f: (Int, Int, Int, Int), at: Int, len: Int)
          : Option[(Int, Int, String, Array[Short])] = {
        val (code, ch, rate, bits) = f
        if (ch <= 0 || rate <= 0) return None
        code match {
          case 1 if bits == 16 =>
            val n = len / 2
            val out = new Array[Short](n)
            var i = 0
            while (i < n) {
              out(i) = (u8(at + 2 * i) | (data(at + 2 * i + 1) << 8)).toShort
              i += 1
            }
            Some((ch, rate, "pcm_s16le", out))
          case 6 | 7 if bits == 8 =>
            val out = new Array[Short](len)
            var i = 0
            if (code == 6) while (i < len) {
              out(i) = alawToLinear(u8(at + i)).toShort; i += 1
            } else while (i < len) {
              out(i) = ulawToLinear(u8(at + i)).toShort; i += 1
            }
            Some((ch, rate, if (code == 6) "g711_alaw" else "g711_ulaw", out))
          case _ => None
        }
      }
      if (fmt.isEmpty || dataAt < 0) None else assemble(fmt.get, dataAt, dataLen)
    } catch { case _: Exception => None }

  /** REAL audio feature extraction over decoded PCM samples; non-PCM
    * payloads drop (quarantine semantics). Narrow mapPartitions —
    * audio bytes never shuffle, only the 7-field feature rows. */
  def audioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        parsePcmSamples(r.data).map { case (ch, rate, s) =>
          var sumAbs = 0L; var peak = 0; var sumSq = 0L; var zc = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toInt
            val a = math.abs(v)
            sumAbs += a
            if (a > peak) peak = a
            sumSq += v.toLong * v
            if (i > 0 && ((s(i - 1) < 0 && v >= 0) || (s(i - 1) >= 0 && v < 0)))
              zc += 1
            i += 1
          }
          AudioFeatures(r.doc_id, ch, rate, s.length.toLong, sumAbs, peak,
            sumSq, zc)
        }
      }
    }
  }

  final case class AudioFeaturesEx(doc_id: Long, codec: String,
      channels: Int, sample_rate: Int, n_samples: Long, sum_abs: Long,
      peak: Int, sum_sq: Long)

  /** [[audioFeatures]] across ALL integer sample tiers
    * ([[parseAudioSamples]]: 16-bit PCM + G.711 μ-law/A-law), with the
    * codec surfaced — the loudness/energy reductions are
    * codec-independent once samples are linear. Same narrow
    * mapPartitions shape; bytes never shuffle. */
  def audioFeaturesEx(media: Dataset[MediaRecord]): Dataset[AudioFeaturesEx] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        parseAudioSamples(r.data).map { case (ch, rate, codec, s) =>
          var sumAbs = 0L; var peak = 0; var sumSq = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toInt
            val a = math.abs(v)
            sumAbs += a
            if (a > peak) peak = a
            sumSq += v.toLong * v
            i += 1
          }
          AudioFeaturesEx(r.doc_id, codec, ch, rate, s.length.toLong,
            sumAbs, peak, sumSq)
        }
      }
    }
  }

  final case class MediaHash(doc_id: Long, ahash: Long)

  /** Byte-sample average hash: 60 evenly-strided payload bytes, bit i
    * set iff sample i ≥ the sample mean (compared as `v·cnt ≥ sum` —
    * integer-exact, no float mean). The byte-level stand-in for a
    * perceptual pHash: a real decoder would produce the 8×8 DCT grid
    * in this same mapPartitions and feed the SAME banding/hamming
    * pipeline (q91) — the dedup side is modality-independent.
    */
  def byteBandHash(media: Dataset[MediaRecord]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val n = r.data.length
        val stride = math.max(1, n / 60)
        val samples = (0 until 60).flatMap { i =>
          val p = i * stride
          if (p < n) Some((i, (r.data(p) & 0xff).toLong)) else None
        }
        val cnt = samples.size
        // A zero-length payload has no samples and therefore no
        // meaningful hash; emitting ahash=0 would make every pair of
        // empty payloads a spurious hamming-0 "near-duplicate", so
        // such records are excluded from fingerprinting entirely.
        if (cnt == 0) None
        else {
          val sum = samples.map(_._2).sum
          val hash = samples.foldLeft(0L) { case (acc, (i, v)) =>
            if (v * cnt >= sum) acc | (1L << i) else acc
          }
          Some(MediaHash(r.doc_id, hash))
        }
      }
    }
  }

  // ---- Perceptual (pixel-level) image fingerprint: dHash ----
  //
  // The byte-level tier above ([[byteBandHash]], q91) cannot see that
  // two RE-ENCODES of one image are the same picture — a PNG and a BMP
  // of identical pixels share no bytes. With four real pixel decoders
  // in-repo, the perceptual tier hashes what the image LOOKS like:
  // decode → integer luma → 9×8 box-mean grid → difference hash
  // (bit (r,c) = right neighbor brighter). Any lossless re-encode
  // (and, by design of dHash, small brightness/contrast shifts —
  // differences survive monotone tone changes) produces the same
  // 64 bits; the SAME banded-hamming candidate pipeline as q33/q91
  // then pairs them without an all-pairs join.

  final case class PerceptualHash(doc_id: Long, dhash: Long)

  /** Decode any supported still image to an integer luma surface:
    * (width, height, row-major BT.601 luma ints 0..255). Grayscale
    * sources pass through exactly ((77+150+29)·v >> 8 = v); undecodable
    * payloads → None (quarantine, same contract as the decoders). */
  def grayPixels(data: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    def luma(r: Int, g: Int, b: Int): Int = (77 * r + 150 * g + 29 * b) >> 8
    pngDecodePixels(data).map { case (w, h, ch, px) =>
      val out = new Array[Int](w * h)
      var i = 0
      while (i < out.length) {
        out(i) =
          if (ch == 1) px(i) & 0xff
          else luma(px(i * ch) & 0xff, px(i * ch + 1) & 0xff,
            px(i * ch + 2) & 0xff)
        i += 1
      }
      (w, h, out)
    }.orElse(jpegDecodePixels(data).map { case (w, h, ch, px) =>
      val out = new Array[Int](w * h)
      var i = 0
      while (i < out.length) {
        out(i) =
          if (ch == 1) px(i) & 0xff
          else luma(px(i * ch) & 0xff, px(i * ch + 1) & 0xff,
            px(i * ch + 2) & 0xff)
        i += 1
      }
      (w, h, out)
    }).orElse(Gif.decode(data).map { g =>
      val out = new Array[Int](g.width * g.height)
      var i = 0
      while (i < out.length) {
        val c = g.palette((g.indices(i) & 0xff) % g.palette.length)
        out(i) = luma((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff)
        i += 1
      }
      (g.width, g.height, out)
    }).orElse(Bmp.decode(data).map { b =>
      val out = new Array[Int](b.width * b.height)
      var i = 0
      while (i < out.length) {
        out(i) = luma(b.rgb(i * 3) & 0xff, b.rgb(i * 3 + 1) & 0xff,
          b.rgb(i * 3 + 2) & 0xff)
        i += 1
      }
      (b.width, b.height, out)
    })
  }

  /** 64-bit difference hash over a 9×8 box-mean grid: cell (r,c)
    * averages the pixel block rows [r·h/8, (r+1)·h/8) × cols
    * [c·w/9, (c+1)·w/9) (integer sums, truncating division — exact
    * and engine-replayable); bit r·8+c is set iff cell (r,c+1) >
    * cell (r,c). Needs w ≥ 9, h ≥ 8 (smaller images quarantine). */
  def dHash64(w: Int, h: Int, gray: Array[Int]): Option[Long] = {
    if (w < 9 || h < 8 || gray.length < w * h) return None
    val cell = Array.ofDim[Long](8, 9)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 9) {
        val r0 = r * h / 8; val r1 = (r + 1) * h / 8
        val c0 = c * w / 9; val c1 = (c + 1) * w / 9
        var sum = 0L
        var rr = r0
        while (rr < r1) {
          var cc = c0
          while (cc < c1) { sum += gray(rr * w + cc); cc += 1 }
          rr += 1
        }
        cell(r)(c) = sum / ((r1 - r0).toLong * (c1 - c0))
        c += 1
      }
      r += 1
    }
    var hash = 0L
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cell(r)(c + 1) > cell(r)(c)) hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    Some(hash)
  }

  /** Perceptual fingerprint per record: decode → luma → [[dHash64]].
    * Narrow mapPartitions — image bytes never shuffle, 16 bytes of
    * (id, hash) leave per record; undecodable or sub-9×8 payloads
    * quarantine (flatMap drops them, same contract as decodeImage). */
  def perceptualHash(media: Dataset[MediaRecord]): Dataset[PerceptualHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        grayPixels(r.data).flatMap { case (w, h, g) => dHash64(w, h, g) }
          .map(PerceptualHash(r.doc_id, _))
      }
    }
  }

  final case class PerceptualDctHash(doc_id: Long, phash: Long)

  /** Fixed-point cosine table for the 8-point DCT-II: index m holds
    * round(cos(m·π/16) · 1024) for m ∈ [0, 32). HARD-CODED (not
    * computed) so the DuckDB oracle inlines the SAME integer literals —
    * two engines evaluating `cos` independently risk a last-ulp
    * disagreement landing exactly on a median/threshold boundary;
    * fixed-point integers make the whole transform exact and
    * engine-replayable, the same determinism move as the box-mean's
    * truncating division. */
  private[operators] val DctCos1024: Array[Long] = Array(
    1024L, 1004L, 946L, 851L, 724L, 569L, 392L, 200L,
    0L, -200L, -392L, -569L, -724L, -851L, -946L, -1004L,
    -1024L, -1004L, -946L, -851L, -724L, -569L, -392L, -200L,
    0L, 200L, 392L, 569L, 724L, 851L, 946L, 1004L)

  /** 63-bit DCT perceptual hash (classic pHash family): 8×8 box-mean
    * grid (same `k·dim/8` boundary rule as [[dHash64]], truncating
    * integer division), integer 2D DCT-II through [[DctCos1024]], and
    * bit u·8+v−1 set iff AC coefficient F(u,v) exceeds the median of
    * the 63 AC coefficients (sorted index 31 — the exact middle). The
    * DC term is excluded (it is mean brightness, not structure) and
    * only bits 0..62 are used, so the hash is always non-negative —
    * no sign-bit gymnastics in SQL mirrors.
    *
    * Complements [[dHash64]]: dHash compares ADJACENT cell means, so
    * it keys on local edges; the DCT hash keys on the global frequency
    * envelope, surviving smooth rescales and small crops that shift
    * every dHash cell boundary at once. Magnitudes stay well inside
    * Long (255·1024²·64 < 2⁵⁴). Needs w ≥ 8, h ≥ 8. */
  def pHashDct64(w: Int, h: Int, gray: Array[Int]): Option[Long] = {
    if (w < 8 || h < 8 || gray.length < w * h) return None
    val cell = Array.ofDim[Long](8, 8)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val r0 = r * h / 8; val r1 = (r + 1) * h / 8
        val c0 = c * w / 8; val c1 = (c + 1) * w / 8
        var sum = 0L
        var rr = r0
        while (rr < r1) {
          var cc = c0
          while (cc < c1) { sum += gray(rr * w + cc); cc += 1 }
          rr += 1
        }
        cell(r)(c) = sum / ((r1 - r0).toLong * (c1 - c0))
        c += 1
      }
      r += 1
    }
    val f = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var rr = 0
        while (rr < 8) {
          var cc = 0
          while (cc < 8) {
            acc += cell(rr)(cc) *
              DctCos1024(((2 * rr + 1) * u) % 32) *
              DctCos1024(((2 * cc + 1) * v) % 32)
            cc += 1
          }
          rr += 1
        }
        f(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    val sorted = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(sorted)
    val med = sorted(31)
    var hash = 0L
    var i = 1
    while (i < 64) {
      if (f(i) > med) hash |= 1L << (i - 1)
      i += 1
    }
    Some(hash)
  }

  /** [[perceptualHash]]'s DCT sibling: decode → luma → [[pHashDct64]].
    * Same narrow shape — bytes never shuffle, 16 bytes out per record,
    * undecodable or sub-8×8 payloads quarantine. */
  def perceptualHashDct(media: Dataset[MediaRecord]): Dataset[PerceptualDctHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        grayPixels(r.data).flatMap { case (w, h, g) => pHashDct64(w, h, g) }
          .map(PerceptualDctHash(r.doc_id, _))
      }
    }
  }

  /** Deterministic re-encode fixture for the perceptual-dedup oracle:
    * documents in the same GROUP (doc_id / 3) share one 18×16
    * grayscale pixel buffer — px(r,c) = ((g+1)·(19r + 7c² + 3) +
    * (g/256)·(23r + 5c + 17)) mod 256, group-dependent through the
    * mod-256 wrap with a g/256-keyed term breaking the 256-group
    * period (surfaces repeat only every 65536 groups, keeping true
    * pair mass near-linear at scale) — but each variant (doc_id mod 3)
    * ships it in a DIFFERENT real container: grayscale PNG, 24-bit
    * BMP, or 256-gray-palette GIF. All three are lossless, so the
    * decoded luma (and hence the dHash) matches exactly within a
    * group while the raw BYTES share nothing — exactly the case the
    * byte-level q91 tier cannot pair and this tier must. */
  def encodePerceptualFixture(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    val W = 18; val H = 16
    // balance the 1-row-group dev scan so the per-id encode (and the
    // decode stages that inherit this partitioning) use every core
    graft.QueryUtil.balanced(documents.select("doc_id")).as[Long].map { id =>
      val g = id / 3
      val px = new Array[Byte](W * H)
      var r = 0
      while (r < H) {
        var c = 0
        while (c < W) {
          // second term keyed by g/256 breaks the mod-256 period of the
          // first: without it, group surfaces repeat every 256 groups
          // and the TRUE near-dup pair mass grows quadratically with
          // corpus size (measured as a ~5e8-pair blowup at sf10 in
          // round 10) — surfaces now repeat only every 65536 groups.
          // For g < 256 the added term is 0, so small-SF results (and
          // every oracle row the driver checks) are unchanged.
          px(r * W + c) =
            (((g + 1L) * (19L * r + 7L * c * c + 3L)
              + (g / 256L) * (23L * r + 5L * c + 17L)) % 256L).toByte
          c += 1
        }
        r += 1
      }
      val data = (id % 3) match {
        case 0 => pngEncode(W, H, 1, px)
        case 1 =>
          val rgb = new Array[Byte](W * H * 3)
          var i = 0
          while (i < W * H) {
            rgb(i * 3) = px(i); rgb(i * 3 + 1) = px(i); rgb(i * 3 + 2) = px(i)
            i += 1
          }
          Bmp.bmpBytes(W, H, rgb)
        case _ =>
          val palette = Array.tabulate(256)(i => (i << 16) | (i << 8) | i)
          Gif.gifBytes(W, H, palette, px)
      }
      val codec = (id % 3) match {
        case 0 => "png"; case 1 => "bmp"; case _ => "gif"
      }
      MediaRecord(id, "image", data, MediaMeta(W, H, codec, 1))
    }
  }

  /** One frame-level perceptual fingerprint of a video: the frame's
    * [[pHashDct64]] keyed by (video, temporal position). */
  final case class VideoFrameHash(doc_id: Long, frame_idx: Int, phash: Long)

  /** Per-frame DCT perceptual fingerprints for VIDEO near-dup: demux
    * each MP4's sample table ([[frameExtract]]), decode every MJPEG
    * frame ([[jpegDecodePixels]]), and reduce it to its
    * [[pHashDct64]]. Narrow end to end — container and frame bytes
    * never shuffle; what leaves the scan is ~20 bytes per frame, the
    * video's temporal signature spread over (doc_id, frame_idx,
    * phash) rows. Undecodable or sub-8×8 frames quarantine, same
    * contract as [[perceptualHashDct]]. */
  def videoFrameHashes(media: Dataset[MediaRecord]): Dataset[VideoFrameHash] = {
    import media.sparkSession.implicits._
    frameExtract(media).mapPartitions { it =>
      it.flatMap { f =>
        jpegDecodePixels(f.data).flatMap { case (w, h, _, px) =>
          val gray = new Array[Int](w * h)
          var i = 0
          while (i < gray.length) { gray(i) = px(i) & 0xff; i += 1 }
          pHashDct64(w, h, gray)
        }.map(VideoFrameHash(f.doc_id, f.frame_idx, _))
      }
    }
  }

  /** Deterministic RE-ENCODE fixture for video-level perceptual
    * near-dup (the moving-picture analog of
    * [[encodePerceptualFixture]]): documents in the same GROUP
    * (doc_id / 2) share one frame SEQUENCE — (g%3)+1 frames, frame f
    * an 8×8 grid of constant blocks with block b valued
    * ((g+1)·((11+13f)·b + 7b² + 3) + (g/256)·(19b + 29f + 5)) mod 256 — but
    * the two variants (doc_id mod 2) encode it at DIFFERENT
    * resolutions: 64×64 (8×8 blocks) and 128×128 (16×16 blocks). Both
    * keep every JPEG MCU inside one constant block, so the lossy
    * codec is bit-exact (q113's flat-Q property), and the 8×8
    * box-mean grid of BOTH variants reduces to the same 8×8 cell
    * matrix (cell = its block's value) — identical [[pHashDct64]] per
    * aligned frame — while the container bytes share nothing
    * (different dimensions change every JPEG stream, stsz, stco).
    *
    * The FULL 8×8 grid of independent block values matters for pair
    * mass, not just realism: a first cut used 2×2 quadrant blocks,
    * and a 4-value cell matrix excites so few DCT frequencies that
    * most AC coefficients tie at zero — hashes cluster and the ≤6
    * hamming gate paired ~45% of ALL cross-group videos (112k pairs
    * from 500 fixture videos; quadratic death at sf10). With 64
    * independent values the AC spectrum is dense, cross-group
    * hamming concentrates near 31, and surviving pairs are the
    * intended within-group ones. The (g/256)-keyed term breaks the
    * mod-256 group period exactly as the image fixture's does
    * (identical surfaces only every 65536 groups — the r10 sf10
    * pair-mass lesson); it is 0 for g < 256, so small-SF oracle rows
    * are unaffected. */
  def encodeVideoPerceptualFixture(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    // balance the 1-row-group dev scan: MP4 encode + per-frame JPEG
    // decode + DCT all inherit this partitioning (guide §2.6)
    graft.QueryUtil.balanced(documents.select("doc_id")).as[Long].map { id =>
      val g = id / 2
      val nf = (g % 3).toInt + 1
      val scale = (id % 2).toInt + 1 // 1 → 64×64, 2 → 128×128
      val dim = 64 * scale
      val blk = 8 * scale
      val frames = (0 until nf).map { f =>
        val px = new Array[Byte](dim * dim)
        var y = 0
        while (y < dim) {
          var x = 0
          while (x < dim) {
            val b = (y / blk) * 8 + (x / blk)
            // (g+1) MULTIPLIES the spatial pattern (the image
            // fixture's construction) and f sits INSIDE the linear-b
            // coefficient — both lessons measured, not guessed:
            // additive group terms only shift the matrix by a
            // constant, whose sole hash effect is where the mod-256
            // wrap lands, so group hashes clustered and the ≤6 gate
            // kept thousands of cross-group pairs at 500 videos
            // (quadratic at scale); an additive 13f likewise made
            // CONSECUTIVE FRAMES constant-shifts of each other and
            // their hashes collapsed. Multiplying gives each group a
            // different effective spatial frequency and each frame a
            // different ramp slope; the 7b² term keeps the pattern
            // nonlinear in b; the (g/256)-keyed term breaks the
            // mod-256 group period.
            px(y * dim + x) =
              (((g + 1L) * ((11L + 13L * f) * b + 7L * b.toLong * b + 3L)
                + (g / 256L) * (19L * b + 29L * f + 5L))
                % 256L).toByte
            x += 1
          }
          y += 1
        }
        jpegEncode(dim, dim, 1, px)
      }
      MediaRecord(id, "video", mp4VideoBytes(frames),
        MediaMeta(dim, dim, "mjpeg", nf))
    }
  }
}
