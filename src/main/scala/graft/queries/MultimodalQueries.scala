package graft.queries

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}
import graft.operators.{Audio, Bmp, Exif, Gif, Mp3, Multimodal, Tiff, Webp}

/** Multimodal query inventory: binary payload + typed metadata through
  * mapPartitions batch workers — a REAL PNG/JPEG header decode (q38)
  * plus the frame-sample/byte-hash pixel-level stubs (q39, q91). The
  * documents' text is ASCII, so the stub oracles recompute byte
  * arithmetic with ascii()/length.
  */
object MultimodalQueries {

  /** q38 — REAL image-header decode per media record: each payload is
    * wrapped in a genuine PNG (signature + IHDR, real CRC-32) or JPEG
    * (SOI + APP0 + SOF0) container, and the decode side recovers
    * (format, width, height, channels) by actually parsing those bytes
    * — signature check, chunk read, marker scan — in the same
    * mapPartitions batch shape as the pixel-level stubs. The oracle
    * recomputes the expected values from the documents table via the
    * same derivations the encoder used (dims from n_chars, format from
    * doc_id parity, header size 33/39 bytes by format/channels), so a
    * parse defect at any byte offset breaks the compare. */
  val q38 = QuerySpec("q38_media_features",
    (s, dir) => Multimodal.decodeImage(
        Multimodal.encodeImageContainers(
          Multimodal.ingest(Tables(s, dir, "documents"))))
      .toDF()
      .select(col("doc_id"), col("format"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"),
        col("n_bytes"))
      .orderBy("doc_id"),
    Some(raw"""
SELECT doc_id,
  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
  CAST(n_chars % 640 + 64 AS BIGINT) AS width,
  CAST(n_chars % 480 + 48 AS BIGINT) AS height,
  CAST(CASE WHEN n_chars % 2 = 0 THEN 1 ELSE 3 END AS BIGINT) AS channels,
  CAST(octet_length(encode(text)) +
    CASE WHEN doc_id % 2 = 0 THEN 33
         WHEN n_chars % 2 = 0 THEN 33 ELSE 39 END AS BIGINT) AS n_bytes
FROM documents ORDER BY doc_id
"""))

  /** q39 — frame sampling: one row per sampled frame of each video
    * payload, checksumming the real byte at each 64-byte stride. The
    * oracle's frame generator is sized from the data itself
    * (max nFrames over the table), not a hard cap, so longer documents
    * can never silently fall outside the compared range. */
  val q39 = QuerySpec("q39_frame_sample",
    (s, dir) => Multimodal.frameSampleStub(
        Multimodal.ingest(Tables(s, dir, "documents")))
      .toDF()
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_off"), col("frame_checksum"))
      .orderBy("doc_id", "frame_idx"),
    Some(raw"""
SELECT d.doc_id, f.i AS frame_idx, f.i * 64 AS frame_off,
  CASE WHEN f.i * 64 < length(d.text)
       THEN CAST(ascii(d.text[CAST(f.i * 64 + 1 AS BIGINT)]) AS BIGINT)
       ELSE -1 END AS frame_checksum
FROM documents d
JOIN (SELECT unnest(range(0, (SELECT MAX(n_chars) // 100 + 1 FROM documents))) AS i) f
  ON f.i < d.n_chars // 100 + 1
WHERE d.doc_id % 3 = 0
ORDER BY doc_id, frame_idx
"""))

  /** q91 — media near-duplicates: byte-sample average hash per payload
    * (mapPartitions worker, `Multimodal.byteBandHash`) → the SAME
    * banded-hamming candidate pipeline the text SimHash uses (q33) —
    * dedup over media is modality-independent once a fingerprint
    * exists. The hash is integer-exact (bit i: sample·cnt ≥ sum), so
    * the oracle recomputes it from the same bytes.
    */
  val q91 = QuerySpec("q91_media_neardup",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      val hashes = graft.CacheRegistry.persistTracked(
        Multimodal.byteBandHash(
          Multimodal.ingest(Tables(s, dir, "documents"))).toDF())
      val banded = hashes.select(col("doc_id"), col("ahash"),
          explode(expr("sequence(0, 3)")).as("band"))
        .withColumn("bval",
          when(col("band") === 0, col("ahash").bitwiseAND(lit(0x7FFFL)))
            .when(col("band") === 1,
              shiftright(col("ahash"), 15).bitwiseAND(lit(0x7FFFL)))
            .when(col("band") === 2,
              shiftright(col("ahash"), 30).bitwiseAND(lit(0x7FFFL)))
            .otherwise(shiftright(col("ahash"), 45).bitwiseAND(lit(0x7FFFL))))
      val cand = banded.as("x").join(banded.as("y"), Seq("band", "bval"))
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          col("x.ahash").as("ha"), col("y.ahash").as("hb"))
        .distinct()
      cand.withColumn("hamming",
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .where(col("hamming") <= 8)
        .select("a", "b", "hamming")
        .orderBy("a", "b")
    },
    Some(raw"""
WITH base AS (
  SELECT doc_id, text, length(text) AS n,
    greatest(1, length(text) // 60) AS stride
  FROM documents
), sampled AS (
  SELECT doc_id, i, ascii(text[CAST(i * stride + 1 AS BIGINT)]) AS v
  FROM (SELECT doc_id, text, n, stride, unnest(range(0, 60)) AS i FROM base)
  WHERE i * stride + 1 <= n
), stats AS (
  SELECT doc_id, count(*) AS cnt, CAST(sum(v) AS BIGINT) AS s
  FROM sampled GROUP BY doc_id
), sh AS (
  SELECT sampled.doc_id,
    CAST(sum(CASE WHEN v * cnt >= s THEN (1::BIGINT << CAST(i AS INT))
             ELSE 0 END) AS BIGINT) AS ahash
  FROM sampled JOIN stats ON sampled.doc_id = stats.doc_id
  GROUP BY sampled.doc_id
), banded AS (
  SELECT doc_id, ahash, b AS band,
    (ahash >> (15 * b)) & 32767 AS bval
  FROM sh, (SELECT unnest(range(0, 4)) AS b)
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
    x.ahash AS ha, y.ahash AS hb
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id
)
SELECT a, b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 8 ORDER BY a, b
"""))

  /** q27 — REAL audio/video container decode: WAV (RIFF chunk
    * traversal to fmt/data, little-endian; a JUNK chunk must be
    * skipped by size) and MP4 (box scan into moov → mvhd, big-endian;
    * a free box must be skipped). The parsed channels / sample rate /
    * duration are compared against the oracle's independent
    * re-derivation, integer division mirrored exactly. */
  val q27 = QuerySpec("q27_av_features",
    (s, dir) => Multimodal.decodeAv(
        Multimodal.encodeAvStub(
          Multimodal.ingest(Tables(s, dir, "documents"))))
      .toDF()
      .select(col("doc_id"), col("format"),
        col("channels").cast("long").as("channels"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("duration_ms"), col("n_bytes"))
      .orderBy("doc_id"),
    Some(raw"""
SELECT doc_id,
  CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'mp4' END AS format,
  CASE WHEN doc_id % 2 = 0 THEN CAST(1 + n_chars % 2 AS BIGINT) END AS channels,
  CASE WHEN doc_id % 2 = 0 THEN CAST(8000 * (1 + n_chars % 3) AS BIGINT) END
    AS sample_rate,
  CAST(CASE WHEN doc_id % 2 = 0
       THEN octet_length(encode(text)) // ((1 + n_chars % 2) * 2) * 1000
            // (8000 * (1 + n_chars % 3))
       ELSE octet_length(encode(text)) * 40 * 1000
            // (600 + (n_chars % 640 + 64)) END AS BIGINT) AS duration_ms,
  CAST(octet_length(encode(text)) +
    CASE WHEN doc_id % 2 = 0 THEN 56 ELSE 156 END AS BIGINT) AS n_bytes
FROM documents ORDER BY doc_id
"""))

  /** q102 — REAL PNG pixel decode: each document synthesizes a
    * deterministic sample grid (vᵢ = (doc_id·31 + i·7) mod 256 over
    * w·h·ch samples, dims keyed off doc_id, grayscale/RGB by parity),
    * encodes it as a standards-conformant PNG whose scanlines cycle
    * through ALL five filter types (none/sub/up/average/paeth), then
    * decodes the pixels back via zlib inflate + per-row defilter and
    * reduces them — count, exact sum, the position-weighted sum
    * Σ(i+1)·vᵢ, and integer mean. The oracle regenerates the same
    * samples arithmetically (compression and filtering are invisible
    * to it), so ANY defect in deflate framing, chunk CRCs, inflate,
    * or any of the five defilters shifts a byte and breaks the
    * compare. Encode and decode both run inside one narrow
    * mapPartitions — pixel bytes never shuffle. */
  val q102 = QuerySpec("q102_png_pixels",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val dims = docs.select(col("doc_id"),
          (col("doc_id") % 24 + 8).cast("int").as("w"),
          (col("doc_id") % 16 + 6).cast("int").as("h"),
          when(col("doc_id") % 2 === 0, 1).otherwise(3).cast("int").as("ch"))
        .as[(Long, Int, Int, Int)]
      val media = graft.QueryUtil.balanced(dims).mapPartitions { it =>
        it.map { case (id, w, h, ch) =>
          val px = Array.tabulate(w * h * ch)(i =>
            ((id * 31 + i.toLong * 7) % 256).toByte)
          Multimodal.MediaRecord(id, "image",
            Multimodal.pngEncode(w, h, ch, px),
            Multimodal.MediaMeta(w, h, "png", 1))
        }
      }
      Multimodal.decodePixelFeatures(media).toDF().orderBy("doc_id")
    },
    Some(raw"""
WITH dims AS (
  SELECT doc_id,
    CAST(doc_id % 24 + 8 AS INT) AS width,
    CAST(doc_id % 16 + 6 AS INT) AS height,
    CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT) AS channels
  FROM documents
), idx AS (
  SELECT doc_id, width, height, channels,
    unnest(range(0, CAST(width AS BIGINT) * height * channels)) AS i
  FROM dims
), px AS (
  SELECT doc_id, width, height, channels, i,
    (doc_id * 31 + i * 7) % 256 AS v
  FROM idx
)
SELECT doc_id, width, height, channels,
  count(*) AS n_samples,
  CAST(sum(v) AS BIGINT) AS sum_v,
  CAST(sum((i + 1) * v) AS BIGINT) AS wsum,
  CAST(sum(v) // count(*) AS BIGINT) AS mean_luma
FROM px GROUP BY doc_id, width, height, channels ORDER BY doc_id
"""))

  /** q113 — REAL baseline JPEG pixel decode (ITU-T T.81: Huffman
    * entropy decode, dequantize, IDCT, level shift — no codec
    * library): each document synthesizes a grayscale image of
    * CONSTANT 8×8 blocks (block b of doc d has value
    * (d·37 + b·11) mod 256, dims multiples of 8 keyed off doc_id),
    * encodes it as a baseline JFIF JPEG, decodes the pixels back and
    * reduces them with the same features as q102. Constant blocks
    * carry only a DC coefficient, which the flat Q=8 table quantizes
    * WITHOUT remainder — so the lossy-in-general codec is bit-exact
    * on this corpus and the oracle can regenerate every sample
    * arithmetically. Any defect in the writer's DHT/DQT framing, the
    * entropy coder, byte stuffing, the Huffman decode, dequant, or
    * IDCT normalization shifts a sample and breaks the compare
    * (general content + javax.imageio conformance are spec-covered:
    * JpegPixelSpec). Encode and decode both run inside one narrow
    * mapPartitions — pixel bytes never shuffle. */
  val q113 = QuerySpec("q113_jpeg_pixels",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val dims = docs.select(col("doc_id"),
          ((col("doc_id") % 3 + 2) * 8).cast("int").as("w"),
          ((col("doc_id") % 2 + 2) * 8).cast("int").as("h"))
        .as[(Long, Int, Int)]
      val media = graft.QueryUtil.balanced(dims).mapPartitions { it =>
        it.map { case (id, w, h) =>
          val bpr = w / 8
          val px = Array.tabulate(w * h) { i =>
            val x = i % w; val y = i / w
            ((id * 37 + ((y / 8) * bpr + x / 8).toLong * 11) % 256).toByte
          }
          Multimodal.MediaRecord(id, "image",
            Multimodal.jpegEncode(w, h, 1, px),
            Multimodal.MediaMeta(w, h, "jpeg", 1))
        }
      }
      Multimodal.decodePixelFeatures(media).toDF().orderBy("doc_id")
    },
    Some(raw"""
WITH dims AS (
  SELECT doc_id,
    CAST((doc_id % 3 + 2) * 8 AS INT) AS width,
    CAST((doc_id % 2 + 2) * 8 AS INT) AS height
  FROM documents
), idx AS (
  SELECT doc_id, width, height,
    unnest(range(0, CAST(width AS BIGINT) * height)) AS i
  FROM dims
), px AS (
  SELECT doc_id, width, height, i,
    (doc_id * 37 + ((i // width) // 8 * (width // 8) + (i % width) // 8) * 11) % 256 AS v
  FROM idx
)
SELECT doc_id, width, height, CAST(1 AS INT) AS channels,
  count(*) AS n_samples,
  CAST(sum(v) AS BIGINT) AS sum_v,
  CAST(sum((i + 1) * v) AS BIGINT) AS wsum,
  CAST(sum(v) // count(*) AS BIGINT) AS mean_luma
FROM px GROUP BY doc_id, width, height ORDER BY doc_id
"""))

  /** q114 — REAL video frame extraction: each document synthesizes an
    * MP4 whose moov carries a genuine stsd/stts/stsc/stsz/stco sample
    * table over (doc_id % 3 + 1) MJPEG frames — each frame a 16×16
    * constant-8×8-block grayscale JPEG (block b of frame f in doc d
    * has value (d·37 + f·13 + b·11) mod 256). `frameExtract` demuxes
    * by the same box arithmetic any player uses (stsc runs × stco
    * offsets + stsz prefix sums), slices the real frame bytes, and
    * `jpegDecodePixels` turns them into pixels — container → frames →
    * pixels, fully real, no codec library. Uniform blocks make the
    * lossy codec bit-exact (q113's flat-Q=8 property), so the oracle
    * regenerates every frame's pixel sum arithmetically: 2×2 blocks of
    * 64 pixels each. Any defect in the writer's table layout, the
    * demux arithmetic, or the slice bounds shifts a frame and breaks
    * the compare. Narrow end to end: media bytes never shuffle. */
  val q114 = QuerySpec("q114_frame_extract",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("doc_id"),
        (col("doc_id") % 3 + 1).cast("int").as("nf")).as[(Long, Int)]
      val media = graft.QueryUtil.balanced(base).mapPartitions { it =>
        it.map { case (id, nf) =>
          val (w, h) = (16, 16)
          val bpr = w / 8
          val frames = (0 until nf).map { f =>
            val px = Array.tabulate(w * h) { i =>
              val x = i % w; val y = i / w
              ((id * 37 + f.toLong * 13 +
                ((y / 8) * bpr + x / 8).toLong * 11) % 256).toByte
            }
            Multimodal.jpegEncode(w, h, 1, px)
          }
          Multimodal.MediaRecord(id, "video", Multimodal.mp4VideoBytes(frames),
            Multimodal.MediaMeta(w, h, "mjpeg", nf))
        }
      }
      Multimodal.frameExtract(media).mapPartitions { it =>
        it.flatMap { f =>
          Multimodal.jpegDecodePixels(f.data).map { case (w, h, _, px) =>
            var sum = 0L; var i = 0
            while (i < px.length) { sum += px(i) & 0xff; i += 1 }
            (f.doc_id, f.frame_idx, w, h, sum, sum / px.length)
          }
        }
      }.toDF("doc_id", "frame_idx", "width", "height", "sum_v", "mean_luma")
        .orderBy("doc_id", "frame_idx")
    },
    Some(raw"""
WITH f AS (
  SELECT doc_id, unnest(range(0, doc_id % 3 + 1)) AS frame_idx FROM documents
), b AS (
  SELECT doc_id, frame_idx, unnest(range(0, 4)) AS blk FROM f
), v AS (
  SELECT doc_id, frame_idx, (doc_id * 37 + frame_idx * 13 + blk * 11) % 256 AS val
  FROM b
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
  CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
  CAST(sum(val) * 64 AS BIGINT) AS sum_v,
  CAST(sum(val) * 64 // 256 AS BIGINT) AS mean_luma
FROM v GROUP BY doc_id, frame_idx ORDER BY doc_id, frame_idx
"""))

  /** q115 — REAL audio sample decode: each document synthesizes a
    * 16-bit PCM WAV whose sample i is ((doc_id·31 + i·7) mod 65536) −
    * 32768 (full signed range, deterministic), n = doc_id % 50 + 20
    * samples, channels/rate keyed off doc_id. `audioFeatures` walks
    * the RIFF chunks, checks integer-PCM/16-bit, decodes the
    * little-endian samples and reduces them integer-exactly — count,
    * Σ|s|, peak, Σs² (energy), sign-change count. PCM is the one
    * audio tier needing no codec: the bytes ARE the samples, so this
    * is fully real, and the oracle replays every sample
    * arithmetically. Any defect in chunk traversal, the LE int16
    * read, or the reductions breaks the compare. Narrow
    * mapPartitions; audio bytes never shuffle. */
  val q115 = QuerySpec("q115_audio_features",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("doc_id"),
        (col("doc_id") % 50 + 20).cast("int").as("n"),
        (col("doc_id") % 2 + 1).cast("int").as("ch"),
        ((col("doc_id") % 3 + 1) * 8000).cast("int").as("rate"))
        .as[(Long, Int, Int, Int)]
      val media = graft.QueryUtil.balanced(base).mapPartitions { it =>
        it.map { case (id, n, ch, rate) =>
          val payload = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val v = (((id * 31 + i.toLong * 7) % 65536) - 32768).toInt
            payload(2 * i) = v.toByte
            payload(2 * i + 1) = (v >> 8).toByte
            i += 1
          }
          Multimodal.MediaRecord(id, "audio",
            Multimodal.wavBytes(ch, rate, payload),
            Multimodal.MediaMeta(ch, rate, "pcm_s16le", 1))
        }
      }
      Multimodal.audioFeatures(media).toDF().orderBy("doc_id")
    },
    Some(raw"""
WITH base AS (
  SELECT doc_id,
    CAST(doc_id % 50 + 20 AS INT) AS n,
    CAST(doc_id % 2 + 1 AS INT) AS channels,
    CAST((doc_id % 3 + 1) * 8000 AS INT) AS sample_rate
  FROM documents
), idx AS (
  SELECT doc_id, channels, sample_rate, n,
    unnest(range(0, CAST(n AS BIGINT))) AS i
  FROM base
), smp AS (
  SELECT doc_id, channels, sample_rate, i,
    (doc_id * 31 + i * 7) % 65536 - 32768 AS v
  FROM idx
), lagged AS (
  SELECT doc_id, channels, sample_rate, i, v,
    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
  FROM smp
)
SELECT doc_id, channels, sample_rate,
  count(*) AS n_samples,
  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
  CAST(max(abs(v)) AS INT) AS peak,
  CAST(sum(v * v) AS BIGINT) AS sum_sq,
  CAST(sum(CASE WHEN pv IS NOT NULL AND
    ((pv < 0 AND v >= 0) OR (pv >= 0 AND v < 0)) THEN 1 ELSE 0 END) AS BIGINT)
    AS zero_crossings
FROM lagged
GROUP BY doc_id, channels, sample_rate ORDER BY doc_id
"""))

  /** q118 — spectral audio features through a REAL radix-2 FFT
    * ([[graft.operators.Audio.fft]], implemented in-repo): each
    * document synthesizes a mono 8 kHz WAV carrying a pure tone whose
    * frequency sits exactly on FFT bin k = 3 + doc_id % 120 of a
    * 256-sample window (f = k·8000/256 Hz), for 1 + n_chars % 4
    * windows. Bin-centered tones leak zero energy into other bins
    * (rectangular window, integer periods per frame), so the decoded
    * dominant bin must equal k EXACTLY — through WAV container
    * parsing, LE int16 decode, framing, bit-reversal, butterflies and
    * the magnitude argmax — and the band is its quarter of the
    * spectrum. The oracle replays k and the window count
    * arithmetically from the table. Narrow mapPartitions; audio bytes
    * never shuffle. */
  val q118 = QuerySpec("q118_audio_spectral",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("doc_id"),
        (lit(3) + col("doc_id") % 120).cast("int").as("k"),
        (lit(1) + col("n_chars") % 4).cast("int").as("nwin"))
        .as[(Long, Int, Int)]
      val media = graft.QueryUtil.balanced(base).mapPartitions { it =>
        it.map { case (id, k, nWin) =>
          val n = nWin * 256
          val payload = new Array[Byte](2 * n)
          var i = 0
          while (i < n) {
            val v = math.round(12000.0 *
              math.sin(2.0 * math.Pi * k * (i % 256) / 256.0)).toInt
            payload(2 * i) = v.toByte
            payload(2 * i + 1) = (v >> 8).toByte
            i += 1
          }
          Multimodal.MediaRecord(id, "audio",
            Multimodal.wavBytes(1, 8000, payload),
            Multimodal.MediaMeta(1, 8000, "pcm_s16le", 1))
        }
      }
      Audio.spectralFeatures(media, 256).toDF().orderBy("doc_id")
    },
    Some(raw"""
SELECT doc_id,
  CAST(8000 AS INT) AS sample_rate,
  CAST((1 + n_chars % 4) * 256 AS BIGINT) AS n_samples,
  CAST(1 + n_chars % 4 AS BIGINT) AS n_windows,
  CAST(3 + doc_id % 120 AS INT) AS dominant_bin,
  CAST((3 + doc_id % 120) // 32 AS INT) AS dominant_band
FROM documents ORDER BY doc_id
"""))

  /** q120 — REAL GIF pixel decode ([[graft.operators.Gif]]): each
    * document synthesizes a complete single-frame GIF89a — power-of-two
    * global palette (4/8/16 colors by id), graphic-control extension
    * (decode must skip it), LZW-compressed index stream — and
    * `gifFeatures` recovers the pixels through sub-block reassembly +
    * full variable-width LZW (dictionary growth, clear handling) +
    * palette mapping. Index and per-channel sums are integer-exact, so
    * the oracle replays every pixel arithmetically; any defect in the
    * bit unpacker, dictionary bookkeeping, or palette indexing breaks
    * the compare. Narrow mapPartitions; image bytes never shuffle. */
  val q120 = QuerySpec("q120_gif_pixels",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("doc_id"),
        (lit(5) + col("doc_id") % 12).cast("int").as("w"),
        (lit(4) + col("n_chars") % 10).cast("int").as("h"),
        (lit(4) * pow(lit(2), col("doc_id") % 3)).cast("int").as("c"))
        .as[(Long, Int, Int, Int)]
      val media = graft.QueryUtil.balanced(base).mapPartitions { it =>
        it.map { case (id, w, h, c) =>
          val palette = Array.tabulate(c) { j =>
            (((j * 37) % 256) << 16) | (((j * 59 + 7) % 256) << 8) |
              ((j * 83 + 13) % 256)
          }
          val idx = new Array[Byte](w * h)
          var i = 0
          while (i < idx.length) {
            idx(i) = (((id * 7 + i.toLong * 3) % c).toInt).toByte
            i += 1
          }
          Multimodal.MediaRecord(id, "image", Gif.gifBytes(w, h, palette, idx),
            Multimodal.MediaMeta(w, h, "gif", 1))
        }
      }
      Gif.gifFeatures(media).toDF().orderBy("doc_id")
    },
    Some(raw"""
WITH base AS (
  SELECT doc_id,
    CAST(5 + doc_id % 12 AS INT) AS w,
    CAST(4 + n_chars % 10 AS INT) AS h,
    CAST(CASE doc_id % 3 WHEN 0 THEN 4 WHEN 1 THEN 8 ELSE 16 END AS INT) AS c
  FROM documents
), px AS (
  SELECT doc_id, w, h, c, unnest(range(0, CAST(w * h AS BIGINT))) AS i
  FROM base
), v AS (
  SELECT doc_id, w, h, c, (doc_id * 7 + i * 3) % c AS idx FROM px
)
SELECT doc_id, w AS width, h AS height,
  CAST(count(*) AS BIGINT) AS n_pixels,
  CAST(sum(idx) AS BIGINT) AS sum_index,
  CAST(sum((idx * 37) % 256) AS BIGINT) AS sum_red,
  CAST(sum((idx * 59 + 7) % 256) AS BIGINT) AS sum_green,
  CAST(sum((idx * 83 + 13) % 256) AS BIGINT) AS sum_blue,
  CAST(c AS INT) AS n_colors
FROM v GROUP BY doc_id, w, h, c ORDER BY doc_id
"""))

  /** q122 — animated-GIF frame extraction (the GIF analog of q114's
    * MP4 demux): each document synthesizes a multi-frame GIF89a —
    * 1–3 full-screen frames, odd frames carrying a LOCAL 4-color
    * palette (decode must switch tables per frame), even frames using
    * the global 8-color one — and [[graft.operators.Gif.gifFrames]]
    * re-derives one row per frame through per-frame LZW + palette
    * resolution. Index sums and integer BT.601 luma sums are exact,
    * so the oracle replays every pixel of every frame; a defect in
    * frame iteration, local-table handling, or the luma arithmetic
    * breaks the compare. */
  val q122 = QuerySpec("q122_gif_frames",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("doc_id"),
        (lit(6) + col("doc_id") % 8).cast("int").as("w"),
        (lit(5) + col("n_chars") % 7).cast("int").as("h"),
        (lit(1) + col("doc_id") % 3).cast("int").as("nf"))
        .as[(Long, Int, Int, Int)]
      val globalPal = Array.tabulate(8) { j =>
        (((j * 37) % 256) << 16) | (((j * 59 + 7) % 256) << 8) |
          ((j * 83 + 13) % 256)
      }
      val localPal = Array.tabulate(4) { j =>
        (((j * 41 + 3) % 256) << 16) | (((j * 67 + 11) % 256) << 8) |
          ((j * 89 + 17) % 256)
      }
      val media = graft.QueryUtil.balanced(base).mapPartitions { it =>
        it.map { case (id, w, h, nf) =>
          val frames = (0 until nf).map { f =>
            val sz = if (f % 2 == 1) 4 else 8
            val idx = new Array[Byte](w * h)
            var i = 0
            while (i < idx.length) {
              idx(i) = (((id * 7 + f * 11 + i.toLong * 3) % sz).toInt).toByte
              i += 1
            }
            (idx, if (f % 2 == 1) Some(localPal) else None)
          }
          Multimodal.MediaRecord(id, "image",
            Gif.gifAnimBytes(w, h, globalPal, frames),
            Multimodal.MediaMeta(w, h, "gif", nf))
        }
      }
      Gif.gifFrames(media).toDF().orderBy("doc_id", "frame_idx")
    },
    Some(raw"""
WITH base AS (
  SELECT doc_id,
    CAST(6 + doc_id % 8 AS INT) AS w,
    CAST(5 + n_chars % 7 AS INT) AS h,
    CAST(1 + doc_id % 3 AS INT) AS nf
  FROM documents
), fr AS (
  SELECT doc_id, w, h, unnest(range(0, CAST(nf AS BIGINT))) AS f FROM base
), px AS (
  SELECT doc_id, w, h, f, CASE WHEN f % 2 = 1 THEN 4 ELSE 8 END AS sz,
    unnest(range(0, CAST(w * h AS BIGINT))) AS i
  FROM fr
), v AS (
  SELECT doc_id, w, h, f, sz, (doc_id * 7 + f * 11 + i * 3) % sz AS idx
  FROM px
), c AS (
  SELECT doc_id, w, h, f, sz, idx,
    CASE WHEN sz = 4 THEN (idx * 41 + 3) % 256 ELSE (idx * 37) % 256 END AS r,
    CASE WHEN sz = 4 THEN (idx * 67 + 11) % 256 ELSE (idx * 59 + 7) % 256 END AS g,
    CASE WHEN sz = 4 THEN (idx * 89 + 17) % 256 ELSE (idx * 83 + 13) % 256 END AS b
  FROM v
)
SELECT doc_id, CAST(f AS INT) AS frame_idx, w AS width, h AS height,
  CAST(sum(idx) AS BIGINT) AS sum_index,
  CAST(sum((77 * r + 150 * g + 29 * b) // 256) AS BIGINT) AS sum_luma,
  f % 2 = 1 AS local_palette
FROM c GROUP BY doc_id, f, w, h ORDER BY doc_id, frame_idx
"""))

  /** q123 — progressive JPEG decode contract: each document renders a
    * deterministic grayscale gradient, the JDK ImageIO writer encodes
    * it as a REAL multi-scan progressive stream (SOF2 — spectral
    * selection, successive approximation, EOB runs), and the engine's
    * [[graft.operators.Multimodal.jpegDecodePixels]] must (a) decode
    * it at the right dimensions and (b) agree with ImageIO's own
    * decode of the same bytes within 1 gray level on EVERY pixel —
    * the same conformance bar JpegProgressiveSpec holds, here as an
    * oracle-checked contract row (dims replayed arithmetically,
    * agreement booleans literal) so the progressive path is
    * registry-resident, not spec-only. */
  val q123 = QuerySpec("q123_jpeg_progressive",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("doc_id"),
        (lit(17) + col("doc_id") % 24).cast("int").as("w"),
        (lit(12) + col("n_chars") % 21).cast("int").as("h"))
        .as[(Long, Int, Int)]
      val out = graft.QueryUtil.balanced(base).mapPartitions { it =>
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpg").next()
        val params = writer.getDefaultWriteParam
        params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
        val res = it.map { case (id, w, h) =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.getRaster.setSample(x, y, 0,
                ((id * 5 + x * 13 + y * 7) % 256).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          // memory-cache stream, NOT ImageIO.createImageOutputStream:
          // the default is a DISK-backed cache (a temp file per image),
          // which at corpus scale turns an in-memory encode into
          // per-row file I/O — measured 38x at sf10 before this
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
          ios.close()
          val bytes = bos.toByteArray
          val ours = Multimodal.jpegDecodePixels(bytes)
          // same memory-cache discipline on the reference read
          val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("jpg").next()
          rdr.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes)))
          val ref = rdr.read(0)
          rdr.dispose()
          val dimsOk = ours.exists { case (gw, gh, gc, _) =>
            gw == w && gh == h && gc == 1 }
          val agree = dimsOk && {
            val px = ours.get._4
            var maxD = 0
            var y2 = 0
            while (y2 < h) {
              var x2 = 0
              while (x2 < w) {
                val d = math.abs(ref.getRaster.getSample(x2, y2, 0) -
                  (px(y2 * w + x2) & 0xff))
                if (d > maxD) maxD = d
                x2 += 1
              }
              y2 += 1
            }
            maxD <= 1
          }
          (id, w.toLong, h.toLong, dimsOk, agree)
        }
        res
      }.toDF("doc_id", "width", "height", "dims_ok", "imageio_agree")
      out.orderBy("doc_id")
    },
    Some(raw"""
SELECT doc_id,
  CAST(17 + doc_id % 24 AS BIGINT) AS width,
  CAST(12 + n_chars % 21 AS BIGINT) AS height,
  true AS dims_ok, true AS imageio_agree
FROM documents ORDER BY doc_id
"""))

  /** q124 — G.711 companded audio decode (WAV fmt 6/7, the telephony
    * tier real crawl audio ships in): each document synthesizes an
    * 8-bit μ-law (even ids) or A-law (odd ids) WAV whose byte i is
    * (doc_id·13 + i·7) mod 256, and
    * [[graft.operators.Multimodal.audioFeaturesEx]] must expand every
    * byte to 16-bit linear by the standard companding arithmetic
    * before the integer-exact reductions. The oracle replays the SAME
    * bit-level expansion (xor/shift/mask) per byte in DuckDB, so a
    * defect in either law's sign, segment, or magnitude arithmetic
    * breaks the compare. */
  val q124 = QuerySpec("q124_g711_audio",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("doc_id"),
        (lit(30) + col("doc_id") % 40).cast("int").as("n"))
        .as[(Long, Int)]
      val media = graft.QueryUtil.balanced(base).mapPartitions { it =>
        it.map { case (id, n) =>
          val payload = new Array[Byte](n)
          var i = 0
          while (i < n) {
            payload(i) = ((id * 13 + i.toLong * 7) % 256).toByte
            i += 1
          }
          val fmtCode = if (id % 2 == 0) 7 else 6
          Multimodal.MediaRecord(id, "audio",
            Multimodal.wavBytesFmt(fmtCode, 8, 1, 8000, payload),
            Multimodal.MediaMeta(1, 8000,
              if (id % 2 == 0) "g711_ulaw" else "g711_alaw", 1))
        }
      }
      Multimodal.audioFeaturesEx(media).toDF().orderBy("doc_id")
    },
    Some(raw"""
WITH base AS (
  SELECT doc_id, CAST(30 + doc_id % 40 AS INT) AS n, doc_id % 2 = 0 AS ul
  FROM documents
), idx AS (
  SELECT doc_id, ul, unnest(range(0, CAST(n AS BIGINT))) AS i FROM base
), g AS (
  SELECT doc_id, ul,
    xor((doc_id * 13 + i * 7) % 256, 255) AS u,
    xor((doc_id * 13 + i * 7) % 256, 85) AS a
  FROM idx
), m AS (
  SELECT doc_id, ul, u, a,
    (((u & 15) * 8 + 132) << ((u >> 4) & 7)) - 132 AS umag,
    CASE WHEN ((a >> 4) & 7) = 0 THEN ((a & 15) << 4) + 8
         ELSE (((a & 15) << 4) + 264) << (((a >> 4) & 7) - 1) END AS amag
  FROM g
), v AS (
  SELECT doc_id, ul,
    CASE WHEN ul THEN CASE WHEN (u & 128) <> 0 THEN -umag ELSE umag END
         ELSE CASE WHEN (a & 128) <> 0 THEN amag ELSE -amag END END AS smp
  FROM m
)
SELECT doc_id,
  CASE WHEN ul THEN 'g711_ulaw' ELSE 'g711_alaw' END AS codec,
  CAST(1 AS INT) AS channels,
  CAST(8000 AS INT) AS sample_rate,
  count(*) AS n_samples,
  CAST(sum(abs(smp)) AS BIGINT) AS sum_abs,
  CAST(max(abs(smp)) AS INT) AS peak,
  CAST(sum(smp * smp) AS BIGINT) AS sum_sq
FROM v GROUP BY doc_id, ul ORDER BY doc_id
"""))

  /** q126 — BMP pixel decode: each document synthesizes a 24-bit
    * BI_RGB bitmap (bottom-up, 4-byte-aligned rows — the padding and
    * row inversion are exactly where naive readers break) whose pixel
    * (x,y) channels are (id·7 + x·3 + y·5 + ch·11) mod 256, and
    * [[graft.operators.Bmp.bmpFeatures]] recovers per-channel sums
    * through the header walk + row flip + BGR swizzle. Oracle replays
    * every pixel arithmetically. */
  val q126 = QuerySpec("q126_bmp_pixels",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("doc_id"),
        (lit(5) + col("doc_id") % 9).cast("int").as("w"),
        (lit(4) + col("n_chars") % 8).cast("int").as("h"))
        .as[(Long, Int, Int)]
      val media = graft.QueryUtil.balanced(base).mapPartitions { it =>
        it.map { case (id, w, h) =>
          val rgb = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var ch = 0
              while (ch < 3) {
                rgb((y * w + x) * 3 + ch) =
                  ((id * 7 + x * 3 + y * 5 + ch * 11) % 256).toByte
                ch += 1
              }
              x += 1
            }
            y += 1
          }
          Multimodal.MediaRecord(id, "image", Bmp.bmpBytes(w, h, rgb),
            Multimodal.MediaMeta(w, h, "bmp", 1))
        }
      }
      Bmp.bmpFeatures(media).toDF().orderBy("doc_id")
    },
    Some(raw"""
WITH base AS (
  SELECT doc_id,
    CAST(5 + doc_id % 9 AS INT) AS w,
    CAST(4 + n_chars % 8 AS INT) AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h, unnest(range(0, CAST(w * h AS BIGINT))) AS i
  FROM base
), v AS (
  SELECT doc_id, w, h,
    (doc_id * 7 + (i % w) * 3 + (i // w) * 5) % 256 AS r,
    (doc_id * 7 + (i % w) * 3 + (i // w) * 5 + 11) % 256 AS g,
    (doc_id * 7 + (i % w) * 3 + (i // w) * 5 + 22) % 256 AS b
  FROM px
)
SELECT doc_id, w AS width, h AS height,
  CAST(count(*) AS BIGINT) AS n_pixels,
  CAST(sum(r) AS BIGINT) AS sum_red,
  CAST(sum(g) AS BIGINT) AS sum_green,
  CAST(sum(b) AS BIGINT) AS sum_blue,
  CAST(24 AS INT) AS bits_per_pixel
FROM v GROUP BY doc_id, w, h ORDER BY doc_id
"""))

  /** q127 — PERCEPTUAL image near-dup: documents in the same group
    * (doc_id/3) share one 18×16 grayscale pixel buffer but ship it in
    * three different REAL containers (grayscale PNG / 24-bit BMP /
    * 256-gray-palette GIF — `Multimodal.encodePerceptualFixture`), so
    * their bytes share nothing and the q91 byte tier cannot pair
    * them. `Multimodal.perceptualHash` decodes each container with
    * the in-repo codec, box-means the luma to a 9×8 grid, takes the
    * 64-bit difference hash, and the SAME banded-hamming pipeline as
    * q91 (4×16-bit bands → candidate join → bit_count verify ≤ 6)
    * pairs the re-encodes. Recall contract (pigeonhole): 4 bands
    * GUARANTEE candidacy only for hamming ≤ 3 (= bands−1); pairs at
    * 4–6 differing bits can spread across all four bands (2+2+1+1)
    * and are then missed — the ≤ 6 verify gate bounds precision, not
    * recall. Guaranteed ≤ 6 recall would need 7 bands; the oracle
    * replays these exact 4 bands, so engine and oracle miss the same
    * pairs and the compare stays exact (see q129's striped-band note).
    * The oracle never decodes an image: it
    * recomputes the dHash arithmetically from the fixture's pixel
    * formula — so the whole decode→luma→boxmean→hash chain must be
    * EXACT for the compare to pass. Distinct groups pair only if
    * their hashes genuinely collide within the hamming gate (the
    * oracle replays the same rule, so any such pair matches too).
    */
  val q127 = QuerySpec("q127_perceptual_neardup",
    (s, dir) => {
      val hashes = graft.CacheRegistry.persistTracked(
        Multimodal.perceptualHash(
          Multimodal.encodePerceptualFixture(
            Tables(s, dir, "documents"))).toDF())
      val banded = hashes.select(col("doc_id"), col("dhash"),
          explode(expr("sequence(0, 3)")).as("band"))
        .withColumn("bval",
          when(col("band") === 0, col("dhash").bitwiseAND(lit(0xFFFFL)))
            .when(col("band") === 1,
              shiftright(col("dhash"), 16).bitwiseAND(lit(0xFFFFL)))
            .when(col("band") === 2,
              shiftright(col("dhash"), 32).bitwiseAND(lit(0xFFFFL)))
            .otherwise(shiftright(col("dhash"), 48).bitwiseAND(lit(0xFFFFL))))
      val cand = banded.as("x").join(banded.as("y"), Seq("band", "bval"))
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          col("x.dhash").as("ha"), col("y.dhash").as("hb"))
        .distinct()
      cand.withColumn("hamming",
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .where(col("hamming") <= 6)
        .select("a", "b", "hamming")
        .orderBy("a", "b")
    },
    Some(raw"""
WITH grp AS (
  SELECT DISTINCT doc_id // 3 AS g FROM documents
), cells AS (
  SELECT grp.g, r.r, c.c,
    ( ((grp.g + 1) * (19 * (2*r.r)     + 7 * (2*c.c)     * (2*c.c)     + 3)
       + (grp.g // 256) * (23 * (2*r.r)     + 5 * (2*c.c)     + 17)) % 256
    + ((grp.g + 1) * (19 * (2*r.r)     + 7 * (2*c.c + 1) * (2*c.c + 1) + 3)
       + (grp.g // 256) * (23 * (2*r.r)     + 5 * (2*c.c + 1) + 17)) % 256
    + ((grp.g + 1) * (19 * (2*r.r + 1) + 7 * (2*c.c)     * (2*c.c)     + 3)
       + (grp.g // 256) * (23 * (2*r.r + 1) + 5 * (2*c.c)     + 17)) % 256
    + ((grp.g + 1) * (19 * (2*r.r + 1) + 7 * (2*c.c + 1) * (2*c.c + 1) + 3)
       + (grp.g // 256) * (23 * (2*r.r + 1) + 5 * (2*c.c + 1) + 17)) % 256
    ) // 4 AS v
  FROM grp,
    (SELECT unnest(range(0, 8)) AS r) r,
    (SELECT unnest(range(0, 9)) AS c) c
), gh AS (
  SELECT a.g,
    CAST(sum(CASE WHEN b.v > a.v THEN
      CASE WHEN a.r * 8 + a.c = 63 THEN -9223372036854775808
           ELSE 1::BIGINT << CAST(a.r * 8 + a.c AS INT) END
      ELSE 0 END) AS BIGINT) AS dhash
  FROM cells a JOIN cells b ON b.g = a.g AND b.r = a.r AND b.c = a.c + 1
  WHERE a.c < 8
  GROUP BY a.g
), dh AS (
  SELECT d.doc_id, gh.dhash
  FROM documents d JOIN gh ON d.doc_id // 3 = gh.g
), banded AS (
  SELECT doc_id, dhash, b AS band,
    (dhash >> CAST(16 * b AS INT)) & 65535 AS bval
  FROM dh, (SELECT unnest(range(0, 4)) AS b)
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
    x.dhash AS ha, y.dhash AS hb
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id
)
SELECT a, b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 6 ORDER BY a, b
"""))

  /** q129 — DCT perceptual near-dup (the second hash family beside
    * q127's dHash, r9 verdict item 8): same re-encode fixture and the
    * same banded-hamming pipeline, but the fingerprint is
    * `Multimodal.pHashDct64` — 8×8 box-mean luma → integer 2D DCT-II
    * through the fixed-point `DctCos1024` table → 63 bits of
    * AC-coefficient-vs-median. dHash keys on adjacent-cell edges; the
    * DCT hash keys on the global frequency envelope, so together they
    * cover both local-edge and smooth-rescale variants. The oracle
    * replays the ENTIRE integer transform — box means with truncating
    * division via the `(8p+7)//dim` inverse cell map, the same 32
    * cosine literals, the sorted-index-31 median, the bit layout — so
    * any arithmetic drift in the decode→luma→DCT chain breaks the
    * hash compare. All-integer fixed-point keeps both engines exact.
    */
  val q129 = QuerySpec("q129_dct_phash_neardup",
    (s, dir) => {
      val hashes = graft.CacheRegistry.persistTracked(
        Multimodal.perceptualHashDct(
          Multimodal.encodePerceptualFixture(
            Tables(s, dir, "documents"))).toDF())
      // STRIPED bands (bit i → band i mod 4), not contiguous 16-bit
      // slices: DCT bits are frequency-ORDERED, so a contiguous
      // high-bit band is near-constant across smooth surfaces and its
      // bucket degenerates toward all-pairs (measured 2.6× at sf10).
      // Striping mixes low/high-frequency bits into every band. The
      // pigeonhole recall guarantee of ANY 4-band partition is
      // hamming ≤ 3 (bands−1): 4–6 differing bits CAN spread across
      // all four bands (2+2+1+1) and such a pair is then missed — the
      // ≤6 verify gate bounds precision, not recall. The oracle
      // replays the identical bands, so engine and oracle miss the
      // same pairs and the compare stays exact; raise to 7 bands if
      // guaranteed ≤6 recall is ever required.
      def stripedBval(b: Int) = (0 until 16).map(j =>
        shiftleft(shiftright(col("phash"), 4 * j + b).bitwiseAND(lit(1L)), j))
        .reduce(_ + _)
      val banded = hashes.select(col("doc_id"), col("phash"),
          explode(expr("sequence(0, 3)")).as("band"))
        .withColumn("bval",
          when(col("band") === 0, stripedBval(0))
            .when(col("band") === 1, stripedBval(1))
            .when(col("band") === 2, stripedBval(2))
            .otherwise(stripedBval(3)))
      val cand = banded.as("x").join(banded.as("y"), Seq("band", "bval"))
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          col("x.phash").as("ha"), col("y.phash").as("hb"))
        .distinct()
      cand.withColumn("hamming",
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .where(col("hamming") <= 6)
        .select("a", "b", "hamming")
        .orderBy("a", "b")
    },
    Some(raw"""
WITH grp AS (
  SELECT DISTINCT doc_id // 3 AS g FROM documents
), px AS (
  SELECT grp.g, pr.r, pc.c,
    ((grp.g + 1) * (19 * pr.r + 7 * pc.c * pc.c + 3)
     + (grp.g // 256) * (23 * pr.r + 5 * pc.c + 17)) % 256 AS v
  FROM grp,
    (SELECT unnest(range(0, 16)) AS r) pr,
    (SELECT unnest(range(0, 18)) AS c) pc
), cells AS (
  SELECT g, (8 * r + 7) // 16 AS r8, (8 * c + 7) // 18 AS c8,
    sum(v) // count(*) AS v
  FROM px GROUP BY g, (8 * r + 7) // 16, (8 * c + 7) // 18
), f AS (
  SELECT cells.g, uu.u, vv.v,
    sum(cells.v
      * ([1024,1004,946,851,724,569,392,200,0,-200,-392,-569,-724,-851,-946,-1004,-1024,-1004,-946,-851,-724,-569,-392,-200,0,200,392,569,724,851,946,1004])[(((2 * cells.r8 + 1) * uu.u) % 32) + 1]
      * ([1024,1004,946,851,724,569,392,200,0,-200,-392,-569,-724,-851,-946,-1004,-1024,-1004,-946,-851,-724,-569,-392,-200,0,200,392,569,724,851,946,1004])[(((2 * cells.c8 + 1) * vv.v) % 32) + 1]) AS fv
  FROM cells,
    (SELECT unnest(range(0, 8)) AS u) uu,
    (SELECT unnest(range(0, 8)) AS v) vv
  GROUP BY cells.g, uu.u, vv.v
), med AS (
  SELECT g, fv AS m FROM (
    SELECT g, fv, row_number() OVER (PARTITION BY g ORDER BY fv) AS rn
    FROM f WHERE NOT (u = 0 AND v = 0))
  WHERE rn = 32
), gh AS (
  SELECT f.g,
    CAST(sum(CASE WHEN f.fv > med.m
      THEN 1::BIGINT << CAST(f.u * 8 + f.v - 1 AS INT) ELSE 0 END) AS BIGINT) AS phash
  FROM f JOIN med ON f.g = med.g
  WHERE NOT (f.u = 0 AND f.v = 0)
  GROUP BY f.g
), dh AS (
  SELECT d.doc_id, gh.phash
  FROM documents d JOIN gh ON d.doc_id // 3 = gh.g
), banded AS (
  SELECT doc_id, phash, b AS band,
    list_sum([((phash >> CAST(4 * j + b AS INT)) & 1) << CAST(j AS INT)
              FOR j IN range(0, 16)]) AS bval
  FROM dh, (SELECT unnest(range(0, 4)) AS b)
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
    x.phash AS ha, y.phash AS hb
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id
)
SELECT a, b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 6 ORDER BY a, b
"""))

  /** q133 — VIDEO-level perceptual near-dup: the temporal composition
    * of q114's real MP4 demux and q129's DCT pHash. Groups of two
    * fixture videos (`Multimodal.encodeVideoPerceptualFixture`) share
    * a frame sequence but encode it at 64×64 vs 128×128 — every JPEG
    * stream, stsz and stco differs while each aligned frame's 8×8
    * box-mean cell matrix (and so its `pHashDct64`) is identical —
    * exactly the re-encoded/rescaled upload pair a 100 TB multimodal
    * corpus must catch and byte-level q91 cannot.
    *
    * Pipeline: demux → decode → per-frame hash in ONE narrow pass
    * (`videoFrameHashes` — container bytes never shuffle; a video's
    * temporal signature is its (frame_idx, phash) rows, ~20 B/frame);
    * candidates come from the q129 striped 4-band scheme keyed by
    * (frame_idx, band, bval) so only TEMPORALLY ALIGNED frames in a
    * colliding bucket ever pair; per-frame hamming ≤ 6 verify; then a
    * per-video-pair vote — a pair is a near-dup when ≥ 70% of the
    * shorter video's frames match (10·n_match ≥ 7·min(nf) keeps the
    * vote in exact integers). Frame counts on the ENGINE side come
    * from the demuxed hash rows while the oracle derives them from
    * the fixture formula, so a dropped/extra frame anywhere in
    * writer → demux → decode breaks the compare. The oracle replays
    * the whole chain: block values → integer DCT (same 32 fixed-point
    * literals) → median → bits → striped bands → aligned pairing →
    * the integer vote. */
  val q133 = QuerySpec("q133_video_perceptual_neardup",
    (s, dir) => {
      val hashes = graft.CacheRegistry.persistTracked(
        Multimodal.videoFrameHashes(
          Multimodal.encodeVideoPerceptualFixture(
            Tables(s, dir, "documents"))).toDF())
      // striped bands, same layout as q129 (bit i → band i mod 4)
      def stripedBval(b: Int) = (0 until 16).map(j =>
        shiftleft(shiftright(col("phash"), 4 * j + b).bitwiseAND(lit(1L)), j))
        .reduce(_ + _)
      val banded = hashes.select(col("doc_id"), col("frame_idx"), col("phash"),
          explode(expr("sequence(0, 3)")).as("band"))
        .withColumn("bval",
          when(col("band") === 0, stripedBval(0))
            .when(col("band") === 1, stripedBval(1))
            .when(col("band") === 2, stripedBval(2))
            .otherwise(stripedBval(3)))
      val cand = banded.as("x")
        .join(banded.as("y"), Seq("frame_idx", "band", "bval"))
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
          col("frame_idx"), col("x.phash").as("ha"), col("y.phash").as("hb"))
        .distinct()
      val matched = cand
        .where(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 6)
      val votes = matched.groupBy("a", "b").agg(count(lit(1)).as("n_match"))
      val nf = hashes.groupBy("doc_id").agg(count(lit(1)).as("nf"))
      votes
        .join(nf.select(col("doc_id").as("a"), col("nf").as("nf_a")), Seq("a"))
        .join(nf.select(col("doc_id").as("b"), col("nf").as("nf_b")), Seq("b"))
        .select(col("a"), col("b"), col("n_match"), col("nf_a"), col("nf_b"),
          (col("n_match") * 10 >= least(col("nf_a"), col("nf_b")) * 7)
            .as("is_dup"))
        .orderBy("a", "b")
    },
    Some(raw"""
WITH grp AS (
  SELECT DISTINCT doc_id // 2 AS g FROM documents
), fr AS (
  SELECT g, unnest(range(0, g % 3 + 1)) AS fi FROM grp
), cells AS (
  SELECT fr.g, fr.fi, rr.r8, cc.c8,
    ((fr.g + 1) * ((11 + 13 * fr.fi) * (rr.r8 * 8 + cc.c8)
                   + 7 * (rr.r8 * 8 + cc.c8) * (rr.r8 * 8 + cc.c8) + 3)
     + (fr.g // 256) * (19 * (rr.r8 * 8 + cc.c8) + 29 * fr.fi + 5)
    ) % 256 AS v
  FROM fr,
    (SELECT unnest(range(0, 8)) AS r8) rr,
    (SELECT unnest(range(0, 8)) AS c8) cc
), f AS (
  SELECT cells.g, cells.fi, uu.u, vv.v,
    sum(cells.v
      * ([1024,1004,946,851,724,569,392,200,0,-200,-392,-569,-724,-851,-946,-1004,-1024,-1004,-946,-851,-724,-569,-392,-200,0,200,392,569,724,851,946,1004])[(((2 * cells.r8 + 1) * uu.u) % 32) + 1]
      * ([1024,1004,946,851,724,569,392,200,0,-200,-392,-569,-724,-851,-946,-1004,-1024,-1004,-946,-851,-724,-569,-392,-200,0,200,392,569,724,851,946,1004])[(((2 * cells.c8 + 1) * vv.v) % 32) + 1]) AS fv
  FROM cells,
    (SELECT unnest(range(0, 8)) AS u) uu,
    (SELECT unnest(range(0, 8)) AS v) vv
  GROUP BY cells.g, cells.fi, uu.u, vv.v
), med AS (
  SELECT g, fi, fv AS m FROM (
    SELECT g, fi, fv, row_number() OVER (PARTITION BY g, fi ORDER BY fv) AS rn
    FROM f WHERE NOT (u = 0 AND v = 0))
  WHERE rn = 32
), gh AS (
  SELECT f.g, f.fi,
    CAST(sum(CASE WHEN f.fv > med.m
      THEN 1::BIGINT << CAST(f.u * 8 + f.v - 1 AS INT) ELSE 0 END) AS BIGINT) AS phash
  FROM f JOIN med ON f.g = med.g AND f.fi = med.fi
  WHERE NOT (f.u = 0 AND f.v = 0)
  GROUP BY f.g, f.fi
), vh AS (
  SELECT d.doc_id, gh.fi AS frame_idx, gh.phash
  FROM documents d JOIN gh ON d.doc_id // 2 = gh.g
), banded AS (
  SELECT doc_id, frame_idx, phash, b AS band,
    list_sum([((phash >> CAST(4 * j + b AS INT)) & 1) << CAST(j AS INT)
              FOR j IN range(0, 16)]) AS bval
  FROM vh, (SELECT unnest(range(0, 4)) AS b)
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.frame_idx AS fi,
    x.phash AS ha, y.phash AS hb
  FROM banded x JOIN banded y
    ON x.frame_idx = y.frame_idx AND x.band = y.band AND x.bval = y.bval
   AND x.doc_id < y.doc_id
), votes AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS n_match
  FROM cand WHERE bit_count(xor(ha, hb)) <= 6 GROUP BY a, b
), nf AS (
  SELECT doc_id, CAST(doc_id // 2 % 3 + 1 AS BIGINT) AS nf FROM documents
)
SELECT v.a, v.b, v.n_match, na.nf AS nf_a, nb.nf AS nf_b,
  v.n_match * 10 >= least(na.nf, nb.nf) * 7 AS is_dup
FROM votes v
JOIN nf na ON v.a = na.doc_id
JOIN nf nb ON v.b = nb.doc_id
ORDER BY v.a, v.b
"""))

  /** q134 — AUDIO perceptual near-dup: content-level pairing of a
    * 16-bit PCM clip with its G.711 μ-law telephony re-encode —
    * bytes disjoint (16-bit LE vs companded 8-bit), decoded sample
    * VALUES genuinely differ (μ-law is lossy) — the case byte-level
    * q91 can never pair and q124's per-byte decode doesn't attempt.
    * Closes the last modality without a content-level near-dup tier
    * beside q127/q129 (image) and q133 (video).
    *
    * Signature: `Audio.spectralSignature` — per 256-sample window the
    * dominant non-DC FFT bin, through the in-repo radix-2 FFT, real
    * WAV parsing, and BOTH sample tiers (PCM passthrough; μ-law
    * expanded by the standard companding arithmetic). The fixture's
    * windows are bin-centered pure tones (q118's exactness
    * construction), so the dominant bin is analytically determined
    * and the oracle replays the ANSWER arithmetically — float FFT
    * internals never need cross-engine replay, while any defect in
    * framing, companding, bit-reversal or the argmax still breaks the
    * compare. μ-law quantization noise and harmonic distortion sit
    * orders of magnitude below a bin-centered tone peak, so the
    * argmax is codec-invariant by construction, not by luck.
    *
    * Pairing is Shazam-shaped: candidate keys are CONSECUTIVE peak
    * pairs (window w, bin_w, bin_{w+1}) — selective enough that
    * buckets stay tiny at crawl scale (a single-window dominant-bin
    * key has only ~120 values, a pair key ~120²·positions) — then an
    * exact aligned-window verify counts matching windows and the
    * same ≥ 70% integer vote as q133 marks clip near-dups. */
  /** Shared fixture for the audio near-dup family (q134/q413): each
    * doc pair g = id/2 is a multi-window bin-centered tone clip, even
    * ids as 16-bit PCM, odd ids as its G.711 μ-law re-encode — bytes
    * disjoint, spectra matching. */
  private def audioTwinMedia(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.Dataset[Multimodal.MediaRecord] = {
      import s.implicits._
      val base = graft.QueryUtil.balanced(
        Tables(s, dir, "documents").select(col("doc_id"))).as[Long]
      base.mapPartitions { it =>
        it.map { id =>
          val g = id / 2
          val nw = (4 + (g % 4)).toInt
          val n = nw * 256
          val pcm = new Array[Short](n)
          var w = 0
          while (w < nw) {
            // bin formula mirrors q118's 3..122 range; three g scales
            // ((g+1) multiplier, g/8, g/64) decorrelate the degenerate
            // residue classes a single multiplier leaves behind
            val k = (3L + (((g + 1L) * (2L * w + 3L) + (g / 64L) * (w + 5L)
              + (g / 8L) * (3L * w + 1L)) % 120L)).toInt
            var i = 0
            while (i < 256) {
              pcm(w * 256 + i) = math.round(12000.0 *
                math.sin(2.0 * math.Pi * k * i / 256.0)).toShort
              i += 1
            }
            w += 1
          }
          val data =
            if (id % 2 == 0) {
              val payload = new Array[Byte](2 * n)
              var i = 0
              while (i < n) {
                payload(2 * i) = pcm(i).toByte
                payload(2 * i + 1) = (pcm(i) >> 8).toByte
                i += 1
              }
              Multimodal.wavBytes(1, 8000, payload)
            } else {
              val payload = new Array[Byte](n)
              var i = 0
              while (i < n) {
                payload(i) = Multimodal.linearToUlaw(pcm(i).toInt).toByte
                i += 1
              }
              Multimodal.wavBytesFmt(7, 8, 1, 8000, payload)
            }
          Multimodal.MediaRecord(id, "audio", data,
            Multimodal.MediaMeta(1, 8000,
              if (id % 2 == 0) "pcm_s16le" else "g711_ulaw", 1))
        }
      }
  }

  val q134 = QuerySpec("q134_audio_perceptual_neardup",
    (s, dir) => {
      import s.implicits._
      val media = audioTwinMedia(s, dir)
      val sigs = graft.CacheRegistry.persistTracked(
        Audio.spectralSignature(media, 256).toDF())
      // the PINNED fixed-resolution control: pair keys through the
      // lint-limited escape hatch, so q413's calibrated default has a
      // measured differential to beat (see Audio.nearDup)
      Audio.nearDupFixed(sigs)
    },
    Some(raw"""
WITH grp AS (
  SELECT DISTINCT doc_id // 2 AS g FROM documents
), wins AS (
  SELECT g, unnest(range(0, 4 + g % 4)) AS w FROM grp
), bins AS (
  SELECT g, w,
    3 + (((g + 1) * (2 * w + 3) + (g // 64) * (w + 5)
          + (g // 8) * (3 * w + 1)) % 120) AS bin
  FROM wins
), sig AS (
  SELECT d.doc_id, b.w, b.bin
  FROM documents d JOIN bins b ON d.doc_id // 2 = b.g
), keys AS (
  SELECT s1.doc_id, s1.w, s1.bin AS b1, s2.bin AS b2
  FROM sig s1 JOIN sig s2 ON s1.doc_id = s2.doc_id AND s2.w = s1.w + 1
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM keys x JOIN keys y
    ON x.w = y.w AND x.b1 = y.b1 AND x.b2 = y.b2 AND x.doc_id < y.doc_id
), m AS (
  SELECT c.a, c.b, CAST(count(*) AS BIGINT) AS n_match
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.a
  JOIN sig sb ON sb.doc_id = c.b AND sb.w = sa.w
  WHERE sa.bin = sb.bin
  GROUP BY c.a, c.b
), nw AS (
  SELECT doc_id, CAST(4 + doc_id // 2 % 4 AS BIGINT) AS nw FROM documents
)
SELECT m.a, m.b, m.n_match, na.nw AS nw_a, nb.nw AS nw_b,
  m.n_match * 10 >= least(na.nw, nb.nw) * 7 AS is_dup
FROM m
JOIN nw na ON m.a = na.doc_id
JOIN nw nb ON m.b = nb.doc_id
ORDER BY m.a, m.b
"""))

  /** q413 — audio near-dup, CALIBRATED TRIPLET BLOCKING: q134's
    * Shazam-shaped pairing with consecutive-peak PAIR keys is the
    * pinned fixed-resolution control — its key space is constant
    * (≈120² per window position), so bucket density grows linearly
    * with the corpus and the within-bucket pair join quadratically
    * (37× at 100× rows, the q67-class trap). The production path
    * lengthens the key to THREE consecutive peaks (w, b₁, b₂, b₃):
    * ≈120× more selective, so candidate density stays near-constant
    * while TRUE twins — which share every window — are still caught
    * by any key length (clips have ≥4 windows). Same exact
    * aligned-window verify, same ≥70% vote; the oracle replays the
    * triplet keys relationally. This is the r17 calibration lesson
    * (fixed-resolution LSH → corpus-calibrated default) applied to
    * the audio modality. */
  val q413 = QuerySpec("q413_audio_neardup_blocked",
    (s, dir) => {
      import s.implicits._
      val media = audioTwinMedia(s, dir)
      val sigs = graft.CacheRegistry.persistTracked(
        Audio.spectralSignature(media, 256).toDF())
      // the LIBRARY DEFAULT: Audio.nearDup's calibrated triplet keys
      // (a user reaching for the operator gets the scale-safe path
      // without knowing the q67/q134 calibration history)
      Audio.nearDup(sigs)
    },
    Some(raw"""
WITH grp AS (
  SELECT DISTINCT doc_id // 2 AS g FROM documents
), wins AS (
  SELECT g, unnest(range(0, 4 + g % 4)) AS w FROM grp
), bins AS (
  SELECT g, w,
    3 + (((g + 1) * (2 * w + 3) + (g // 64) * (w + 5)
          + (g // 8) * (3 * w + 1)) % 120) AS bin
  FROM wins
), sig AS (
  SELECT d.doc_id, b.w, b.bin
  FROM documents d JOIN bins b ON d.doc_id // 2 = b.g
), keys AS (
  SELECT s1.doc_id, s1.w, s1.bin AS b1, s2.bin AS b2, s3.bin AS b3
  FROM sig s1
  JOIN sig s2 ON s1.doc_id = s2.doc_id AND s2.w = s1.w + 1
  JOIN sig s3 ON s1.doc_id = s3.doc_id AND s3.w = s1.w + 2
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM keys x JOIN keys y
    ON x.w = y.w AND x.b1 = y.b1 AND x.b2 = y.b2 AND x.b3 = y.b3
      AND x.doc_id < y.doc_id
), m AS (
  SELECT c.a, c.b, CAST(count(*) AS BIGINT) AS n_match
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.a
  JOIN sig sb ON sb.doc_id = c.b AND sb.w = sa.w
  WHERE sa.bin = sb.bin
  GROUP BY c.a, c.b
), nw AS (
  SELECT doc_id, CAST(4 + doc_id // 2 % 4 AS BIGINT) AS nw FROM documents
)
SELECT m.a, m.b, m.n_match, na.nw AS nw_a, nb.nw AS nw_b,
  m.n_match * 10 >= least(na.nw, nb.nw) * 7 AS is_dup
FROM m
JOIN nw na ON m.a = na.doc_id
JOIN nw nb ON m.b = nb.doc_id
ORDER BY m.a, m.b
"""))

  /** q149 — PNG metadata privacy scrub
    * ([[Multimodal.pngScrubMetadata]]): every ancillary chunk — the
    * tEXt author strings, eXIf GPS blobs, tIME stamps that ride crawl
    * images into a training corpus — dropped by the spec's one-bit
    * ancillary test, critical chunks byte-copied with CRCs intact, no
    * re-encode. The fixture injects deterministic metadata (a tEXt
    * `Author` record always; tIME on even ids; an eXIf payload on
    * ids % 3 = 0) into real in-repo-encoded PNGs; the engine verifies
    * the scrubbed file still DECODES to identical pixels
    * (`pixels_ok`), and the oracle replays the chunk census and the
    * removed-byte arithmetic from the id formulas — a scrubber that
    * drops the wrong chunk, miscounts a length, or corrupts the
    * stream breaks either the compare or the decode. */
  val q149 = QuerySpec("q149_png_metadata_scrub",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      graft.QueryUtil.balanced(docs.select("doc_id")).as[Long].map { id =>
        val w = 8; val h = 8
        val px = Array.tabulate(w * h)(i => (((id + 1) * (i * 7 + 3)) % 256).toByte)
        val base = Multimodal.pngEncode(w, h, 1, px)
        val meta =
          Seq("tEXt" -> ("Author\u0000user" + id).getBytes("ISO-8859-1")) ++
            (if (id % 2 == 0) Seq("tIME" -> Array.fill[Byte](7)(1)) else Nil) ++
            (if (id % 3 == 0)
              Seq("eXIf" -> Array.fill[Byte]((id % 5 + 4).toInt)(2))
            else Nil)
        val dirty = Multimodal.pngInjectMetadata(base, meta)
        val (clean, nChunks, nRemoved, removedBytes) =
          Multimodal.pngScrubMetadata(dirty).get
        val pixelsOk =
          Multimodal.pngDecodePixels(clean).map(_._4.toSeq) ==
            Multimodal.pngDecodePixels(dirty).map(_._4.toSeq)
        (id, nChunks.toLong, nRemoved.toLong, removedBytes, pixelsOk)
      }.toDF("doc_id", "n_chunks", "n_removed", "removed_bytes", "pixels_ok")
        .orderBy("doc_id")
    },
    Some(raw"""
SELECT doc_id,
  CAST(4 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
     + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_chunks,
  CAST(1 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
     + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_removed,
  CAST((12 + 11 + length(CAST(doc_id AS VARCHAR)))
     + CASE WHEN doc_id % 2 = 0 THEN 19 ELSE 0 END
     + CASE WHEN doc_id % 3 = 0 THEN 12 + (doc_id % 5 + 4) ELSE 0 END
     AS BIGINT) AS removed_bytes,
  TRUE AS pixels_ok
FROM documents ORDER BY doc_id
"""))

  /** q162 — JPEG EXIF extraction + privacy scrub
    * ([[graft.operators.Exif]]): the JPEG counterpart of q149. The
    * fixture injects a REAL APP1/TIFF EXIF segment into in-repo-
    * encoded JPEGs — Make/Model ASCII entries (Make external in the
    * TIFF data area, Model inline per the ≤4-byte rule), Orientation
    * SHORT, a GPS IFD on ids % 3 = 0, and BOTH byte orders (odd ids
    * little-endian) so the II/MM dispatch is exercised row by row.
    * The engine parses the fields back out of the bytes, scrubs every
    * APPn/COM segment, verifies the scrubbed file still decodes to
    * identical pixels and that no EXIF survives. The oracle replays
    * the field formulas and the segment-size arithmetic (66 bytes
    * without GPS, 96 with — pinned to the documented TIFF layout by
    * JpegExifSpec); a parser that misreads an endianness, an inline
    * value, or an offset breaks the compare. */
  val q162 = QuerySpec("q162_jpeg_exif",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      graft.QueryUtil.balanced(docs.select("doc_id")).as[Long].map { id =>
        val px = Array.tabulate(64)(i => (((id + 1) * (i * 7 + 3)) % 256).toByte)
        val base = Multimodal.jpegEncode(8, 8, 1, px)
        val seg = Exif.exifSegment("Cam" + (id % 7), "M" + (id % 5),
          (1 + id % 8).toInt, gps = id % 3 == 0, littleEndian = id % 2 == 1)
        val dirty = Exif.jpegInjectExif(base, seg)
        val (make, model, orient, hasGps) = Exif.jpegExif(dirty).get
        val (clean, _, removed, removedBytes) =
          Exif.jpegScrubMetadata(dirty).get
        val pixelsOk =
          Multimodal.jpegDecodePixels(clean).map(_._4.toSeq) ==
            Multimodal.jpegDecodePixels(dirty).map(_._4.toSeq)
        (id, make, model, orient.toLong, hasGps, removed.toLong,
          removedBytes, pixelsOk, Exif.jpegExif(clean).isEmpty)
      }.toDF("doc_id", "make", "model", "orientation", "has_gps",
          "n_removed", "removed_bytes", "pixels_ok", "exif_gone")
        .orderBy("doc_id")
    },
    Some(raw"""
SELECT doc_id,
  'Cam' || CAST(doc_id % 7 AS VARCHAR) AS make,
  'M' || CAST(doc_id % 5 AS VARCHAR) AS model,
  CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
  doc_id % 3 = 0 AS has_gps,
  CAST(1 AS BIGINT) AS n_removed,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 96 ELSE 66 END AS BIGINT)
    AS removed_bytes,
  TRUE AS pixels_ok, TRUE AS exif_gone
FROM documents ORDER BY doc_id
"""))

  /** q170 — MP3 stream metadata ([[graft.operators.Mp3]]): the web's
    * dominant audio format gets the same REAL container tier as
    * WAV/MP4 (q27) — ID3v2 tags skipped by their sync-safe 28-bit
    * size, then an MPEG-1 Layer III frame walk using the public
    * bitrate/sample-rate tables and the 144·bitrate/rate+padding
    * frame-length rule; duration is exact integer arithmetic
    * (frames·1152·1000 div rate). The fixture synthesizes per-doc
    * streams — CBR on even ids, per-frame varying bitrate (VBR) on
    * odd, ID3v2 tags of varying sync-safe size on ids % 4 = 0, a
    * trailing ID3v1 block on ids % 5 = 0 — and the oracle replays the
    * whole table arithmetic per frame (bitrate list indexing, padded
    * lengths, integer duration, the min≠max VBR test). */
  val q170 = QuerySpec("q170_mp3_metadata",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      graft.QueryUtil.balanced(docs.select("doc_id")).as[Long].map { id =>
        val srIdx = (id % 3).toInt
        val n = (3 + id % 5).toInt
        val spec = Seq.tabulate(n) { f =>
          val br = if (id % 2 == 0) 1 + (id % 14).toInt
                   else 1 + ((id + f) % 14).toInt
          (br, f % 2)
        }
        val id3 = if (id % 4 == 0) (id % 200).toInt else 0
        val bytes = Mp3.mp3Encode(spec, srIdx, id3v2Bytes = id3,
          id3v1 = id % 5 == 0)
        val (frames, audio, rate, durMs, meanBr, vbr) =
          Mp3.mp3Frames(bytes).get
        (id, frames.toLong, audio, rate.toLong, durMs, meanBr, vbr)
      }.toDF("doc_id", "n_frames", "audio_bytes", "sample_rate",
          "duration_ms", "mean_br", "is_vbr")
        .orderBy("doc_id")
    },
    Some(raw"""
WITH f AS (
  SELECT doc_id, unnest(range(0, 3 + doc_id % 5)) AS fr
  FROM documents
), per AS (
  SELECT doc_id, fr,
    ([0,32,40,48,56,64,80,96,112,128,160,192,224,256,320])[
      CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 14
           ELSE 1 + (doc_id + fr) % 14 END + 1] AS kbps,
    ([44100, 48000, 32000])[doc_id % 3 + 1] AS sr,
    fr % 2 AS pad
  FROM f
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_frames,
  CAST(sum(144000 * kbps // sr + pad) AS BIGINT) AS audio_bytes,
  CAST(min(sr) AS BIGINT) AS sample_rate,
  CAST(count(*) * 1152 * 1000 // min(sr) AS BIGINT) AS duration_ms,
  CAST(sum(kbps) // count(*) AS BIGINT) AS mean_br,
  min(kbps) <> max(kbps) AS is_vbr
FROM per GROUP BY doc_id ORDER BY doc_id
"""))

  /** q177 — WebP + standalone TIFF header metadata
    * ([[graft.operators.Webp]], [[graft.operators.Tiff]]): dimensions
    * and feature flags recovered from the real bit layouts — WebP's
    * three bitstream variants round-robin across documents (lossy
    * key-frame 14-bit dims, lossless bit-packed minus-one dims +
    * alpha bit 28, extended 24-bit canvas + alpha feature flag), and
    * TIFF alternates byte order, SHORT/LONG dimension types, and
    * inline-vs-external BitsPerSample. The oracle replays every
    * generator formula; a parser that misreads one bit field breaks
    * the compare. Completes the five-format crawl image-header tier
    * (PNG/JPEG/GIF/BMP + WebP) plus archival TIFF. */
  val q177 = QuerySpec("q177_webp_tiff_metadata",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir, "documents")
      graft.QueryUtil.balanced(docs.select("doc_id")).as[Long].map { id =>
        val w = (16 + id % 300).toInt; val h = (16 + (id * 7) % 200).toInt
        val webp = (id % 3) match {
          case 0 => Webp.encodeLossy(w, h)
          case 1 => Webp.encodeLossless(w, h, alpha = id % 2 == 0)
          case _ => Webp.encodeExtended(w, h, alpha = id % 4 == 0)
        }
        val (variant, ww, wh, alpha) = Webp.parse(webp).get
        val tiff = Tiff.encode(w, h, 8, (1 + id % 3).toInt,
          littleEndian = id % 2 == 0, longDims = id % 5 == 0)
        val (tw, th, bps, spp, le) = Tiff.parse(tiff).get
        (id, variant, ww.toLong, wh.toLong, alpha,
          tw.toLong, th.toLong, bps.toLong, spp.toLong, le)
      }.toDF("doc_id", "variant", "w", "h", "alpha",
          "tiff_w", "tiff_h", "tiff_bps", "tiff_spp", "tiff_le")
        .orderBy("doc_id")
    },
    Some(raw"""
SELECT doc_id,
  CASE doc_id % 3 WHEN 0 THEN 'lossy' WHEN 1 THEN 'lossless'
    ELSE 'extended' END AS variant,
  CAST(16 + doc_id % 300 AS BIGINT) AS w,
  CAST(16 + (doc_id * 7) % 200 AS BIGINT) AS h,
  CASE doc_id % 3 WHEN 0 THEN FALSE
    WHEN 1 THEN doc_id % 2 = 0 ELSE doc_id % 4 = 0 END AS alpha,
  CAST(16 + doc_id % 300 AS BIGINT) AS tiff_w,
  CAST(16 + (doc_id * 7) % 200 AS BIGINT) AS tiff_h,
  CAST(8 AS BIGINT) AS tiff_bps,
  CAST(1 + doc_id % 3 AS BIGINT) AS tiff_spp,
  doc_id % 2 = 0 AS tiff_le
FROM documents ORDER BY doc_id
"""))

  val all: Seq[QuerySpec] =
    Seq(q27, q38, q39, q91, q102, q113, q114, q115, q118, q120, q122, q123, q133,
      q134, q413, q124, q126, q127, q129, q149, q162, q170, q177)
}
