package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed by per-partition batch workers.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic stub (`decodeStub`) — but everything
  * Spark-cares-about is real: the binary column representation, the
  * typed metadata struct, the case-class Encoders, the mapPartitions
  * batch shape (one worker per partition, streaming iterator, no
  * per-row JVM↔lib churn), and the partitioning (narrow — media bytes
  * never shuffle; only extracted features move downstream).
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
    documents.select(
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

  /** STUB decode + feature extraction. A real implementation hands each
    * partition's byte payloads to a codec library (e.g. libjpeg /
    * ffmpeg bindings) inside this same mapPartitions; here the "decoded
    * brightness" is a deterministic function of the real bytes (sum of
    * the first 16) so correctness is still oracle-checkable.
    */
  def decodeStub(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would open the codec once here, not per row
      it.map { r =>
        val head = r.data.take(16)
        val brightness = head.foldLeft(0L)((acc, b) => acc + (b & 0xff)) % 256
        MediaFeatures(r.doc_id, r.data.length.toLong, brightness,
          r.meta.width, r.meta.height, r.meta.nFrames)
      }
    }
  }

  /** STUB frame sampler: emits meta.nFrames frames per video row at a
    * fixed 64-byte stride, checksumming the real byte at each offset
    * (a real implementation would seek keyframes). flatMap keeps it
    * narrow — one input row explodes into ≤ nFrames output rows on the
    * same partition.
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

  final case class MediaHash(doc_id: Long, ahash: Long)

  /** Byte-sample average hash: 60 evenly-strided payload bytes, bit i
    * set iff sample i ≥ the sample mean (compared as `v·cnt ≥ sum` —
    * integer-exact, no float mean). The byte-level stand-in for a
    * perceptual pHash: a real decoder would produce the 8×8 DCT grid
    * in this same mapPartitions and feed the SAME banding/hamming
    * pipeline (q91) — the dedup side is modality-independent.
    */
  def byteHashStub(media: Dataset[MediaRecord]): Dataset[MediaHash] = {
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
}
