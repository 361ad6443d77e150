package graft.queries

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}
import graft.operators.Multimodal

/** Multimodal query inventory: binary payload + typed metadata through
  * the mapPartitions decode/frame-sample stubs. The documents' text is
  * ASCII, so the oracle recomputes byte arithmetic with ascii()/length.
  */
object MultimodalQueries {

  /** q38 — decode features per media record (binary column →
    * mapPartitions batch worker → per-doc features). */
  val q38 = QuerySpec("q38_media_features",
    (s, dir) => Multimodal.decodeStub(
        Multimodal.ingest(Tables(s, dir, "documents")))
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("brightness"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"))
      .orderBy("doc_id"),
    Some(raw"""
SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  CAST(list_sum([ascii(text[i]) FOR i IN range(1, least(length(text), 16) + 1)]) % 256 AS BIGINT) AS brightness,
  CAST(n_chars % 640 + 64 AS BIGINT) AS width,
  CAST(n_chars % 480 + 48 AS BIGINT) AS height,
  CAST(n_chars // 100 + 1 AS BIGINT) AS n_frames
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

  val all: Seq[QuerySpec] = Seq(q38, q39)
}
