package graft.queries

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}
import graft.operators.Qoi

/** QOI image-shard tier (q227): the lossless intermediate format a
  * training pipeline uses between decode and tensorization — PNG-class
  * compression at memcpy-class speed ([[graft.operators.Qoi]] has the
  * codec + spec-vector conformance). One query proves the full
  * encode→decode loop on corpus-scale data the same way the PNG/JPEG
  * tiers do (q102/q113 pattern): deterministic pixels generated from
  * doc_id arithmetic, pushed through the real codec, reduced to
  * integer features the oracle regenerates WITHOUT the codec — any
  * bit defect in either direction shifts a sample and breaks the
  * hash compare.
  */
object QoiQueries {

  /** q227 — QOI round-trip pixel features. The generator is designed
    * to exercise every op class the format has: region 0 cycles a
    * 6-color palette with quadratic revisits (RUN + INDEX ops),
    * region 1 steps every channel by +1 per pixel (DIFF ops),
    * region 2 steps by +7 with a constant non-255 alpha for 2 of 3
    * docs (LUMA ops behind one RGBA transition). Encode and decode
    * both run inside one narrow mapPartitions — image bytes never
    * shuffle, and at 100 TB the stage stays embarrassingly parallel
    * (per-row work, zero exchange). */
  val q227 = QuerySpec("q227_qoi_pixels",
    (s, dir) => {
      import s.implicits._
      val dims = Tables(s, dir, "documents")
        .select(col("doc_id"),
          (col("doc_id") % 24 + 8).cast("int").as("w"),
          (col("doc_id") % 16 + 6).cast("int").as("h"))
        .as[(Long, Int, Int)]
      graft.QueryUtil.balanced(dims).mapPartitions { it =>
        it.map { case (id, w, h) =>
          val n = w * h
          val third = n / 3
          val img = new Array[Byte](n * 4)
          var j = 0
          while (j < n) {
            val (r, g, b, a) =
              if (j < third) {
                val k = ((j.toLong * j / 7 + id) % 6).toInt
                (((id * 53 + k * 37) % 256).toInt,
                  ((id * 11 + k * 71) % 256).toInt,
                  ((id * 29 + k * 13) % 256).toInt, 255)
              } else if (j < 2 * third) {
                (((id + j) % 256).toInt, ((id * 3 + j) % 256).toInt,
                  ((id * 5 + j) % 256).toInt, 255)
              } else {
                val base = id * 7 + j.toLong * 7
                ((base % 256).toInt, ((base + 1) % 256).toInt,
                  ((base + 2) % 256).toInt,
                  if (id % 3 == 0) 255 else 200)
              }
            img(j * 4) = r.toByte; img(j * 4 + 1) = g.toByte
            img(j * 4 + 2) = b.toByte; img(j * 4 + 3) = a.toByte
            j += 1
          }
          val decoded = Qoi.decode(Qoi.encode(w, h, img))
          require(decoded.w == w && decoded.h == h)
          val px = decoded.rgba
          var sumRgb = 0L; var wsum = 0L; var alphaSum = 0L
          var i = 0
          while (i < n) {
            val r = px(i * 4) & 0xff; val g = px(i * 4 + 1) & 0xff
            val b = px(i * 4 + 2) & 0xff; val a = px(i * 4 + 3) & 0xff
            sumRgb += r + g + b
            wsum += (i + 1).toLong * (r + 2L * g + 3L * b)
            alphaSum += a
            i += 1
          }
          (id, w, h, n.toLong, sumRgb, wsum, alphaSum)
        }
      }.toDF("doc_id", "width", "height", "n_px", "sum_rgb", "wsum",
        "alpha_sum")
        .orderBy("doc_id")
    },
    Some(raw"""
WITH dims AS (
  SELECT doc_id,
    CAST(doc_id % 24 + 8 AS INT) AS width,
    CAST(doc_id % 16 + 6 AS INT) AS height
  FROM documents
), idx AS (
  SELECT doc_id, width, height,
    CAST(width AS BIGINT) * height AS n,
    (CAST(width AS BIGINT) * height) // 3 AS third,
    unnest(range(0, CAST(width AS BIGINT) * height)) AS j
  FROM dims
), px AS (
  SELECT doc_id, width, height, n, j,
    CASE WHEN j < third THEN (doc_id * 53 + ((j * j // 7 + doc_id) % 6) * 37) % 256
         WHEN j < 2 * third THEN (doc_id + j) % 256
         ELSE (doc_id * 7 + j * 7) % 256 END AS r,
    CASE WHEN j < third THEN (doc_id * 11 + ((j * j // 7 + doc_id) % 6) * 71) % 256
         WHEN j < 2 * third THEN (doc_id * 3 + j) % 256
         ELSE (doc_id * 7 + j * 7 + 1) % 256 END AS g,
    CASE WHEN j < third THEN (doc_id * 29 + ((j * j // 7 + doc_id) % 6) * 13) % 256
         WHEN j < 2 * third THEN (doc_id * 5 + j) % 256
         ELSE (doc_id * 7 + j * 7 + 2) % 256 END AS b,
    CASE WHEN j < 2 * third THEN 255
         WHEN doc_id % 3 = 0 THEN 255 ELSE 200 END AS a
  FROM idx
)
SELECT doc_id, width, height,
  CAST(count(*) AS BIGINT) AS n_px,
  CAST(sum(r + g + b) AS BIGINT) AS sum_rgb,
  CAST(sum((j + 1) * (r + 2 * g + 3 * b)) AS BIGINT) AS wsum,
  CAST(sum(a) AS BIGINT) AS alpha_sum
FROM px GROUP BY doc_id, width, height ORDER BY doc_id
"""))

  def all: Seq[QuerySpec] = Seq(q227)
}
