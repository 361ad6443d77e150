package graft.queries

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}
import graft.operators.ImageResize

/** Vision-preprocessing tier: the resize → patchify leg between the
  * decode codecs (PNG/JPEG/GIF/BMP/WebP/TIFF/QOI, q38/q102/q113/q227
  * family) and patch-embedding tensorization. Same proof shape as the
  * codec tier: deterministic pixels generated from doc_id arithmetic
  * go through the REAL operator ([[graft.operators.ImageResize]],
  * conformance-tested in ImageResizeSpec), and the oracle regenerates
  * the expected features WITHOUT the operator from the closed form
  * the fixture was designed to have — any misplaced sample, wrong
  * interpolation weight, or rounding drift shifts a patch sum and
  * breaks the hash compare.
  */
object VisionQueries {

  /** q318 — ViT-style patchify: per document, a 32×32×3 image whose
    * channels are LINEAR fields p = 3x + 2y + off_c (off_c =
    * (doc_id + 17c) mod 64) is bilinear-resized to the 16×16 model
    * grid and cut into the 4×4 patch grid; per patch the query emits
    * exact per-channel sums and a position-weighted checksum
    * (Σ (dy·4+dx+1)·(r + 2g + 3b)) that catches any within-patch
    * permutation plain sums would mask.
    *
    * Why the oracle is exact: bilinear with half-pixel centers at an
    * exact 2× downscale samples at source coordinates 2xo + 0.5 — a
    * 4-neighbor average with weights ¼, which on a linear field
    * reproduces the field at the sample point: out = 6xo + 4yo +
    * off_c + 2.5, rounded half-up to ... + 3. Every weight and the
    * .5 fraction are exact in binary, so the closed form is EXACT,
    * not approximate — the general (ragged, clamped) resize paths are
    * pinned by ImageResizeSpec against an independent reference.
    *
    * Scale: synthesize + resize + patchify run inside one
    * mapPartitions — per-row arithmetic, no shuffle until the final
    * 16-rows-per-doc sort for output; pixel buffers never leave the
    * task. At 100 TB this is the canonical embarrassingly-parallel
    * tensorization stage. */
  val q318 = QuerySpec("q318_vit_patchify",
    (s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents").select(col("doc_id"))
        .as[Long]
      graft.QueryUtil.balanced(ids).mapPartitions { it =>
        it.flatMap { id =>
          val off = Array((id % 64).toInt, ((id + 17) % 64).toInt,
            ((id + 34) % 64).toInt)
          val src = new Array[Int](32 * 32 * 3)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              var c = 0
              while (c < 3) {
                src((y * 32 + x) * 3 + c) = 3 * x + 2 * y + off(c)
                c += 1
              }
              x += 1
            }
            y += 1
          }
          val out = ImageResize.bilinear(src, 32, 32, 3, 16, 16)
          for (pr <- 0 until 4; pc <- 0 until 4) yield {
            var sr = 0L; var sg = 0L; var sb = 0L; var sw = 0L
            var dy = 0
            while (dy < 4) {
              var dx = 0
              while (dx < 4) {
                val i = ((pr * 4 + dy) * 16 + (pc * 4 + dx)) * 3
                val r = out(i); val g = out(i + 1); val b = out(i + 2)
                sr += r; sg += g; sb += b
                sw += (dy * 4 + dx + 1).toLong * (r + 2L * g + 3L * b)
                dx += 1
              }
              dy += 1
            }
            (id, pr.toLong, pc.toLong, sr, sg, sb, sw)
          }
        }
      }.toDF("doc_id", "pr", "pc", "s_r", "s_g", "s_b", "s_w")
        .orderBy("doc_id", "pr", "pc")
    },
    Some(raw"""
WITH px AS (
  SELECT doc_id, pr, pc, dy, dx,
    6 * (pc * 4 + dx) + 4 * (pr * 4 + dy) + doc_id % 64 + 3 AS vr,
    6 * (pc * 4 + dx) + 4 * (pr * 4 + dy) + (doc_id + 17) % 64 + 3 AS vg,
    6 * (pc * 4 + dx) + 4 * (pr * 4 + dy) + (doc_id + 34) % 64 + 3 AS vb
  FROM documents,
    range(4) t1(pr), range(4) t2(pc), range(4) t3(dy), range(4) t4(dx)
)
SELECT doc_id, pr, pc,
  CAST(sum(vr) AS BIGINT) AS s_r,
  CAST(sum(vg) AS BIGINT) AS s_g,
  CAST(sum(vb) AS BIGINT) AS s_b,
  CAST(sum((dy * 4 + dx + 1) * (vr + 2 * vg + 3 * vb)) AS BIGINT) AS s_w
FROM px
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""))

  /** q336 — deterministic AUGMENTATION pipeline (flip → crop →
    * normalization statistics), the per-sample transform leg of a
    * vision training-data pipeline: per document a 32×32×3 linear-
    * field image is horizontally flipped when doc_id is odd, cropped
    * to 24×24 at a hash-derived offset (ox = id mod 9,
    * oy = (id div 9) mod 9 — the "random" crop made reproducible, the
    * same derived-parameter discipline as every sampler in this
    * repo), and reduced to exact per-channel Σv and Σv² (the two
    * accumulators a normalize step needs, kept as integers — no mean
    * division anywhere near the compare). The REAL array operations
    * run in one mapPartitions (synthesize → reverse rows → window
    * copy → accumulate; pixels never leave the task); the oracle
    * regenerates the expected stats from the closed form
    * v = 3·X + 2·(oy+y) + off_c with X = 31−(ox+x) under flip — any
    * off-by-one in the flip/crop indexing shifts Σv by a multiple of
    * 3 and breaks the compare. Embarrassingly parallel at 100 TB. */
  val q336 = QuerySpec("q336_augment_stats",
    (s, dir) => {
      import s.implicits._
      val ids = Tables(s, dir, "documents").select(col("doc_id"))
        .as[Long]
      graft.QueryUtil.balanced(ids).mapPartitions { it =>
        it.flatMap { id =>
          val off = Array((id % 64).toInt, ((id + 17) % 64).toInt,
            ((id + 34) % 64).toInt)
          val flip = (id % 2).toInt
          val ox = (id % 9).toInt
          val oy = ((id / 9) % 9).toInt
          // synthesize
          val src = new Array[Int](32 * 32 * 3)
          var y = 0
          while (y < 32) {
            var x = 0
            while (x < 32) {
              var c = 0
              while (c < 3) {
                src((y * 32 + x) * 3 + c) = 3 * x + 2 * y + off(c)
                c += 1
              }
              x += 1
            }
            y += 1
          }
          // real flip: reverse each row in place (pixel-wise)
          if (flip == 1) {
            var fy = 0
            while (fy < 32) {
              var lo = 0; var hi = 31
              while (lo < hi) {
                var c = 0
                while (c < 3) {
                  val a = (fy * 32 + lo) * 3 + c
                  val b = (fy * 32 + hi) * 3 + c
                  val t = src(a); src(a) = src(b); src(b) = t
                  c += 1
                }
                lo += 1; hi -= 1
              }
              fy += 1
            }
          }
          // real crop + per-channel accumulation over the window
          val sums = new Array[Long](3)
          val sqs = new Array[Long](3)
          var cy = 0
          while (cy < 24) {
            var cx = 0
            while (cx < 24) {
              var c = 0
              while (c < 3) {
                val v = src(((oy + cy) * 32 + (ox + cx)) * 3 + c).toLong
                sums(c) += v; sqs(c) += v * v
                c += 1
              }
              cx += 1
            }
            cy += 1
          }
          (0 until 3).map(c => (id, c.toLong, flip.toLong, ox.toLong,
            oy.toLong, sums(c), sqs(c)))
        }
      }.toDF("doc_id", "channel", "flip", "ox", "oy", "s", "ss")
        .orderBy("doc_id", "channel")
    },
    Some(raw"""
WITH aug AS (
  SELECT doc_id, CAST(doc_id % 2 AS BIGINT) AS flip,
    CAST(doc_id % 9 AS BIGINT) AS ox,
    CAST((doc_id // 9) % 9 AS BIGINT) AS oy
  FROM documents
), px AS (
  SELECT a.doc_id, c.c AS channel, a.flip, a.ox, a.oy,
    3 * (CASE WHEN a.flip = 1 THEN 31 - (a.ox + x.x)
         ELSE a.ox + x.x END)
      + 2 * (a.oy + y.y) + (a.doc_id + 17 * c.c) % 64 AS v
  FROM aug a, range(24) x(x), range(24) y(y), range(3) c(c)
)
SELECT doc_id, channel, flip, ox, oy,
  CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS ss
FROM px GROUP BY 1, 2, 3, 4, 5 ORDER BY doc_id, channel
"""))

  def all: Seq[QuerySpec] = Seq(q318, q336)
}
