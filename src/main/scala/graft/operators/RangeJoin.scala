package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap (range) join — the operator class Spark's built-in
  * equi-join machinery cannot express directly: joining points to the
  * intervals containing them, or intervals to overlapping intervals,
  * turns into a `BroadcastNestedLoopJoin`/cartesian with a range
  * predicate — O(N·M) row comparisons, the classic scale killer the
  * moment neither side broadcasts.
  *
  * This is the standard BUCKETIZED range join (the same design Spark's
  * own session windows and every production range-join extension use):
  * quantize the range dimension into fixed-width buckets, explode each
  * interval over the buckets it covers, and equi-join on the bucket —
  * Catalyst then plans a plain shuffled hash/sort-merge join keyed by
  * bucket, and the exact range predicate refines the bucket-candidate
  * pairs. Cost falls from O(N·M) to O(N + Σ interval_len/w) exploded
  * rows with hash-join probes, and every Spark scale facility (AQE
  * skew split, broadcast-when-small, partial aggregation downstream)
  * applies because the plan IS a plain equi-join.
  *
  * Correctness shape: a point lives in exactly ONE bucket, so a
  * qualifying (point, interval) pair meets exactly once (the
  * interval's explosion covers that bucket exactly once) — no
  * post-join dedup, the output is duplicate-free by construction.
  *
  * Bucket-width discipline at 100 TB: `bucketWidth` should sit near
  * the TYPICAL interval length — too small explodes long intervals
  * into many rows (blow-up factor len/w), too large degrades the
  * bucket join toward all-pairs within a bucket. A pathological
  * super-long interval (a stuck sensor emitting a year-long span)
  * explodes into len/w rows: bounded, linear, and spread across
  * DIFFERENT bucket keys — i.e. the hazard degrades into extra rows,
  * never into one hot join key. Callers with heavy-tailed interval
  * lengths should split the interval side by length decile and run
  * two widths (the standard two-tier refinement); the operator keeps
  * the single-width core.
  */
object RangeJoin {

  /** Join `points` rows to every `intervals` row whose
    * `[startCol, endCol]` (inclusive both ends) contains the point's
    * `pointCol`. All three columns must be LONG (same unit, e.g.
    * epoch seconds). Output: all columns of `points`, then all
    * columns of `intervals` (caller disambiguates names beforehand).
    *
    * `keyCols` (present in BOTH frames) become additional equi-join
    * keys alongside the bucket — the per-symbol / per-user / per-host
    * scoping almost every production range join carries. This is not
    * just semantics, it is THE density control at scale: a global
    * (keyless) range join's candidate count grows with points-per-
    * bucket × intervals-per-bucket — QUADRATIC in event density, so
    * 100× the traffic over the same period costs 10 000× (measured:
    * q198's first keyless cut at sf10). Scoped by a key, per-bucket
    * density stays bounded per key and the join scales linearly with
    * the true output. Leave `keyCols` empty only when interval
    * density per bucket is known-bounded. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucket(c: Column): Column = floor(c / lit(bucketWidth))
    // one row per (interval, covered bucket); sequence() is exactly
    // the closed bucket range [floor(start/w), floor(end/w)]
    val expl = intervals
      .where(col(startCol) <= col(endCol))
      .withColumn("__rj_bucket",
        explode(sequence(bucket(col(startCol)), bucket(col(endCol)))))
    val pts = points.withColumn("__rj_bucket", bucket(col(pointCol)))
    pts.join(expl, keyCols :+ "__rj_bucket")
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__rj_bucket")
  }

  /** Interval×interval OVERLAP join: pairs (a, b) where
    * `[aStart, aEnd]` and `[bStart, bEnd]` intersect (closed ends).
    * Both intervals explode over their buckets; a pair of overlapping
    * intervals shares every bucket their INTERSECTION covers, so the
    * bucket equi-join finds it — and to keep the output exact-once
    * without a distinct, only the FIRST shared bucket (the bucket of
    * the intersection's left edge, `greatest(aStart, bStart)`) emits
    * the pair: a deterministic representative-bucket rule, the same
    * trick dedup band-buckets use, keeping the join duplicate-free by
    * construction rather than by an extra exchange. */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucket(c: Column): Column = floor(c / lit(bucketWidth))
    def expl(df: DataFrame, s: String, e: String): DataFrame = df
      .where(col(s) <= col(e))
      .withColumn("__rj_bucket",
        explode(sequence(bucket(col(s)), bucket(col(e)))))
    expl(left, lStart, lEnd).join(expl(right, rStart, rEnd), Seq("__rj_bucket"))
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .where(col("__rj_bucket") ===
        bucket(greatest(col(lStart), col(rStart))))
      .drop("__rj_bucket")
  }
}
