package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Packing

/** Sequence packing: hand-pinned window composition, the two-phase
  * prefix sum against the single-window reference, and partition-count
  * invariance (the distributed form must be EXACT, not approximate).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("hand example: docs spanning boundaries land in both windows") {
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 2L)).toDF("doc_id", "n")
    val packed = Packing.packSequences(docs, "doc_id", "n",
      capacity = 4, partitions = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // stream: d1 [0,3) d2 [3,7) d3 [7,9); windows of 4 tokens:
    //   seq0 = d1(3) + d2(1);  seq1 = d2(3) + d3(1);  seq2 = d3(1)
    assert(packed.toSeq == Seq(
      (0L, 2L, 4L, 1L, 2L),
      (1L, 2L, 4L, 2L, 3L),
      (2L, 1L, 1L, 3L, 3L)))
  }

  test("two-phase prefix sum == single-window reference; exact fill") {
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .where(col("n") > 0)
    val twoPhase = Packing.withCumulativeSum(docs, "doc_id", "n", 8)
      .select("doc_id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val reference = docs.withColumn("cum",
        sum("n").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("doc_id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(twoPhase == reference)

    // partition-count invariance of the full pack
    def pack(p: Int) = Packing.packSequences(docs, "doc_id", "n", 1024, p)
      .collect().map(_.toSeq).toSeq
    assert(pack(3) == pack(16))

    // every window exactly full except the last; totals conserved
    val rows = Packing.packSequences(docs, "doc_id", "n", 1024, 8)
      .collect()
    val fills = rows.map(r => r.getAs[Long]("n_tokens"))
    assert(fills.dropRight(1).forall(_ == 1024L),
      "only the final window may be partial")
    assert(fills.sum == docs.agg(sum("n")).head().getLong(0))
  }

  test("rank consistency at boundary-sensitive scale (the q192 regression)") {
    // 30k rows with string keys: the Dataset rangepartitioning form
    // re-sampled its boundaries per job at this size and shifted ranks
    // near every partition boundary (metrics identical, ranks off —
    // the q192 RFM quartile bug). The sortByKey core must produce the
    // exact row_number ranks at any size and any partition count.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val n = 30000
    val df = s.range(n.toLong).toDF("id")
      .select(col("id"), md5(col("id").cast("string")).as("k"))
      .withColumn("one", lit(1L))
    for (parts <- Seq(7, 32)) {
      val got = graft.operators.Packing
        .withCumulativeSum(df, "k", "one", parts)
        .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
      val want = df.orderBy("k").select("id").as[Long].collect()
        .zipWithIndex.map { case (id, i) => (id, i + 1L) }.sortBy(_._1)
      assert(got.toSeq == want.toSeq, s"parts=$parts")
    }
  }

  test("two-measure packed prefix sums == sequential fold at any " +
      "partition count (the q326 core)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // adversarial keys: duplicates, negatives, Long extremes ordering
    val rows = Seq(
      (5L, 2L, 10L), (-3L, 1L, 7L), (5L, 4L, 1L), (0L, 3L, 3L),
      (Long.MinValue + 1, 1L, 1L), (Long.MaxValue, 2L, 2L),
      (-3L, 5L, 5L), (7L, 1L, 4L))
    val df = rows.toDF("x", "n1", "n2")
    // sequential reference: sort by key (stable on input order for
    // ties — the core must produce SOME total order whose per-row
    // inclusive sums are consistent; with tied keys the cum at the
    // LAST row of each key group is order-invariant, so compare the
    // per-key maximum cums plus the grand totals
    val want = rows.sortBy(_._1)
    val wantByKeyMax = want.zipWithIndex.map { case ((x, a, b), i) =>
      val pre = want.take(i + 1)
      (x, pre.map(_._2).sum, pre.map(_._3).sum)
    }.groupBy(_._1).map { case (x, g) =>
      (x, g.map(_._2).max, g.map(_._3).max)
    }
    for (parts <- Seq(1, 3, 8)) {
      val got = graft.operators.Packing
        .withCumulativeSums2Packed(df, "x", "n1", "n2", parts)
        .select("k", "n1", "n2", "cum1", "cum2")
        .as[(Long, Long, Long, Long, Long)].collect()
      // totals exact
      assert(got.map(_._2).sum == rows.map(_._2).sum)
      assert(got.map(_._3).sum == rows.map(_._3).sum)
      // inclusive cums non-decreasing in key order
      val sorted = got.sortBy(r => (r._1, r._4))
      assert(sorted.zip(sorted.tail).forall { case (a, b) =>
        a._4 <= b._4 && a._5 <= b._5 })
      // per-key final cums match the sequential fold
      val gotByKeyMax = got.groupBy(_._1).map { case (x, g) =>
        (x, g.map(_._4).max, g.map(_._5).max)
      }
      assert(gotByKeyMax.toSet == wantByKeyMax.toSet, s"parts=$parts")
    }
  }
}
