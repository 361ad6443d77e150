package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing — the step that turns a document corpus into
  * fixed-length training windows: documents are concatenated in a
  * deterministic order and the token stream is chunked into
  * `capacity`-token sequences (documents spanning a boundary
  * contribute to both windows; the attention mask downstream handles
  * cross-document boundaries). Every sequence is exactly `capacity`
  * tokens except the last — zero padding waste, the packing objective.
  *
  * Scale design: the global running token count is a TWO-PHASE prefix
  * sum — per-range-partition local window + driver-side prefix of the
  * (tiny, one-row-per-partition) partition totals broadcast back. No
  * single-partition global window ever materializes, so the pack
  * scales like any range-partitioned sort. All arithmetic is exact
  * integer division — the DuckDB oracle recomputes the identical
  * packing.
  */
object Packing {

  /** Exact global cumulative sum of `nCol` (read as an integral) in
    * `idCol` order, without a single-partition window. Appends a
    * `cum` LONG column (running total INCLUSIVE of the row).
    *
    * Implementation is a two-phase prefix sum over an RDD
    * `sortByKey`, chosen very deliberately over the DataFrame
    * `repartitionByRange` form it replaces:
    *
    *  - CORRECTNESS: the per-partition offsets are computed in one
    *    job and applied in another, so both jobs MUST see the same
    *    partition boundaries. A Dataset rangepartitioning exchange
    *    RE-SAMPLES its boundaries on every action (the sampling seed
    *    derives from the per-execution RDD id) — boundary-adjacent
    *    rows can land in different partitions across the two jobs and
    *    the offsets silently corrupt the ranks. Latent until a caller
    *    outgrew the regime where every run coalesced identically:
    *    first surfaced at 15k rows (q192's quartiles off by small
    *    shifts near each boundary; every smaller caller had been
    *    oracle-exact). `sortByKey` constructs its RangePartitioner
    *    ONCE, eagerly, at transformation time, and every job over the
    *    sorted RDD reuses the SAME shuffle files (DAGScheduler stage
    *    reuse) — one set of boundaries, by construction.
    *  - PERFORMANCE: stage reuse also means the (possibly expensive —
    *    regex tokenize class) input projection runs once for the
    *    partitioner sample and once for the shuffle map, never per
    *    consuming job: the Dataset form re-derived it per action and
    *    measured 125 s vs 7 s at 500k rows (q180, sf10).
    *
    * Key ordering: integral keys sort numerically; string keys sort
    * by UTF-8 bytes (unsigned lexicographic — exactly SQL/DuckDB
    * binary collation, NOT Java String UTF-16 order, which diverges
    * on supplementary characters). Ties across rows are
    * caller-ambiguous — callers pass unique keys.
    */
  def withCumulativeSum(df: DataFrame, idCol: String, nCol: String,
      partitions: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, IntegerType}
    val spark = df.sparkSession
    val schema = df.schema
    val idIdx = schema.fieldIndex(idCol)
    val nIdx = schema.fieldIndex(nCol)
    val sorted = schema(idIdx).dataType match {
      case StringType =>
        implicit val byteOrd: Ordering[Array[Byte]] = (a, b) => {
          var i = 0
          var res = 0
          val len = math.min(a.length, b.length)
          while (res == 0 && i < len) {
            res = (a(i) & 0xff) - (b(i) & 0xff)
            i += 1
          }
          if (res != 0) res else Integer.compare(a.length, b.length)
        }
        df.rdd.map(r => (r.getString(idIdx)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8), r))
          .sortByKey(ascending = true, numPartitions = partitions)
      case LongType | IntegerType =>
        df.rdd.map(r => (r.getAs[Number](idIdx).longValue(), r))
          .sortByKey(ascending = true, numPartitions = partitions)
      case dt =>
        throw new IllegalArgumentException(s"unsupported key type $dt")
    }
    // phase 1: per-partition totals (one tiny row per partition)
    val partSums = sorted.mapPartitionsWithIndex { (i, it) =>
      var acc = 0L
      it.foreach { case (_, r) => acc += r.getAs[Number](nIdx).longValue() }
      Iterator((i, acc))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](partSums.length + 1)
    partSums.foreach { case (i, t) => offsets(i + 1) = t }
    var i = 1
    while (i < offsets.length) { offsets(i) += offsets(i - 1); i += 1 }
    // phase 2: in-partition running sum + the partition's offset;
    // the shuffle files from phase 1 are REUSED (skipped stages)
    val outRows = sorted.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { case (_, r) =>
        acc += r.getAs[Number](nIdx).longValue()
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    spark.createDataFrame(outRows, schema.add("cum", LongType))
  }

  /** The primitive fast path of [[withCumulativeSum]] for callers
    * whose ENTIRE row packs into the long key (the caller decodes any
    * payload back out of `k` afterwards — q252's tid/time/pri packing
    * is the canonical example): the two-phase global prefix sum runs
    * over `RDD[(Long, Long)]` instead of `(key, Row)` — no
    * per-row `Row` boxing, schema references, or string keys through
    * the sort shuffle. Same machinery, same guarantees (eager
    * `sortByKey` partitioner → one set of boundaries, shuffle-file
    * reuse between the offsets job and the output job); measured ~3×
    * on a 20M-row sweep at sf10. Returns columns (`k`, `n`, `cum`).
    */
  def withCumulativeSumPacked(df: DataFrame, idCol: String, nCol: String,
      partitions: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val nIdx = df.schema.fieldIndex(nCol)
    val sorted = df.rdd
      .map(r => (r.getLong(idIdx), r.getLong(nIdx)))
      .sortByKey(ascending = true, numPartitions = partitions)
    val partSums = sorted.mapPartitionsWithIndex { (i, it) =>
      var acc = 0L
      it.foreach { case (_, n) => acc += n }
      Iterator((i, acc))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](partSums.length + 1)
    partSums.foreach { case (i, t) => offsets(i + 1) = t }
    var i = 1
    while (i < offsets.length) { offsets(i) += offsets(i - 1); i += 1 }
    val outRows = sorted.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { case (k, n) =>
        acc += n
        Row(k, n, acc)
      }
    }
    spark.createDataFrame(outRows, StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("cum", LongType, nullable = false))))
  }

  /** The prefix-MAX sibling of [[withCumulativeSumPacked]]: same
    * primitive two-phase machinery (eager long-key `sortByKey`, one
    * boundary set, shuffle-file reuse), with the running aggregate
    * being the MAX monoid instead of addition — per-partition maxes
    * collect to the driver, prefix-combine into offsets, and phase 2
    * emits the INCLUSIVE running max per row. The primitive that
    * turns "how late can an event arrive" (watermark sizing, q269)
    * into one sort instead of a per-key full-partition window.
    * Returns columns (`k`, `n`, `cummax`). Empty partitions carry
    * Long.MinValue offsets (the monoid identity). */
  def withCumulativeMaxPacked(df: DataFrame, idCol: String, nCol: String,
      partitions: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val nIdx = df.schema.fieldIndex(nCol)
    val sorted = df.rdd
      .map(r => (r.getLong(idIdx), r.getLong(nIdx)))
      .sortByKey(ascending = true, numPartitions = partitions)
    val partMaxes = sorted.mapPartitionsWithIndex { (i, it) =>
      var acc = Long.MinValue
      it.foreach { case (_, n) => if (n > acc) acc = n }
      Iterator((i, acc))
    }.collect().sortBy(_._1)
    val offsets = Array.fill(partMaxes.length + 1)(Long.MinValue)
    partMaxes.foreach { case (i, m) => offsets(i + 1) = m }
    var i = 1
    while (i < offsets.length) {
      if (offsets(i - 1) > offsets(i)) offsets(i) = offsets(i - 1)
      i += 1
    }
    val outRows = sorted.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { case (k, n) =>
        if (n > acc) acc = n
        Row(k, n, acc)
      }
    }
    spark.createDataFrame(outRows, StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("cummax", LongType, nullable = false))))
  }

  /** Two-measure sibling of [[withCumulativeSumPacked]]: one long-key
    * sort shuffle carries BOTH running sums (the Lorenz/Gini shape —
    * cumulative count AND cumulative count·value over the same value
    * order — q326's rank arithmetic needs exactly this pair; two
    * separate prefix passes would sort the histogram twice). Same
    * two-phase machinery: eager `sortByKey` fixes one boundary set,
    * per-partition totals (one tiny 2-long row per partition) collect
    * to the driver, prefix-combine into offsets, and phase 2 re-reads
    * the SAME shuffle files (skipped stages) emitting the INCLUSIVE
    * running sums. Returns columns (`k`, `n1`, `n2`, `cum1`, `cum2`).
    */
  def withCumulativeSums2Packed(df: DataFrame, idCol: String,
      n1Col: String, n2Col: String, partitions: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val idIdx = df.schema.fieldIndex(idCol)
    val n1Idx = df.schema.fieldIndex(n1Col)
    val n2Idx = df.schema.fieldIndex(n2Col)
    val sorted = df.rdd
      .map(r => (r.getLong(idIdx), (r.getLong(n1Idx), r.getLong(n2Idx))))
      .sortByKey(ascending = true, numPartitions = partitions)
    val partSums = sorted.mapPartitionsWithIndex { (i, it) =>
      var a1 = 0L; var a2 = 0L
      it.foreach { case (_, (n1, n2)) => a1 += n1; a2 += n2 }
      Iterator((i, a1, a2))
    }.collect().sortBy(_._1)
    val off1 = new Array[Long](partSums.length + 1)
    val off2 = new Array[Long](partSums.length + 1)
    partSums.foreach { case (i, t1, t2) => off1(i + 1) = t1; off2(i + 1) = t2 }
    var i = 1
    while (i < off1.length) {
      off1(i) += off1(i - 1); off2(i) += off2(i - 1); i += 1
    }
    val outRows = sorted.mapPartitionsWithIndex { (i, it) =>
      var a1 = off1(i); var a2 = off2(i)
      it.map { case (k, (n1, n2)) =>
        a1 += n1; a2 += n2
        Row(k, n1, n2, a1, a2)
      }
    }
    spark.createDataFrame(outRows, StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("n1", LongType, nullable = false),
      StructField("n2", LongType, nullable = false),
      StructField("cum1", LongType, nullable = false),
      StructField("cum2", LongType, nullable = false))))
  }

  /** Pack rows into `capacity`-token sequences. Returns one row per
    * sequence: (seq, n_docs, n_tokens, first_doc, last_doc). Rows with
    * zero tokens occupy no stream space and are excluded. */
  def packSequences(df: DataFrame, idCol: String, nCol: String,
      capacity: Int, partitions: Int = 32): DataFrame = {
    val cum = withCumulativeSum(
      df.where(col(nCol) > 0), idCol, nCol, partitions)
      .withColumn("start", col("cum") - col(nCol))
    // a document overlaps sequences floor(start/cap) .. floor((cum-1)/cap)
    val spanned = cum.select(col(idCol), col(nCol), col("start"), col("cum"),
      explode(sequence(expr(s"start div $capacity"),
        expr(s"(cum - 1) div $capacity"))).as("seq"))
    spanned.groupBy("seq")
      .agg(count(lit(1)).as("n_docs"),
        // tokens this doc contributes INSIDE this sequence window
        sum(least(col("cum"), (col("seq") + 1) * capacity) -
          greatest(col("start"), col("seq") * capacity)).as("n_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
      .orderBy("seq")
  }
}
