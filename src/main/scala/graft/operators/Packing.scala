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

  /** Exact global cumulative sum of `nCol` in `idCol` order, without
    * a single-partition window: range-partition by id, local window
    * per partition, then add each partition's driver-prefixed offset
    * via a broadcast join. */
  def withCumulativeSum(df: DataFrame, idCol: String, nCol: String,
      partitions: Int): DataFrame = {
    val spark = df.sparkSession
    // The input is consumed THREE times (the range partitioner's
    // boundary-sampling pass, the partitioned map pass, and the totals
    // aggregate), and a computed/filtered child under a rangepartitioning
    // exchange can degrade far past 3x: measured 45 s vs 2 s at 500k rows
    // when the child was a regex tokenize + n>0 filter (the q34/q106
    // materialization lesson surfacing INSIDE the exchange). Persist the
    // input once — callers pass narrow (id, n) frames, so the cache is
    // bytes-per-row small; released by the CacheRegistry owner
    // (Verify/Bench) after the query completes.
    val src = graft.CacheRegistry.persistTracked(df)
    val parted = src.repartitionByRange(partitions, col(idCol))
      .sortWithinPartitions(idCol)
      .withColumn("__pid", spark_partition_id())
    val local = parted.withColumn("__local_cum",
      sum(col(nCol)).over(
        Window.partitionBy("__pid").orderBy(idCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // driver-side prefix over ≤ `partitions` rows
    val totals = local.groupBy("__pid").agg(sum(col(nCol)).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t)
    }.dropRight(1).zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    local.join(broadcast(offDf), Seq("__pid"), "left")
      .withColumn("cum", col("__local_cum") + coalesce(col("__off"), lit(0L)))
      .drop("__pid", "__local_cum", "__off")
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
