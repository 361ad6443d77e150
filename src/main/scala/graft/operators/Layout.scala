package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan pruning — the write-side half of
  * the 100 TB read path. Min/max file statistics only prune what the
  * LAYOUT clusters: a table range-sorted by one column answers box
  * predicates on that column alone; interleaving the bits of TWO
  * columns' grid cells (a Z-order / Morton curve) gives every file a
  * tight bounding box in BOTH dimensions, so a 2-d box predicate
  * skips all but the files the box actually crosses.
  *
  * Everything is built from codegen'd bit arithmetic on built-in
  * functions (shift/and/or) — no UDFs, and the z-value is a plain
  * column any writer can range-partition on. The per-column grid
  * bounds come from ONE tiny min/max aggregate; at 100 TB those
  * bounds come from table statistics instead and the write is the
  * same `repartitionByRange(z) + sortWithinPartitions(z)` shuffle a
  * plain global sort costs.
  */
object Layout {

  /** Scale a numeric column into a [0, 2^bits) integer grid cell
    * given its min/max (clamped, null → cell 0). */
  def gridCell(x: Column, mn: Double, mx: Double, bits: Int = 16): Column = {
    val span = if (mx > mn) mx - mn else 1.0
    val top = (1L << bits) - 1
    coalesce(
      least(lit(top), greatest(lit(0L),
        floor((x.cast("double") - mn) / span * top).cast("long"))),
      lit(0L))
  }

  /** Morton z-value: bit-interleave of two grid cells (a even bits,
    * b odd). A 2·bits-term OR of shifts — constant-size, fully
    * codegen'd. */
  def zValue(cellA: Column, cellB: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(cellA, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(cellB, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Write `df` z-ordered by two numeric columns into `numFiles`
    * parquet files: one stats pass for the grid bounds, then a single
    * range shuffle on the z-value. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int, bits: Int = 16): Unit = {
    val r = df.agg(min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    // Empty input (or an all-null cluster column) has null min/max;
    // there is nothing to cluster, but the numFiles contract still
    // holds: repartition instead of writing df's incidental partition
    // count (no-op cost for the empty case; a rows-but-all-null frame
    // would otherwise produce an arbitrary file count).
    if (r.isNullAt(0) || r.isNullAt(2)) {
      df.repartition(numFiles).write.mode("overwrite").parquet(path)
      return
    }
    val (aMn, aMx, bMn, bMx) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val z = zValue(gridCell(col(colA), aMn, aMx, bits),
      gridCell(col(colB), bMn, bMx, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Size-targeted sorted write: one count pass sizes the partition
    * fan-out so each output file carries ~`targetRows` rows, and
    * `maxRecordsPerFile` caps stragglers when the range partitioning
    * skews — the knob pair that keeps a 100 TB table's files inside
    * the scanner's sweet spot (too-small files cost per-file overhead,
    * too-large ones defeat parallelism and footer-stats pruning). At
    * warehouse scale the count comes from table statistics; the write
    * itself is the same single range shuffle either way. */
  def writeSized(df: DataFrame, sortCol: String, path: String,
      targetRows: Long): Unit = {
    val n = df.count()
    val numFiles = math.max(1L, (n + targetRows - 1) / targetRows).toInt
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.option("maxRecordsPerFile", targetRows)
      .mode("overwrite").parquet(path)
  }

  /** Baseline for comparison: range-sorted by a single column. */
  def writeLinear(df: DataFrame, colA: String, path: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(colA))
      .sortWithinPartitions(colA)
      .write.mode("overwrite").parquet(path)

  /** Files whose per-file [min,max]×[min,max] bounding box intersects
    * the query box — exactly the set a min/max-stats reader must scan
    * (parquet footer stats / manifest pruning). The measurement a
    * layout is judged by. */
  def filesIntersecting(df: DataFrame, colA: String, colB: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): Long =
    df.groupBy(input_file_name().as("f"))
      .agg(min(col(colA)).as("amn"), max(col(colA)).as("amx"),
        min(col(colB)).as("bmn"), max(col(colB)).as("bmx"))
      .where(col("amx") >= aLo && col("amn") <= aHi &&
        col("bmx") >= bLo && col("bmn") <= bHi)
      .count()
}
