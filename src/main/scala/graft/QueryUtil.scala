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
    * reads the planned partition count without running a job.
    *
    * Probe safety: on an input whose plan already contains an
    * Exchange, `ds.rdd` under AQE would EXECUTE the upstream shuffle
    * stages eagerly — work the real query then repeats (measured: a
    * 3 s duplicated stage in q132's decontaminate call). Such an input
    * has already been given session-level parallelism by its own
    * exchange (and AQE coalescing below that means the data is small),
    * so balancing is a no-op there, decided STATICALLY; the partition
    * probe runs only on exchange-free (scan-rooted) plans, where it is
    * a few ms of planning and can execute nothing.
    */
  def balanced[T](ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] = {
    val par = ds.sparkSession.sparkContext.defaultParallelism
    // InMemoryTableScan counts too: a cached input's partitioning was
    // fixed when it was persisted, and probing it via `ds.rdd` would
    // materialize the cached plan's shuffles outside the real query
    val preParallelized = ds.queryExecution.sparkPlan.collectFirst {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
      case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => c
    }.isDefined
    if (preParallelized) ds
    else if (ds.rdd.getNumPartitions >= par) ds
    else ds.repartition(par)
  }
}
