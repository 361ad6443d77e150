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
    * per-row work; at production scale the scan is already parallel
    * and this is a cheap metadata-sized shuffle, never a payload one.
    * Derived from the session (cores/env), not a constant — the same
    * binary balances at 7 or 32 cores.
    */
  def balanced[T](ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] =
    ds.repartition(ds.sparkSession.sparkContext.defaultParallelism)
}
