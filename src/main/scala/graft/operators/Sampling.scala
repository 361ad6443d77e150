package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling — the reproducibility primitive a
  * training-data pipeline mixes sources with. `df.sample()` draws from
  * a seeded RNG whose outcome depends on partitioning, so re-runs and
  * engines disagree; hashing a stable KEY makes inclusion a pure
  * function of the row — the same rows are chosen on every run, every
  * engine, every partition layout, and a row's fate never changes when
  * the corpus around it grows (the property that keeps train/test
  * splits stable across dataset versions).
  *
  * The hash is md5 (identical in Spark and DuckDB, like every other
  * signature in this engine), folded to a uniform bucket in [0, 1e6):
  * narrow codegen'd projection, no shuffle, no RNG anywhere.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform bucket in [0, Buckets) from a key column; salt derives
    * independent samples from the same keys (different salt → an
    * unrelated, equally-uniform assignment). */
  def hashBucket(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long") % Buckets

  /** Keep a deterministic `fraction` of rows by key. */
  def sampleByKey(df: DataFrame, key: Column, fraction: Double,
      salt: String = ""): DataFrame =
    df.where(hashBucket(key, salt) < (fraction * Buckets).toLong)

  /** Stratified deterministic sampling: per-stratum fractions (data
    * mixing), with a default for unlisted strata. The whole predicate
    * is one codegen'd CASE over the stratum column — a single narrow
    * scan, no per-stratum jobs. */
  def sampleStratified(df: DataFrame, key: Column, stratum: Column,
      fractions: Map[String, Double], defaultFraction: Double,
      salt: String = ""): DataFrame = {
    val threshold = fractions.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (s, f)) => acc.when(stratum === s, (f * Buckets).toLong)
    }.otherwise((defaultFraction * Buckets).toLong)
    df.where(hashBucket(key, salt) < threshold)
  }

  /** Disjoint deterministic train/holdout split: the same hash with
    * one threshold, so membership is exclusive and exhaustive. */
  def split(df: DataFrame, key: Column, holdoutFraction: Double,
      salt: String = ""): (DataFrame, DataFrame) = {
    val cut = (holdoutFraction * Buckets).toLong
    val b = hashBucket(key, salt)
    (df.where(b >= cut), df.where(b < cut))
  }
}
