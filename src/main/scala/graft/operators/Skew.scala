package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation: two-phase salted aggregate for keys whose
  * cardinality is low enough (or whose distribution is hot enough) that
  * a single hash aggregation would put one key's entire volume on one
  * reducer.
  *
  * Phase 1 groups by (key, salt) — the hot key's rows spread over
  * `buckets` reducers computing partials; phase 2 re-aggregates the
  * tiny partial table by key alone. Only decomposable aggregates
  * (sum/count/min/max, and avg via sum+count) qualify; the final
  * result is identical to the direct groupBy, so the oracle is the
  * plain SQL aggregate.
  *
  * (Spark's AQE skew-join handling covers joins; aggregation skew still
  * benefits from explicit salting when the partial-agg map side can't
  * absorb it.)
  */
object Skew {

  /** Salted sum/count/min/max of `valCol` grouped by `keyCol`. */
  def saltedStats(df: DataFrame, keyCol: String, valCol: String,
      buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(col(valCol)), lit(buckets)))
    val partial = salted.groupBy(col(keyCol), col("__salt")).agg(
      sum(col(valCol)).as("__sum"),
      count(col(valCol)).as("__cnt"),
      min(col(valCol)).as("__min"),
      max(col(valCol)).as("__max"))
    partial.groupBy(col(keyCol)).agg(
      sum(col("__sum")).as("total"),
      sum(col("__cnt")).as("n"),
      min(col("__min")).as("min_val"),
      max(col("__max")).as("max_val"))
      .withColumn("avg_val", col("total") / col("n"))
  }
}
