package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass pipeline health metrics via `Dataset.observe`: row and
  * per-column null counters ride the SAME tasks as the observed plan
  * (accumulator-backed), so a 100 TB job reports its data-quality
  * numbers without a second scan — the mechanism behind production
  * "expectations" checks. Counters are exact, action-triggered, and
  * free of extra shuffles; read them from the `Observation` after any
  * action on the returned frame.
  */
object Health {

  /** Attach `rows` plus a `null_<col>` counter per listed column. */
  def withCounters(df: DataFrame, obs: Observation,
      nullCols: Seq[String]): DataFrame = {
    val metrics = count(lit(1)).as("rows") +: nullCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    df.observe(obs, metrics.head, metrics.tail: _*)
  }
}
