package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialized-summary builder — the producing half of the
  * [[graft.plans.SummaryRewrite]] aggregate-navigation contract.
  *
  * One pass over the fact table emits a per-group row of mergeable
  * partials:
  *
  *   g1 .. gk | __cnt | m__sum | m__min | m__max   (per measure m)
  *
  * Everything stored is a MERGEABLE partial (count/sum re-add,
  * min/max re-min/max), so any aggregate at a COARSER granularity —
  * any subset of the grouping columns, any filter over them — is
  * answerable from the summary alone; that closure property is
  * exactly what the rewrite rule exploits. avg intentionally has no
  * partial column: it is not mergeable as stored, and a consumer
  * writes sum/count explicitly (the rewrite then serves both halves).
  *
  * Scale: the build is ONE map-side-combinable groupBy — the same
  * shuffle any one of the covered dashboard aggregates would have
  * paid ONCE. At 100 TB the summary for a (flag, status, day)-grade
  * rollup is ~10⁵ rows: every covered query thereafter reads
  * kilobytes, not terabytes, and incremental maintenance is a
  * partition-wise re-build of changed days unioned with the
  * untouched remainder (the q232 base/delta merge pattern).
  */
object Summary {

  /** Aggregate `df` to `groups` granularity with count/sum/min/max
    * partials for every column in `measures`. */
  def build(df: DataFrame, groups: Seq[String], measures: Seq[String])
      : DataFrame = {
    require(groups.nonEmpty && measures.nonEmpty,
      "summary needs >=1 group column and >=1 measure column")
    require(!(groups ++ measures).exists(_.contains("__")),
      "base column names must not contain '__' (contract separator)")
    val aggs =
      count(lit(1)).as("__cnt") +:
        measures.flatMap(m => Seq(
          sum(col(m)).as(s"${m}__sum"),
          min(col(m)).as(s"${m}__min"),
          max(col(m)).as(s"${m}__max")))
    df.groupBy(groups.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
