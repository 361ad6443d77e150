package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftagg.BitmapDistinctAgg
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** COUNT(DISTINCT) → exact-bitmap rewrite — the "distinct via index"
  * substitution columnar stores perform when a column carries a
  * bitmap-friendly integer domain (ClickHouse `groupBitmap`, Druid
  * bitmap indexes): a distinct-count over a non-negative long key is
  * replaced by the native [[BitmapDistinctAgg]], which computes the
  * SAME exact answer with a fundamentally better plan.
  *
  * Why the plan wins: Spark executes `count(DISTINCT x)` mixed with
  * other aggregates by planting an EXPAND (one duplicated input row
  * per aggregate group — a corpus multiplier) followed by a two-phase
  * aggregate keyed on (group, x) — one shuffled row per distinct key.
  * The bitmap form is a single ordinary aggregate whose partial state
  * is a container-sparse bitmap (~1 bit per member of each occupied
  * id range, map-side combined), so the Expand disappears and the
  * exchange carries one buffer per group instead of one row per
  * distinct key. Exactness is not traded away — set-bit/OR/popcount
  * is the same answer count(DISTINCT) gives, under any partitioning.
  *
  * Opt-in (`spark.graft.bitmapDistinct.enabled=true`): the conf is
  * the user's declaration that rewritten keys lie in the bitmap's
  * [0, 2⁴⁷) domain — an out-of-domain key still fails LOUDLY at
  * execution (the aggregate's own guard) rather than corrupting;
  * nothing is rewritten silently into wrongness. Only
  * `count(DISTINCT <single long-typed deterministic expr>)` rewrites
  * (multi-arg distinct counts distinct TUPLES; other types don't
  * index); FILTER clauses ride along untouched on the
  * AggregateExpression. Null semantics already agree: both forms
  * skip nulls.
  */
case class DistinctToBitmap() extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.bitmapDistinct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "false") != "true") return plan
    plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae: AggregateExpression if ae.isDistinct =>
            ae.aggregateFunction match {
              case Count(Seq(child))
                  if child.dataType == LongType && child.deterministic =>
                ae.copy(aggregateFunction = BitmapDistinctAgg(child),
                  isDistinct = false)
              case _ => ae
            }
        }
    }
  }
}
