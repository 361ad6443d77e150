package graft.plans

import scala.util.Try

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Catalyst optimizer rule: AGGREGATE NAVIGATION over a materialized
  * summary — the classic warehouse optimization (Oracle/Calcite
  * "materialized view rewrite", BigQuery "BI Engine rollups",
  * Druid/Pinot rollup segments). When a query aggregates the raw fact
  * table with sum/count/min/max at a granularity the summary already
  * covers, the engine answers it from the summary — usually orders of
  * magnitude smaller — instead of rescanning the fact table. At
  * 100 TB this is the difference between a full-corpus scan and a
  * metadata-sized read for every dashboard query that groups by a
  * covered dimension subset.
  *
  * Opt-in via two session confs (both unset by default → rule is a
  * no-op and an extended session plans identically to stock Spark):
  *
  *   - `spark.graft.summary.base`: absolute path of the base (fact)
  *     parquet directory the summary was derived from.
  *   - `spark.graft.summary.path`: absolute path of the summary
  *     parquet. Its schema is the contract: plain columns are the
  *     summary's GROUPING columns (named exactly as in the base
  *     table); `<m>__sum`, `<m>__min`, `<m>__max` hold per-group
  *     partials of base measure column `<m>`; `__cnt` holds the
  *     per-group row count. (This is what
  *     [[graft.operators.Summary.build]] writes.)
  *
  * Rewrite scope — ALL of the following must hold, else the plan is
  * left untouched (correctness never depends on the rule firing):
  *
  *   - the node is `Aggregate(G, out, child)` with `G` non-empty,
  *     every grouping expression a plain attribute of the base
  *     relation, and every grouping name a summary grouping column
  *     (i.e. the query's granularity is a COARSENING of the
  *     summary's);
  *   - `child` is the base-path parquet relation, optionally under a
  *     column-pruning `Project` of plain attributes and/or a `Filter`
  *     whose predicate references summary GROUPING columns only (such
  *     a predicate partitions whole summary groups, so re-applying it
  *     to summary rows is exact; a predicate on a measure column
  *     blocks the rewrite — it would need row-level data the summary
  *     no longer has);
  *   - every aggregate call is undecorated (no DISTINCT, no FILTER)
  *     `sum(m)` / `min(m)` / `max(m)` over a summarized measure
  *     column, or `count(*)` / `count(lit)`.
  *
  * The rewritten plan is `Aggregate(G', out', [Filter'] summaryScan)`
  * with `sum(m) → sum(m__sum)`, `min(m) → min(m__min)`,
  * `max(m) → max(m__max)`, `count(*) → coalesce(sum(__cnt), 0)`
  * (the coalesce restores count's non-null contract), each output
  * re-aliased under its ORIGINAL exprId so parent operators resolve
  * unchanged, and a final cast wherever re-aggregation widens a type
  * (decimal sums). Values are exactly the base aggregate's for
  * sum/min/max/count because integer/decimal addition is associative
  * and min/max are idempotent semilattice ops; float sums re-group
  * the addition order, which is the same reorder any shuffle already
  * performs (Spark float aggregation is order-indeterminate by
  * design — consumers needing exactness use integer cents, as this
  * repo's queries do).
  *
  * The summary relation is re-read per rewrite (fresh exprIds, so two
  * rewritten aggregates in one plan can never collide); at local
  * scale the listing is microseconds, in production the FileIndex is
  * catalog-cached. Idempotent under the optimizer's fixed point: the
  * rewritten child scans the summary path, which no longer matches
  * the base path.
  *
  * Reference anchor: the reference pipeline recomputes its sector
  * medians/aggregates from the raw frame on every run
  * (`transform_stock_data.py` §aggregate) — the Spark-native engine
  * instead lets ANY covered aggregate ride a maintained rollup, the
  * warehouse-side behavior its Looker consumers (README.md:255-292)
  * assume of the backing store.
  */
case class SummaryRewrite() extends Rule[LogicalPlan] with PredicateHelper {

  private val BaseKey = "spark.graft.summary.base"
  private val PathKey = "spark.graft.summary.path"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val base = conf.getConfString(BaseKey, "")
    val summary = conf.getConfString(PathKey, "")
    if (base.isEmpty || summary.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(groups, out, child, _) =>
        rewrite(agg, groups, out, child, base, summary).getOrElse(agg)
    }
  }

  /** child decomposition: (base relation, residual filter) if the
    * subtree is [Project(attrs)]? [Filter]? LogicalRelation(base). */
  private def decompose(child: LogicalPlan, base: String)
      : Option[Option[Expression]] = {
    def isBase(p: LogicalPlan): Boolean = p match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        // Compare fully-qualified URIs: a same-path relation on a
        // different filesystem (s3://bucket/data vs file:/data) must
        // NOT be answered from the summary.
        val hconf = fs.sparkSession.sessionState.newHadoopConf()
        val basePath = new Path(base)
        val want = Try(
          basePath.getFileSystem(hconf).makeQualified(basePath).toUri
        ).getOrElse(basePath.toUri)
        fs.location.rootPaths.exists { rp =>
          val got = Try(
            rp.getFileSystem(hconf).makeQualified(rp).toUri
          ).getOrElse(rp.toUri)
          got == want
        }
      case _ => false
    }
    child match {
      case r if isBase(r) => Some(None)
      case Filter(c, r) if isBase(r) => Some(Some(c))
      case Project(ps, r) if isBase(r) &&
          ps.forall(_.isInstanceOf[AttributeReference]) => Some(None)
      case Project(ps, Filter(c, r)) if isBase(r) &&
          ps.forall(_.isInstanceOf[AttributeReference]) => Some(Some(c))
      case _ => None
    }
  }

  private def rewrite(
      agg: Aggregate,
      groups: Seq[Expression],
      out: Seq[NamedExpression],
      child: LogicalPlan,
      base: String,
      summary: String): Option[LogicalPlan] = {
    if (groups.isEmpty) return None
    if (!groups.forall(_.isInstanceOf[AttributeReference])) return None
    val residual = decompose(child, base).getOrElse(return None)

    // summary contract columns, fresh exprIds per rewrite
    val sumPlan = Try(SparkSession.active.read.parquet(summary)
      .queryExecution.analyzed).getOrElse(return None)
    val sAttr: Map[String, Attribute] =
      sumPlan.output.map(a => a.name -> a).toMap
    val groupCols = sumPlan.output.map(_.name)
      .filter(n => n != "__cnt" && !n.contains("__")).toSet

    val groupNames = groups.map(_.asInstanceOf[AttributeReference].name)
    if (!groupNames.forall(groupCols.contains)) return None
    // residual filter may only reference summary grouping columns and
    // must be deterministic — a nondeterministic predicate (rand()<p)
    // applied once per summary GROUP instead of once per base ROW
    // changes semantics (count(*) would become all-or-nothing / group).
    if (!residual.forall(r => r.deterministic &&
      r.references.forall(a => groupCols.contains(a.name)))) return None

    def measure(a: Expression, suffix: String): Option[Attribute] =
      a match {
        case ar: AttributeReference => sAttr.get(ar.name + suffix)
        case _ => None
      }

    // rewrite one aggregate call; None = shape not covered
    def rewriteAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      val replaced: Option[Expression] = ae.aggregateFunction match {
        case s: Sum =>
          measure(s.child, "__sum").map(m =>
            Sum(m).toAggregateExpression())
        case m: Min =>
          measure(m.child, "__min").map(c =>
            Min(c).toAggregateExpression())
        case m: Max =>
          measure(m.child, "__max").map(c =>
            Max(c).toAggregateExpression())
        case c: Count if c.children.forall(_.foldable) &&
            c.children.forall(e => !e.nullable) =>
          sAttr.get("__cnt").map(cnt =>
            Coalesce(Seq(Sum(cnt).toAggregateExpression(), Literal(0L))))
        case _ => None
      }
      replaced.map { e =>
        if (e.dataType == ae.dataType) e else Cast(e, ae.dataType)
      }
    }

    // every output expression: grouping attrs re-point at the summary
    // column; every AggregateExpression re-targets partials. A single
    // unsupported call abandons the whole rewrite. Explicit recursion
    // (not transformUp/Down) so an aggregate call is swapped ATOMICALLY
    // — neither the original's measure child nor the replacement's
    // partial column is ever visited as a stray non-grouping attribute.
    var ok = true
    def rewriteExpr(e: Expression): Expression = e match {
      case ae: AggregateExpression =>
        rewriteAgg(ae).getOrElse { ok = false; ae }
      case a: AttributeReference if groupCols.contains(a.name) =>
        sAttr(a.name)
      case a: AttributeReference => ok = false; a
      case other => other.mapChildren(rewriteExpr)
    }
    val newOut: Seq[NamedExpression] = out.map {
      case a: AttributeReference if groupCols.contains(a.name) =>
        Alias(sAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(e, name) =>
        Alias(rewriteExpr(e), name)(exprId = al.exprId)
      case _ => ok = false; out.head
    }
    if (!ok) return None

    val newGroups: Seq[Expression] = groupNames.map(sAttr(_))
    val newChild: LogicalPlan = residual match {
      case Some(cond) =>
        val remapped = cond.transformUp {
          case a: AttributeReference => sAttr.getOrElse(a.name, a)
        }
        Filter(remapped, sumPlan)
      case None => sumPlan
    }
    Some(Aggregate(newGroups, newOut, newChild, None))
  }
}
