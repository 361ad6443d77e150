package graft.plans

import scala.collection.mutable.ArrayBuffer
import scala.util.Try

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Divide, EqualTo, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType, LongType, ShortType}

/** EAGER AGGREGATION — partial-aggregate pushdown below a join, the
  * classic group-by/join reordering of Yan & Larson (VLDB '95,
  * "Eager Aggregation and Lazy Aggregation"), restricted to the case
  * where it needs no count-multiplication fix-up: the join key is
  * UNIQUE on the dimension side, so each pre-aggregated fact group
  * matches at most one dim row and partials combine losslessly.
  *
  *   Aggregate(dimCols, SUM/COUNT/MIN/MAX(factExprs),
  *             Join(fact, dim, Inner, fk = pk))
  *     ⇒ Aggregate(dimCols, combine(partials),
  *         Join(Aggregate(fk, partials, fact), dim, Inner, fk = pk))
  *
  * with SUM→SUM(partial), COUNT→SUM(partial count), MIN/MAX→
  * MIN/MAX(partial). What that buys at scale: the join's shuffled
  * build input shrinks from one row per FACT row (10⁹–10¹⁰) to one
  * row per distinct fact KEY — for lineitem⋈orders a fixed ~4×, for
  * events⋈users often 10³× — and the pre-aggregation itself
  * map-side-combines, so the fact corpus is never exchanged at full
  * width. Spark's optimizer does not perform this rewrite (it pushes
  * partial aggregation into the aggregate EXEC, but never below a
  * join).
  *
  * Soundness needs only the dim-side uniqueness, which rides in the
  * same session conf [[UniqueKeyDistinctElim]] established (a path +
  * its unique key), plus an explicit opt-in because the rewrite is a
  * heuristic, not always a win (a near-unique fk pre-aggregates to
  * nothing and pays an extra operator):
  *
  *   spark.graft.eagerAgg.enabled = true
  *   spark.graft.unique.path = <dim parquet path>
  *   spark.graft.unique.cols = <the single unique key column>
  *
  * Guards (veto ⇒ untouched): inner join, single equi-conjunct; dim
  * side `[Project(attrs)]? [Filter(det)]? scan(unique.path)` with the
  * key produced by the scan itself (a dim Filter only drops groups —
  * safe; Project passthrough preserves uniqueness); aggregate
  * functions drawn from SUM (integral/floating child — decimal sums
  * re-widen and would change the output type), COUNT, MIN, MAX, AVG
  * (decomposed to double-sum + count, the same accumulation type
  * Average itself buffers in), no
  * DISTINCT, no FILTER clause, deterministic children referencing
  * only the fact side; grouping expressions are bare attributes; the
  * fact side is not itself an Aggregate (idempotency — the rewritten
  * plan re-enters the fixed-point batch and must not re-fire).
  * Output exprIds are preserved on every rebuilt alias, so parent
  * operators resolve unchanged. Floating-point note: re-associating
  * double sums can differ in the last ulp from the unpushed order —
  * same class of reordering Spark's own two-phase hash aggregation
  * already performs; exact for the integral types the registry uses.
  */
case class EagerAggregation() extends Rule[LogicalPlan] {

  private val EnabledKey = "spark.graft.eagerAgg.enabled"
  private val PathKey = "spark.graft.unique.path"
  private val ColsKey = "spark.graft.unique.cols"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledKey, "false") != "true") return plan
    val dimPath = conf.getConfString(PathKey, "")
    val dimCol = conf.getConfString(ColsKey, "").trim.toLowerCase
    if (dimPath.isEmpty || dimCol.isEmpty || dimCol.contains(","))
      return plan
    plan.transformUp {
      // ColumnPruning typically leaves an attribute-only Project
      // between the Aggregate and the Join; it is pure passthrough,
      // so match through it and let pruning re-derive it afterwards
      case agg @ Aggregate(groups, out, AggChild(
          join @ Join(l, r, Inner, Some(EqualTo(a: AttributeReference,
            b: AttributeReference)), _)), hint) =>
        tryPush(agg, groups, out, join, l, r, a, b, dimPath, dimCol, hint)
          .getOrElse(agg)
    }
  }

  private object AggChild {
    def unapply(p: LogicalPlan): Option[Join] = p match {
      case j: Join => Some(j)
      case Project(ps, j: Join)
          if ps.forall(_.isInstanceOf[AttributeReference]) => Some(j)
      case _ => None
    }
  }

  private def tryPush(agg: Aggregate, groups: Seq[Expression],
      out: Seq[NamedExpression], join: Join,
      l: LogicalPlan, r: LogicalPlan,
      a: AttributeReference, b: AttributeReference,
      dimPath: String, dimCol: String,
      hint: Option[org.apache.spark.sql.catalyst.plans.logical
        .AggregateHint]): Option[LogicalPlan] = {
    val oriented =
      if (r.outputSet.contains(b) && isUniqueDim(r, b, dimPath, dimCol))
        Some((l, a, r, b))
      else if (l.outputSet.contains(a) && isUniqueDim(l, a, dimPath, dimCol))
        Some((r, b, l, a))
      else None
    oriented.flatMap { case (fact, fk, dim, pk) =>
      if (fact.isInstanceOf[Aggregate] || !fact.outputSet.contains(fk))
        None
      else if (!groups.forall(_.isInstanceOf[Attribute])) None
      else {
        val groupAttrs = groups.map(_.asInstanceOf[Attribute])
        val boundOk = groupAttrs.forall(g =>
          fact.outputSet.contains(g) || dim.outputSet.contains(g))
        // one partial per aggregate, in output order
        val partials = ArrayBuffer.empty[Alias]
        var ok = boundOk
        val rebuilt = out.map {
          case attr: Attribute if groupAttrs.exists(_.exprId == attr.exprId) =>
            attr: NamedExpression
          case al @ Alias(ae: AggregateExpression, _)
              if ae.mode == Complete && !ae.isDistinct &&
                ae.filter.isEmpty &&
                ae.aggregateFunction.children.forall(c => c.deterministic &&
                  c.references.subsetOf(fact.outputSet)) &&
                pushable(ae) =>
            def partial(f: org.apache.spark.sql.catalyst.expressions
                .aggregate.AggregateFunction): Attribute = {
              val p = Alias(f.toAggregateExpression(),
                s"__ea${partials.length}")()
              partials += p
              p.toAttribute
            }
            val rebuilt: Expression = ae.aggregateFunction match {
              case s: Sum => Sum(partial(s)).toAggregateExpression()
              case c: Count =>
                // COUNT combines as SUM of partial counts, but the two
                // differ on EMPTY input: a global aggregate (no GROUP
                // BY) over a zero-row join yields COUNT=0 vs SUM=NULL.
                // Coalesce(…, 0L) restores the 0 AND keeps the output
                // attribute non-nullable — the original exprId is
                // reused, so a nullability flip would leak to parents.
                Coalesce(Seq(Sum(partial(c)).toAggregateExpression(),
                  Literal(0L)))
              case m: Min => Min(partial(m)).toAggregateExpression()
              case m: Max => Max(partial(m)).toAggregateExpression()
              case a: Average =>
                // avg decomposes to (double-sum, count) — the SAME
                // accumulation type Average itself buffers in, so the
                // rewrite changes grouping order only, never the
                // arithmetic class; null child rows drop from both
                // partials exactly as Average skips them
                val child = a.child.dataType match {
                  case DoubleType => a.child
                  case _ => Cast(a.child, DoubleType)
                }
                val ds = partial(Sum(child))
                val cnt = partial(Count(Seq(a.child)))
                Divide(Sum(ds).toAggregateExpression(),
                  Cast(Sum(cnt).toAggregateExpression(), DoubleType))
            }
            Alias(rebuilt, al.name)(
              exprId = al.exprId, qualifier = al.qualifier)
          case _ =>
            ok = false
            null
        }
        if (!ok || partials.isEmpty) None
        else {
          val factGroups: Seq[Attribute] =
            (groupAttrs.filter(g => fact.outputSet.contains(g)) :+ fk)
              .distinct
          val inner = Aggregate(factGroups,
            factGroups.map(identity[NamedExpression]) ++ partials.toSeq,
            fact)
          val newJoin = join.copy(
            left = if (join.left eq fact) inner else dim,
            right = if (join.left eq fact) dim else inner)
          Some(Aggregate(groups, rebuilt, newJoin, hint))
        }
      }
    }
  }

  /** SUM over integral/floating children keeps its result type when
    * re-summed; COUNT/MIN/MAX always combine losslessly; AVG (same
    * type domain) decomposes to double-sum + count. Decimal is out:
    * its sums re-widen their result type on the second pass. */
  private def pushable(ae: AggregateExpression): Boolean = {
    def ok(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case ShortType | IntegerType | LongType | FloatType |
           DoubleType => true
      case _ => false
    }
    ae.aggregateFunction match {
      case s: Sum => ok(s.child.dataType)
      case a: Average => ok(a.child.dataType)
      case _: Count | _: Min | _: Max => true
      case _ => false
    }
  }

  /** dim side is [Project(attribute-only)]? [Filter(deterministic)]?
    * scan(dimPath), with `pk` produced by the scan itself and naming
    * the declared unique column. */
  private def isUniqueDim(p: LogicalPlan, pk: AttributeReference,
      dimPath: String, dimCol: String): Boolean =
    pk.name.toLowerCase == dimCol && keyedScan(p, pk, dimPath)

  private def keyedScan(p: LogicalPlan, pk: AttributeReference,
      dimPath: String): Boolean = p match {
    case rel if isScanOf(rel, dimPath) =>
      rel.output.exists(_.exprId == pk.exprId)
    case Filter(c, child) if c.deterministic =>
      keyedScan(child, pk, dimPath)
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      keyedScan(child, pk, dimPath)
    case _ => false
  }

  private def isScanOf(p: LogicalPlan, base: String): Boolean = p match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      val hconf = fs.sparkSession.sessionState.newHadoopConf()
      val bp = new Path(base)
      val want = Try(bp.getFileSystem(hconf).makeQualified(bp).toUri)
        .getOrElse(bp.toUri)
      fs.location.rootPaths.exists { rp =>
        Try(rp.getFileSystem(hconf).makeQualified(rp).toUri)
          .getOrElse(rp.toUri) == want
      }
    case _ => false
  }
}
