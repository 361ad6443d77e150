package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite an inner join whose condition is a
  * RANGE predicate — `point >= start AND point <= end` (strict bounds
  * accepted too), the shape Spark can only plan as a broadcast-nested-
  * loop or cartesian — into the bucketized equi-join
  * [[graft.operators.RangeJoin]] builds by hand:
  *
  * {{{
  *   intervals                     points
  *      │ filter(start <= end)        │
  *      │ explode(sequence(           │
  *      │   ⌊start/w⌋ .. ⌊end/w⌋))    │
  *      └────────┬───────────────────┘
  *         equi-join on bucket  (+ any other equi keys already
  *         in the condition — they extract as join keys alongside)
  *               │ re-apply the original range predicate
  *            project (drop the bucket)
  * }}}
  *
  * After the rewrite Catalyst sees a plain equi-join — hash/sort-merge
  * planning, AQE skew splitting, and broadcast selection all apply —
  * and the range predicate only refines bucket-local candidates. A
  * point lives in one bucket, so no duplicates are introduced and no
  * distinct is needed. This is the range-join optimization production
  * engines ship as a hint; here it triggers off one session conf:
  *
  *   `spark.graft.rangeJoin.bucketWidth` — bucket width in the range
  *   column's own units; 0 (default) disables the rule. Pick it near
  *   the typical interval length (see RangeJoin's scaladoc for the
  *   width discipline; the same density caveats apply).
  *
  * Scope guards (all must hold, otherwise the join is left alone):
  * inner join; all three range expressions are LongType and
  * deterministic; point references exactly one side and both bounds
  * the other; the condition does not already carry a `__rj_bucket`
  * reference (idempotence under the optimizer's fixed-point driver).
  * Bucketing uses exact integer floor division — `(x − pmod(x, w))
  * div w` — so negative timestamps bucket correctly and no double
  * rounding is involved at any magnitude.
  */
case class RangeJoinRewrite() extends Rule[LogicalPlan] with PredicateHelper {

  private val ConfKey = "spark.graft.rangeJoin.bucketWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w =
      try conf.getConfString(ConfKey, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _)
          if !cond.references.exists(_.name == "__rj_bucket") =>
        rewrite(j, w).getOrElse(j)
    }
  }

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val cond = j.condition.get
    val conjuncts = splitConjunctivePredicates(cond)
    // `true` = expression references only the left side
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(j.left.outputSet)) Some(true)
      else if (e.references.subsetOf(j.right.outputSet)) Some(false)
      else None
    def usable(e: Expression): Boolean =
      e.dataType == LongType && e.deterministic && sideOf(e).isDefined
    // (point, bound) candidates; strict bounds included — the
    // re-applied original predicate keeps exact semantics either way
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(a, b) => (a, b)
      case GreaterThan(a, b) => (a, b)
      case LessThanOrEqual(b, a) => (a, b)
      case LessThan(b, a) => (a, b)
    }
    val uppers = conjuncts.collect {
      case LessThanOrEqual(a, b) => (a, b)
      case LessThan(a, b) => (a, b)
      case GreaterThanOrEqual(b, a) => (a, b)
      case GreaterThan(b, a) => (a, b)
    }
    val candidates = for {
      (pl, s) <- lowers if usable(pl) && usable(s)
      (pu, e) <- uppers if usable(pu) && usable(e)
      if pl.semanticEquals(pu)
      pSide <- sideOf(pl)
      sSide <- sideOf(s)
      eSide <- sideOf(e)
      if sSide == eSide && sSide != pSide
    } yield (pl, s, e, pSide)
    candidates.headOption.map { case (point, s, e, pointOnLeft) =>
      val wLit = Literal(w, LongType)
      def bkt(x: Expression): Expression =
        new IntegralDivide(new Subtract(x, new Pmod(x, wLit)), wLit)
      val ivPlan = if (pointOnLeft) j.right else j.left
      // inverted intervals match nothing in the original join; the
      // filter also guards Sequence against a negative step
      val ivFiltered = Filter(LessThanOrEqual(s, e), ivPlan)
      val bucketAttr =
        AttributeReference("__rj_bucket", LongType, nullable = false)()
      // TimeZoneAwareExpression.resolved requires the zone to be SET
      // even for integral sequences — an optimizer-constructed node
      // never passes through ResolveTimeZone, so set it here
      val gen = Generate(
        Explode(new Sequence(bkt(s), bkt(e), Some(Literal(1L, LongType)))
          .withTimeZone(conf.sessionLocalTimeZone)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bucketAttr), child = ivFiltered)
      val (nl, nr) = if (pointOnLeft) (j.left, gen) else (gen, j.right)
      val newCond = And(EqualTo(bkt(point), bucketAttr), cond)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
    }
  }
}
