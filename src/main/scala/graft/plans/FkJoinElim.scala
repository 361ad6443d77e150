package graft.plans

import scala.util.Try

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, ExprId, Expression, IsNotNull, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Join, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Referential-integrity JOIN ELIMINATION — the PK–FK rewrite every
  * warehouse optimizer performs from declared foreign-key constraints
  * (classic "join elimination on key-preserving views"; see e.g. the
  * redundant-join removal literature and the FK-join pruning notes in
  * published star-schema optimizer designs). An inner join whose only
  * purpose is to CHECK that the fact's foreign key resolves — no dim
  * column other than the key is consumed above it — is, under a
  * declared FK constraint, exactly `WHERE fk IS NOT NULL`: every
  * non-null fact key matches exactly one dim row (RI gives ≥1, the
  * dim key's uniqueness gives ≤1), so the join neither drops nor
  * duplicates anything else. What that buys at scale: the dropped
  * operator is a corpus-wide shuffle (or a dim broadcast) on a
  * 10⁹-row fact table, replaced by a null filter the parquet scan
  * absorbs. Queries shaped like this are common machine output —
  * BI tools and view-expanding ORMs join every declared dimension and
  * let projection pruning decide what's used.
  *
  * Spark has no constraint catalog for parquet paths, so the FK
  * declaration rides in session conf, mirroring
  * [[UniqueKeyDistinctElim]]'s opt-in shape:
  *
  *   spark.graft.fk.factPath / spark.graft.fk.factCol
  *   spark.graft.fk.dimPath  / spark.graft.fk.dimCol
  *
  * asserting: `dimCol` is UNIQUE in the relation at `dimPath`, and
  * every non-null `factCol` value in the relation at `factPath`
  * occurs in it (standard FK semantics; null fact keys simply don't
  * join, which the rewrite preserves via IsNotNull).
  *
  * The guarded pattern is `Project(exprs, Join(fact, dim, Inner,
  * fk = pk))` — plus two siblings sharing every guard: an Aggregate
  * directly on the join (the BI-rollup shape; grouping expressions
  * and aggregates together must consume nothing of the dim beyond
  * pk) and a bare Join whose own output qualifies (the no-op-Project-
  * removed shape) — where
  *  - the dim side is `[Project(attrs)]? scan(dimPath)` — bare: a
  *    dim-side Filter would remove fact rows, so its presence vetoes;
  *  - `pk` is produced BY the dim scan itself (exprId provenance, not
  *    name matching — an alias of some expression can collide on
  *    name) and names the declared `dimCol`;
  *  - `fk` is produced by a scan of `factPath` somewhere under the
  *    fact side and flows to the join unchanged (attribute passthrough
  *    — any exprId-preserving operator qualifies, but Union/Expand are
  *    vetoed because both can emit OTHER values under a reused
  *    exprId);
  *  - the projection consumes no dim attribute except possibly `pk`.
  *
  * A dim-side Filter is allowed ONLY when every conjunct references
  * nothing but `pk` itself (the inferred `pk IS NOT NULL` of every
  * inner equi-join, or a genuine key-range predicate): under RI each
  * non-null fact key IS a dim key, so a pk-only predicate holds for a
  * fact row iff it holds with `fk` substituted — the rewrite TRANSFERS
  * those conjuncts onto the fact side. A predicate touching any other
  * dim column could drop matching fact rows and vetoes.
  *
  * Rewrite: `Project(exprs[pk := fk],
  *   Filter(IsNotNull(fk) AND dimPreds[pk := fk], fact))`,
  * with a top-level bare `pk` output rebuilt as `Alias(fk, pkName)`
  * carrying the ORIGINAL exprId so parent plans resolve unchanged.
  * Anything else — an outer join, a second conjunct, a consumed dim
  * column, an undeclared relation — is left untouched.
  */
case class FkJoinElim() extends Rule[LogicalPlan] with PredicateHelper {

  private val FactPathKey = "spark.graft.fk.factPath"
  private val FactColKey = "spark.graft.fk.factCol"
  private val DimPathKey = "spark.graft.fk.dimPath"
  private val DimColKey = "spark.graft.fk.dimCol"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val factPath = conf.getConfString(FactPathKey, "")
    val factCol = conf.getConfString(FactColKey, "").trim.toLowerCase
    val dimPath = conf.getConfString(DimPathKey, "")
    val dimCol = conf.getConfString(DimColKey, "").trim.toLowerCase
    if (factPath.isEmpty || factCol.isEmpty || dimPath.isEmpty ||
      dimCol.isEmpty) return plan
    plan.transformUp {
      case p @ Project(exprs,
          Join(l, r, Inner, Some(EqualTo(a: AttributeReference,
            b: AttributeReference)), _)) =>
        eliminate(exprs, l, r, a, b, factPath, factCol, dimPath, dimCol)
          .map { case (fk, pk, newChild) =>
            Project(substOutputs(exprs, pk, fk), newChild)
          }.getOrElse(p)
      // the BI-rollup shape: an Aggregate sits directly on the join
      // and consumes only fact columns (grouping by the fk itself is
      // common — "revenue per order id" — and substitutes to fk)
      case agg @ Aggregate(groups, aggs,
          Join(l, r, Inner, Some(EqualTo(a: AttributeReference,
            b: AttributeReference)), _), hint) =>
        eliminate(groups ++ aggs, l, r, a, b,
          factPath, factCol, dimPath, dimCol)
          .map { case (fk, pk, newChild) =>
            Aggregate(groups.map(substPk(_, pk, fk)),
              substOutputs(aggs, pk, fk), newChild, hint)
          }.getOrElse(agg)
      // no Project above (the select list matched the join output, so
      // the no-op Project was removed): when the dim side is pruned
      // to exactly [pk], every join output is a fact column or pk
      // itself — eliminable regardless of what consumes it above
      case j @ Join(l, r, Inner, Some(EqualTo(a: AttributeReference,
          b: AttributeReference)), _) =>
        eliminate(j.output, l, r, a, b,
          factPath, factCol, dimPath, dimCol)
          .map { case (fk, pk, newChild) =>
            Project(substOutputs(
              j.output.map(identity[NamedExpression]), pk, fk), newChild)
          }.getOrElse(j)
    }
  }

  private def substPk(e: Expression, pk: AttributeReference,
      fk: AttributeReference): Expression = e.transform {
    case attr: Attribute if attr.exprId == pk.exprId => fk
  }

  /** Rewrite an output list with pk references rebound to fk; a
    * top-level bare pk keeps its downstream exprId alive on an alias
    * of fk so parent plans resolve unchanged. */
  private def substOutputs(exprs: Seq[NamedExpression],
      pk: AttributeReference,
      fk: AttributeReference): Seq[NamedExpression] =
    exprs.map {
      case attr: Attribute if attr.exprId == pk.exprId =>
        Alias(fk, attr.name)(exprId = attr.exprId,
          qualifier = attr.qualifier)
      case ne => substPk(ne, pk, fk).asInstanceOf[NamedExpression]
    }

  /** All guards, shared by every consuming shape: orient the
    * condition, qualify dim + fact sides, require the consumed
    * expressions to touch nothing of the dim beyond pk, and build the
    * replacement fact-side child (null filter + transferred pk-only
    * dim predicates). Returns (fk, pk, newChild). */
  private def eliminate(consumed: Seq[Expression],
      l: LogicalPlan, r: LogicalPlan,
      a: AttributeReference, b: AttributeReference,
      factPath: String, factCol: String, dimPath: String, dimCol: String)
      : Option[(AttributeReference, AttributeReference, LogicalPlan)] = {
    // orient the equi-condition: which attr is the declared dim key?
    val oriented: Option[(LogicalPlan, AttributeReference, LogicalPlan,
      AttributeReference, Seq[Expression])] =
      (if (r.outputSet.contains(b)) dimInfo(r, b, dimPath, dimCol)
        .map(preds => (l, a, r, b, preds))
      else None).orElse(
        if (l.outputSet.contains(a)) dimInfo(l, a, dimPath, dimCol)
          .map(preds => (r, b, l, a, preds))
        else None)
    oriented.flatMap { case (fact, fk, dim, pk, dimPreds) =>
      val factOk = fact.outputSet.contains(fk) &&
        fk.name.toLowerCase == factCol &&
        scanProduces(fact, fk.exprId, factPath) &&
        !fact.exists(n => n.isInstanceOf[Union] || n.isInstanceOf[Expand])
      // the consumer may touch fact attrs and pk, nothing else of dim
      val dimRefsOk = consumed.flatMap(_.references)
        .forall(ref => fact.outputSet.contains(ref) || ref.exprId == pk.exprId)
      if (!factOk || !dimRefsOk) None
      else {
        val cond = (IsNotNull(fk) +: dimPreds.map(substPk(_, pk, fk)))
          .reduce[Expression](org.apache.spark.sql.catalyst
            .expressions.And(_, _))
        Some((fk, pk, Filter(cond, fact)))
      }
    }
  }

  /** dim side is `[Project(attribute-only) | Filter(pk-only det)]*
    * scan(dimPath)` with `pk` produced by the scan itself and naming
    * the declared unique col; returns the pk-only Filter conjuncts
    * (to transfer onto the fact key), or None if the shape doesn't
    * qualify. */
  private def dimInfo(p: LogicalPlan, pk: AttributeReference,
      dimPath: String, dimCol: String): Option[Seq[Expression]] =
    if (pk.name.toLowerCase != dimCol) None
    else p match {
      case rel if isScanOf(rel, dimPath) =>
        if (rel.output.exists(_.exprId == pk.exprId)) Some(Nil) else None
      case Project(ps, child)
          if ps.forall(_.isInstanceOf[AttributeReference]) =>
        dimInfo(child, pk, dimPath, dimCol)
      case Filter(c, child) if c.deterministic &&
          splitConjunctivePredicates(c).forall(
            _.references.forall(_.exprId == pk.exprId)) =>
        dimInfo(child, pk, dimPath, dimCol)
          .map(splitConjunctivePredicates(c) ++ _)
      case _ => None
    }

  /** some scan of `path` under `p` emits the attribute `id` itself. */
  private def scanProduces(p: LogicalPlan, id: ExprId,
      path: String): Boolean =
    p.exists {
      case rel: LogicalRelation =>
        isScanOf(rel, path) && rel.output.exists(_.exprId == id)
      case _ => false
    }

  private def isScanOf(p: LogicalPlan, base: String): Boolean = p match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      // fully-qualified URI compare (the SummaryRewrite lesson: a
      // path-component match would cross filesystems)
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
