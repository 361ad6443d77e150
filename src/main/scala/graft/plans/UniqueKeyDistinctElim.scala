package graft.plans

import scala.util.Try

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf

/** Uniqueness-aware DISTINCT elimination — the functional-dependency
  * optimization every warehouse optimizer performs from declared
  * PRIMARY KEY / UNIQUE constraints (see e.g. the "eliminate distinct
  * on key-preserving trees" rewrites in classic query-optimization
  * literature). Spark has no constraint catalog for parquet paths, so
  * the key declaration rides in session conf, mirroring
  * [[SummaryRewrite]]'s opt-in shape:
  *
  *   spark.graft.unique.path = <base parquet path>
  *   spark.graft.unique.cols = <comma-separated unique key columns>
  *
  * A `SELECT DISTINCT c1..cn FROM base [WHERE …]` compiles to
  * `Aggregate(groups = out = c1..cn)` (ReplaceDistinctWithAggregate).
  * When the grouping set CONTAINS the declared unique key and the
  * child is a key-preserving tree over the declared relation
  * ([Project(attrs)]? [Filter(deterministic)]? scan — filters only
  * remove rows, attribute projections only drop columns; neither can
  * introduce a duplicate of a unique key), the Aggregate is provably
  * a no-op and is removed. What that buys at scale: DISTINCT over a
  * key-bearing projection is a full corpus-wide Exchange + two-phase
  * HashAggregate on a 10⁹-row fact table; the rewrite deletes the
  * shuffle entirely.
  *
  * Anything else — grouping set missing a key column, non-attribute
  * projections (an expression can collapse distinct keys), a
  * nondeterministic filter, a different relation — is left untouched:
  * the rewrite must never fire where duplicates are possible.
  */
case class UniqueKeyDistinctElim() extends Rule[LogicalPlan] {

  private val PathKey = "spark.graft.unique.path"
  private val ColsKey = "spark.graft.unique.cols"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val base = conf.getConfString(PathKey, "")
    val cols = conf.getConfString(ColsKey, "")
    if (base.isEmpty || cols.isEmpty) return plan
    val key = cols.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet
    if (key.isEmpty) return plan
    plan.transformUp {
      case agg @ Aggregate(groups, out, child, _)
          if isDistinctShape(groups, out) &&
            groupsCoverKey(groups, key) &&
            keyPreservingOver(child, base) =>
        // distinct over a unique key is the identity: keep the
        // projection (exprIds of `out` must survive for the parent)
        Project(out, child)
    }
  }

  /** Aggregate(g, out, _) is a DISTINCT iff out == groups as
    * attribute lists (no aggregate functions, no reordering). */
  private def isDistinctShape(groups: Seq[Expression],
      out: Seq[NamedExpression]): Boolean =
    groups.nonEmpty && groups.length == out.length &&
      out.forall(_.isInstanceOf[Attribute]) &&
      groups.forall(_.isInstanceOf[Attribute]) &&
      groups.zip(out).forall { case (g, o) =>
        g.asInstanceOf[Attribute].exprId == o.asInstanceOf[Attribute].exprId
      }

  private def groupsCoverKey(groups: Seq[Expression],
      key: Set[String]): Boolean = {
    val names = groups.collect {
      case a: AttributeReference => a.name.toLowerCase
    }.toSet
    key.subsetOf(names)
  }

  /** child is [Project(attrs)]? [Filter(deterministic)]? scan(base) —
    * a tree where every surviving row still carries a distinct key. */
  private def keyPreservingOver(p: LogicalPlan, base: String): Boolean =
    p match {
      case r if isBase(r, base) => true
      case Filter(c, r) if c.deterministic => keyPreservingOver(r, base)
      case Project(ps, r) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        keyPreservingOver(r, base)
      case _ => false
    }

  private def isBase(p: LogicalPlan, base: String): Boolean = p match {
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
