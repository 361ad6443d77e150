package org.apache.spark.sql.graftexec

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.classic.{Dataset, SparkSession, Strategy}
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampNTZType, TimestampType}

/** Whole-operator extension exemplar (SURVEY §7.2 preference (c)):
  * the backward AS-OF JOIN as a first-class plan — custom
  * [[AsOfJoin]] logical node, [[AsOfJoinStrategy]] planner strategy
  * (injected by [[graft.GraftExtensions]]), and [[AsOfJoinExec]]
  * physical operator.
  *
  * Why a physical operator when [[graft.operators.AsOf]] already
  * composes the semantics from built-ins: the union+window form
  * materializes BOTH streams through one window whose running
  * `last(ignoreNulls)` drags the matched payload struct across every
  * row, and sorts the union (L+R rows). This exec instead asks
  * Catalyst for co-partitioned inputs sorted by (key, time) — the
  * standard `requiredChildDistribution` / `requiredChildOrdering`
  * contract, so EnsureRequirements plans the exchanges and sorts and
  * AQE still re-plans them — and then streams a two-pointer merge per
  * partition: O(L+R) with ONE retained right row of state, no union,
  * no window buffer. Semantics are pinned to DuckDB's
  * `ASOF JOIN ... ON r.ts <= l.ts`: for every left row, the LATEST
  * right row with the same key and rightTs ≤ leftTs (ties at equal
  * timestamps match); unmatched left rows keep null right columns.
  *
  * v1 scope (asserted at construction): keys and timestamps evaluate
  * to integral/timestamp types (compared as primitive longs — the
  * engine's as-of joins key on ids and epoch times). Rows are merged
  * interpreted (no codegen); the operator is a codegen boundary like
  * any blocking SparkPlan.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] → [[AsOfJoinExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions);
  * [[AsOfJoinPhysical.joinBackward]] also registers it idempotently
  * on `spark.experimental.extraStrategies` so plain sessions (tests)
  * can plan the node too. */
object AsOfJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd) :: Nil
    case _ => Nil
  }
}

/** @param forward false = backward (latest right with rt ≤ lt);
  *                true = forward (earliest right with rt ≥ lt). The
  *                forward merge is the backward one over time
  *                REVERSED: both sides sort (key asc, time desc), and
  *                advancing through rights with rt ≥ lt retains the
  *                smallest qualifying rt. */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    forward: Boolean = false) extends BinaryExecNode {

  private def longAble(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | TimestampType | TimestampNTZType => true
    case _ => false
  }
  require(Seq(leftKey, rightKey, leftTs, rightTs).forall(longAble),
    "as-of join v1 compares keys/timestamps as longs " +
      s"(got ${Seq(leftKey, rightKey, leftTs, rightTs).map(_.dataType)})")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition on the key, sort each side by (key, time): the merge
  // below then sees both streams in lockstep. EnsureRequirements
  // inserts the exchanges/sorts; AQE re-plans them like any join's.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    val tsDir = if (forward) Descending else Ascending
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, tsDir)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, tsDir)) :: Nil
  }
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTs, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTs, right.output)
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      // the projection's INPUT schema must carry the right side as
      // nullable — with the original (non-null) attributes the
      // generated code elides null checks and reads garbage zeros
      // from the null-fill row
      val outProj = UnsafeProjection.create(allOut,
        leftOut ++ rightOut.map(_.withNullability(true)))
      @inline def asLong(v: Any): Long = v.asInstanceOf[Number].longValue
      new Iterator[InternalRow] {
        private var haveKey = false
        private var curKey = 0L
        private var lastMatch: InternalRow = null
        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = asLong(lkB.eval(l))
          val lt = asLong(ltB.eval(l))
          if (!haveKey || curKey != lk) {
            haveKey = true; curKey = lk; lastMatch = null
          }
          // discard right rows for keys already passed, then advance
          // through this key's rows up to the left time — the retained
          // row IS the as-of match (time ascends backward / descends
          // forward, so the pointer never rewinds; ties rTs == lt are
          // taken in both directions, matching DuckDB)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rh = rBuf.head
            val rk = asLong(rkB.eval(rh))
            if (rk < lk) { rBuf.next() }
            else if (rk == lk && {
              val rt = asLong(rtB.eval(rh))
              if (forward) rt >= lt else rt <= lt
            }) {
              lastMatch = rBuf.next().copy()
            } else advancing = false
          }
          numOutputRows += 1
          if (lastMatch != null) {
            numMatched += 1
            outProj(joined(l, lastMatch))
          } else outProj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point. Output = all left columns, then the
  * right columns (nulled when no match). The right side is re-aliased
  * with fresh expression ids so self-joins (both sides derived from
  * one scan) can't collide. */
object AsOfJoinPhysical {
  def joinBackward(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String): DataFrame =
    join(left, right, leftKey, rightKey, leftTs, rightTs, forward = false)

  def joinForward(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String): DataFrame =
    join(left, right, leftKey, rightKey, leftTs, rightTs, forward = true)

  private def join(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String,
      forward: Boolean): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[SparkSession]
    // idempotent fallback registration: extension-built sessions get
    // the strategy from GraftExtensions; plain sessions (shared test
    // harness) get it here. Only AsOfJoin nodes are affected.
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // fresh ids for the right side (self-join safety for a custom
    // node DeduplicateRelations doesn't know)
    val rPlan = Project(
      rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    Dataset.ofRows(spark, AsOfJoin(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTs), attr(rPlan, rightTs), forward))
  }
}
