package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The [[graft.plans.RangeJoinRewrite]] optimizer rule: a BETWEEN-
  * predicate join in an extended session becomes a bucketized
  * equi-join when `spark.graft.rangeJoin.bucketWidth` is set — same
  * rows as the nested-loop plan, no cartesian in the physical plan —
  * and is left COMPLETELY alone when the conf is unset. */
class RangeJoinRuleSpec extends SparkSpec {

  private def withExtSession[T](f: SparkSession => T): T = {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val sess = SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try f(sess)
      finally sess.conf.unset("spark.graft.rangeJoin.bucketWidth")
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  private def fixtures(sess: SparkSession): (DataFrame, DataFrame) = {
    import sess.implicits._
    val pts = (0L until 300L).map(i => (i, i * 7 % 500)).toDF("pid", "t")
    val ivs = (0L until 60L).map(i => (i, i * 9, i * 9 + 40))
      .toDF("iid", "s", "e")
    (pts, ivs)
  }

  test("rewritten join returns exactly the nested-loop rows " +
      "(inclusive bounds, boundary points, no duplicates)") {
    withExtSession { sess =>
      val (pts, ivs) = fixtures(sess)
      val naive = pts.join(ivs, col("t") >= col("s") && col("t") <= col("e"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      sess.conf.set("spark.graft.rangeJoin.bucketWidth", "32")
      val rewritten = pts
        .join(ivs, col("t") >= col("s") && col("t") <= col("e"))
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rewritten.length == rewritten.toSet.size, "duplicates emitted")
      assert(rewritten.toSet == naive.toSet)
      assert(naive.nonEmpty) // the fixture actually joins
    }
  }

  test("physical plan: conf set → equi-join on the bucket, no " +
      "BroadcastNestedLoopJoin; conf unset → untouched nested loop") {
    withExtSession { sess =>
      val (pts, ivs) = fixtures(sess)
      val q = pts.join(ivs, col("t") >= col("s") && col("t") <= col("e"))
      val before = q.queryExecution.executedPlan.toString
      assert(before.contains("BroadcastNestedLoopJoin") ||
        before.contains("CartesianProduct"),
        s"fixture must start as a nested-loop plan:\n${before.take(500)}")
      sess.conf.set("spark.graft.rangeJoin.bucketWidth", "32")
      val after = pts.join(ivs, col("t") >= col("s") && col("t") <= col("e"))
        .queryExecution.executedPlan.toString
      assert(!after.contains("BroadcastNestedLoopJoin") &&
        !after.contains("CartesianProduct"),
        s"rule must remove the nested loop:\n${after.take(800)}")
      assert(after.contains("__rj_bucket"),
        "join must key on the generated bucket")
    }
  }

  test("strict bounds, reversed operand order, and an extra equi key " +
      "all rewrite and stay exact") {
    withExtSession { sess =>
      import sess.implicits._
      val pts = (0L until 200L).map(i => (i % 5, i, i * 3 % 97))
        .toDF("k", "pid", "t")
      val ivs = (0L until 40L).map(i => (i % 5, i, i * 2, i * 2 + 9))
        .toDF("k", "iid", "s", "e")
      // s < t AND e > t, written bounds-first, plus the k equi key
      val condNaive = pts("k") === ivs("k") &&
        ivs("s") < pts("t") && ivs("e") > pts("t")
      val naive = pts.join(ivs, condNaive)
        .select(pts("pid"), ivs("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      sess.conf.set("spark.graft.rangeJoin.bucketWidth", "8")
      val q2 = pts.join(ivs, condNaive).select(pts("pid"), ivs("iid"))
      val got = q2.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size)
      assert(got.toSet == naive)
      val plan = q2.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan.take(800))
    }
  }

  test("q228 runs the rule from the registry: extended session → no " +
      "nested loop in the plan, rows identical to hand-bucketed q198") {
    withExtSession { sess =>
      val dir = "/root/testdata/sf0.001"
      val viaRule = graft.queries.AnalyticsQueries.q228.fn(sess, dir)
      val plan = viaRule.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"q228 must plan through RangeJoinRewrite:\n${plan.take(800)}")
      assert(plan.contains("__rj_bucket"))
      val got = viaRule.collect().map(_.toSeq).toSeq
      val want = graft.queries.AnalyticsQueries.q198.fn(sess, dir)
        .collect().map(_.toSeq).toSeq
      assert(got == want, "rule-planned join must equal the " +
        "hand-bucketed RangeJoin operator row for row")
      assert(got.nonEmpty)
    }
  }

  test("guards: non-long range columns and non-inner joins are left alone") {
    withExtSession { sess =>
      import sess.implicits._
      sess.conf.set("spark.graft.rangeJoin.bucketWidth", "8")
      // double-typed range → no rewrite, still correct via nested loop
      val pts = Seq((1L, 5.0), (2L, 25.0)).toDF("pid", "t")
      val ivs = Seq((10L, 0.0, 10.0)).toDF("iid", "s", "e")
      val got = pts.join(ivs, col("t") >= col("s") && col("t") <= col("e"))
        .select("pid").collect().map(_.getLong(0)).toSeq
      assert(got == Seq(1L))
      // left outer join keeps its semantics (rule scope is Inner only)
      val lpts = Seq((1L, 5L), (2L, 500L)).toDF("pid", "t")
      val livs = Seq((10L, 0L, 10L)).toDF("iid", "s", "e")
      val outer = lpts.join(livs,
          col("t") >= col("s") && col("t") <= col("e"), "left")
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      assert(outer.toSet == Set((1L, 10L), (2L, -1L)))
    }
  }
}
