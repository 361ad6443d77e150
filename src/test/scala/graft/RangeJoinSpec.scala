package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bucketized range join: exact equivalence with the naive cross-join
  * + range predicate, duplicate-freedom by construction, edge-bucket
  * boundaries, and the plan contract (an equi-join on the bucket key,
  * never a cartesian/nested-loop over the full frames). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naivePoints(pts: Seq[(Long, String)],
      ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for ((p, pid) <- pts; (s, e, iid) <- ivs if p >= s && p <= e)
      yield (pid.toLong, iid)).map { case (a, b) => (a, b) }.toSet

  test("pointInInterval equals the naive range predicate across bucket " +
      "boundaries, exact endpoints, and zero-length intervals") {
    // deterministic pseudo-random layout straddling bucket width 10:
    // points on boundaries (0, 10, 20), intervals ending ON a boundary,
    // zero-length intervals, inverted (dropped) intervals
    val pts = (0L until 40L).map(i => (i * 7 % 50, s"p$i"))
    val ivs = Seq[(Long, Long, Long)](
      (0L, 10L, 100L),    // starts at bucket edge
      (10L, 10L, 101L),   // zero-length ON an edge
      (9L, 30L, 102L),    // spans 3 buckets
      (45L, 49L, 103L),   // inside one bucket
      (31L, 5L, 104L),    // inverted — must match nothing
      (49L, 60L, 105L))   // extends past the data
    val ptsDf = pts.map { case (t, id) => (id.drop(1).toLong, t) }
      .toDF("pid", "t")
    val ivsDf = ivs.map { case (s, e, id) => (id, s, e) }
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(ptsDf, "t", ivsDf, "s", "e", 10L)
      .select("pid", "iid").as[(Long, Long)].collect()
    val want = naivePoints(pts.map { case (t, id) =>
      (t, id.drop(1)) }, ivs.map { case (s, e, id) => (s, e, id) })
    // set equality AND no duplicates (exact-once without a distinct)
    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == want)
    // the inverted interval matched nothing
    assert(!got.exists(_._2 == 104L))
  }

  test("intervalOverlap equals the naive overlap predicate, exact-once") {
    val left = Seq((1L, 0L, 15L), (2L, 20L, 22L), (3L, 30L, 30L))
      .toDF("lid", "ls", "le")
    val right = Seq((10L, 14L, 21L), (11L, 22L, 29L), (12L, 30L, 35L),
      (13L, 16L, 19L)).toDF("rid", "rs", "re")
    val got = RangeJoin.intervalOverlap(left, "ls", "le",
        right, "rs", "re", 10L)
      .select("lid", "rid").as[(Long, Long)].collect()
    // naive: [a,b] ∩ [c,d] ≠ ∅ ⇔ a ≤ d ∧ c ≤ b
    val want = for {
      (l, ls, le) <- Seq((1L, 0L, 15L), (2L, 20L, 22L), (3L, 30L, 30L))
      (r, rs, re) <- Seq((10L, 14L, 21L), (11L, 22L, 29L), (12L, 30L, 35L),
        (13L, 16L, 19L))
      if ls <= re && rs <= le
    } yield (l, r)
    assert(got.length == got.toSet.size, "duplicate pairs emitted")
    assert(got.toSet == want.toSet)
  }

  test("plan contract: the join is an equi-join keyed by the bucket, " +
      "not a cartesian/nested-loop range scan") {
    val pts = (0L until 1000L).map(i => (i, i % 500)).toDF("pid", "t")
    val ivs = (0L until 200L).map(i => (i, i * 2, i * 2 + 30)).toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(pts, "t", ivs, "s", "e", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // broadcast hash join on the bucket key is fine (small side here);
    // what must NOT appear is a nested-loop join carrying the range
    // predicate itself
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(plan.contains("__rj_bucket"),
      "join must key on the quantized bucket")
  }
}
