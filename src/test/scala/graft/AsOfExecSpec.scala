package graft

import org.apache.spark.sql.functions._

/** The custom AS-OF JOIN physical operator
  * ([[org.apache.spark.sql.graftexec.AsOfJoinExec]]): correctness
  * against brute force and against the union+window composition
  * (graft.operators.AsOf), the planned shape (exec present, exchanges
  * and sorts supplied by EnsureRequirements), tie semantics (right
  * row AT the left timestamp matches), null-fill for unmatched rows,
  * and self-join safety (both sides from one scan). */
class AsOfExecSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.graftexec.AsOfJoinPhysical

  test("merge matches brute force on adversarial keys/ties/gaps") {
    val rnd = new scala.util.Random(42)
    val left = (1 to 400).map { i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, i.toLong)
    }.toDF("k", "t", "lid")
    val right = (1 to 200).map { i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, i.toLong * 10)
    }.toDF("rk", "rt", "pay")
      // collapse duplicate (rk, rt) to one payload: with duplicates the
      // "latest ≤ t" row is order-ambiguous in ANY as-of engine
      .groupBy("rk", "rt").agg(max("pay").as("pay"))
    val got = AsOfJoinPhysical
      .joinBackward(left, right, "k", "rk", "t", "rt")
      .select("lid", "pay").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val rights = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = left.collect().map { r =>
      val (k, t, lid) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cands = rights.filter(x => x._1 == k && x._2 <= t)
      lid -> (if (cands.isEmpty) -1L else cands.maxBy(_._2)._3)
    }.toMap
    assert(got == want)
    assert(got.values.exists(_ == -1L), "fixture must exercise null fill")
    assert(got.values.exists(_ != -1L))
  }

  test("physical plan carries AsOfJoinExec with exchanges+sorts " +
      "supplied by EnsureRequirements") {
    val left = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val right = Seq((1L, 5L, 7L)).toDF("rk", "rt", "pay")
    val df = AsOfJoinPhysical.joinBackward(left, right, "k", "rk", "t", "rt")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(600))
    assert(plan.contains("Sort"), "children must be sorted by (key, ts)")
    assert(df.collect().map(_.toSeq).toSet ==
      Set(Seq(1L, 10L, 1L, 5L, 7L), Seq(2L, 20L, null, null, null)))
  }

  test("tie at equal timestamps matches (DuckDB ASOF r.ts <= l.ts)") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 99L)).toDF("rk", "rt", "pay")
    val r = AsOfJoinPhysical.joinBackward(left, right, "k", "rk", "t", "rt")
      .select("pay").head()
    assert(!r.isNullAt(0) && r.getLong(0) == 99L)
  }

  test("forward direction matches brute force (earliest right with " +
      "rt >= lt; ties match; null fill beyond the last right row)") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map { i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, i.toLong)
    }.toDF("k", "t", "lid")
    val right = (1 to 150).map { i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, i.toLong * 10)
    }.toDF("rk", "rt", "pay")
      .groupBy("rk", "rt").agg(max("pay").as("pay"))
    val got = AsOfJoinPhysical
      .joinForward(left, right, "k", "rk", "t", "rt")
      .select("lid", "pay").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val rights = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = left.collect().map { r =>
      val (k, t, lid) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cands = rights.filter(x => x._1 == k && x._2 >= t)
      lid -> (if (cands.isEmpty) -1L else cands.minBy(_._2)._3)
    }.toMap
    assert(got == want)
    assert(got.values.exists(_ == -1L) && got.values.exists(_ != -1L))
  }

  test("agrees with the union+window composition on the events fixture " +
      "and survives a self-join (both sides one scan)") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("t"), col("event_id"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("t"), col("event_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("t").as("p_t"))
    val viaExec = AsOfJoinPhysical
      .joinBackward(clicks, purchases, "user_id", "p_user", "t", "p_t")
      .select(col("event_id"), col("p_t")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    val viaWindow = graft.operators.AsOf.joinBackward(
        clicks, purchases.withColumnRenamed("p_user", "user_id"),
        "user_id", "t", "p_t", Nil)
      .select(col("event_id"), col("__match.p_t").as("p_t")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(viaExec == viaWindow)
    assert(viaExec.nonEmpty)
  }
}
