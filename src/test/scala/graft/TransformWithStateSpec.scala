package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.GapStream
import graft.streaming.GapStream.Ev

/** The Spark 4.x `transformWithState` operator (StatefulProcessor +
  * typed state variables) — verified against an independent in-memory
  * brute force. Users deliberately STRADDLE micro-batches so that
  * batch-boundary gaps and cross-batch first-of-type decisions can
  * only come from the checkpointed ValueState / MapState.
  */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  /** Brute-force: global per-user sort, gaps vs any-type predecessor,
    * first-of-type by (user, type) first occurrence. */
  private def brute(evs: Seq[Ev]): Map[(Long, String), (Long, Long, Long, Long, Long)] = {
    val acc = scala.collection.mutable.Map
      .empty[(Long, String), (Long, Long, Long, Long, Long)]
    evs.groupBy(_.user_id).foreach { case (u, es) =>
      var last = Long.MinValue
      val seen = scala.collection.mutable.Set.empty[String]
      es.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        val k = (u, e.event_type)
        val (n, g, s, m, f) = acc.getOrElse(k, (0L, 0L, 0L, 0L, 0L))
        val (g2, s2, m2) =
          if (last == Long.MinValue) (g, s, m)
          else (g + 1, s + (e.ts_us - last), math.max(m, e.ts_us - last))
        val f2 = if (seen.add(e.event_type)) f + 1 else f
        acc.update(k, (n + 1, g2, s2, m2, f2))
        last = e.ts_us
      }
    }
    acc.toMap
  }

  test("transformWithState gap telemetry across batch boundaries " +
      "equals the batch brute force (RocksDB state store)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // user 1: events in batches 1,2,3 (gap frontier must persist);
      // user 2: type 'b' first seen in batch 1, re-sent in batch 3
      // (MapState must remember); user 3: single event (no gaps);
      // ties on ts_us within user 1 batch 2 (event_id order).
      val b1 = Seq(Ev(1, 10, "a", 1000L), Ev(2, 20, "b", 1500L),
        Ev(3, 30, "c", 9000L))
      val b2 = Seq(Ev(1, 11, "b", 2000L), Ev(1, 12, "a", 2000L),
        Ev(2, 21, "a", 2500L))
      val b3 = Seq(Ev(1, 13, "a", 7000L), Ev(2, 22, "b", 8000L))
      val input = MemoryStream[Ev]
      val q = GapStream.gapStats(input.toDS()).toDF()
        .writeStream.format("memory").queryName("tws_gap_test")
        .outputMode(OutputMode.Append()).start()
      try {
        Seq(b1, b2, b3).foreach { b =>
          input.addData(b: _*); q.processAllAvailable()
        }
      } finally q.stop()
      val got = spark.table("tws_gap_test")
        .groupBy("user_id", "event_type")
        .agg(org.apache.spark.sql.functions.sum("n_events").as("n"),
          org.apache.spark.sql.functions.sum("n_gaps").as("g"),
          org.apache.spark.sql.functions.sum("sum_gap_us").as("s"),
          org.apache.spark.sql.functions.max("max_gap_us").as("m"),
          org.apache.spark.sql.functions.sum("n_first").as("f"))
        .collect().map(r => ((r.getLong(0), r.getString(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6)))).toMap
      val want = brute(b1 ++ b2 ++ b3)
      assert(got.keySet == want.keySet)
      for ((k, v) <- want) assert(got(k) == v, s"key $k")
      // the state really decided: user 1's batch-3 event gap is
      // 7000-2000=5000 against a frontier only state carried
      assert(got((1L, "a"))._4 == 5000L)
      // user 2's batch-3 'b' is NOT first-of-type (batch-1 'b' in MapState)
      assert(got((2L, "b"))._5 == 1L)
    }
  }

  test("n_first sums to distinct (user, type) pairs") {
    val evs = (1L to 50L).map(i =>
      Ev(i % 7, i, if (i % 3 == 0) "x" else "y", 100L * i))
    val want = brute(evs)
    assert(want.values.map(_._5).sum == want.keySet.size)
  }
}
