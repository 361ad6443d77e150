package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.SessionizeStream
import graft.streaming.SessionizeStream.{Event, Session}

/** Stateful streaming: flatMapGroupsWithState sessionization fed a
  * MemoryStream across multiple micro-batches must produce the same
  * sessions as the batch gap-based definition (q59 semantics).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000L // one minute in µs
  private val base = 1440L       // start a day past epoch 0: an event AT
                                 // the initial watermark (ts = 0) is
                                 // dropped as late by the stateful op
  private def ev(u: Long, id: Long, minutes: Long, v: Double) =
    Event(u, id, (base + minutes) * M, v)

  test("stateful sessionization across micro-batches matches batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = SessionizeStream.sessions(input.toDS())
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode(OutputMode.Append()).start()

    // batch 1: user 1 two events 10 min apart (one open session);
    //          user 2 one event
    input.addData(ev(1, 1, 0, 1.0), ev(1, 2, 10, 2.0), ev(2, 10, 5, 5.0))
    q.processAllAvailable()
    // batch 2: user 1 event 100 min later → closes session 1;
    //          user 2 event 10 min later → extends
    input.addData(ev(1, 3, 110, 3.0), ev(2, 11, 15, 7.0))
    q.processAllAvailable()
    // batch 3: far-future event advances the watermark past all gaps,
    // timing out and emitting every remaining open session
    input.addData(ev(3, 99, 10000, 0.0))
    q.processAllAvailable()
    input.addData(ev(3, 100, 20000, 0.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions_test").as[Session].collect()
      .map(s => (s.user_id, s.start_us / M - base, s.end_us / M - base,
        s.n_events, s.total_value))
      .toSet
    // user 1: [0,10] n=2 total=3.0 closed by the 110-min event; [110,110] timed out
    // user 2: [5,15] n=2 total=12.0 timed out
    assert(got.contains((1L, 0L, 10L, 2L, 3.0)))
    assert(got.contains((1L, 110L, 110L, 1L, 3.0)))
    assert(got.contains((2L, 5L, 15L, 2L, 12.0)))
  }

  test("NATIVE session_window under the streaming state store emits " +
      "the same sessions as the batch q241 semantics") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = input.toDS()
      .select(expr("timestamp_micros(ts_us)").as("ts"), col("user_id"))
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        expr("unix_micros(session_window.start)").as("start_us"),
        expr("unix_micros(session_window.end)").as("end_us"),
        col("n_events"))
    val q = sessions.writeStream.format("memory")
      .queryName("native_sessions_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // same shape as the custom-state test: two users, a session
      // split across micro-batches, then a far-future event whose
      // watermark closes everything still open
      input.addData(ev(1, 1, 0, 1.0), ev(1, 2, 10, 2.0), ev(2, 10, 5, 5.0))
      q.processAllAvailable()
      input.addData(ev(1, 3, 110, 3.0), ev(2, 11, 15, 7.0))
      q.processAllAvailable()
      input.addData(ev(3, 99, 10000, 0.0))
      q.processAllAvailable()
      input.addData(ev(3, 100, 20000, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("native_sessions_test").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("start_us") / M - base,
        r.getAs[Long]("n_events"))).toSet
    // session_window pads end = last + gap, so compare (user, start, n):
    // user 1 [0..10] n=2, then [110] n=1; user 2 [5..15] n=2
    assert(got.contains((1L, 0L, 2L)))
    assert(got.contains((1L, 110L, 1L)))
    assert(got.contains((2L, 5L, 2L)))
    // cross-check against the BATCH computation over the same events
    val batch = Seq(ev(1, 1, 0, 1.0), ev(1, 2, 10, 2.0),
        ev(2, 10, 5, 5.0), ev(1, 3, 110, 3.0), ev(2, 11, 15, 7.0),
        ev(3, 99, 10000, 0.0), ev(3, 100, 20000, 0.0)).toDS()
      .select(expr("timestamp_micros(ts_us)").as("ts"), col("user_id"))
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        expr("unix_micros(session_window.start)").as("start_us"),
        col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1) / M - base, r.getLong(2)))
      .toSet
    // the very last session (user 3 @ 20000) stays OPEN in streaming
    // by construction — no later event ever advances the watermark
    // past its end, so append mode cannot emit it; every closable
    // session must match the batch computation exactly
    val closable = batch.filterNot(_._2 == 20000L)
    assert(got == closable,
      s"streaming sessions $got must equal closable batch sessions $closable")
  }

  test("native HLL aggregate under the streaming state store: " +
      "windowed distinct estimates equal the batch computation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftagg.HllAgg
    implicit val sqlCtx = spark.sqlContext
    // the TypedImperativeAggregate's serialize/deserialize path is
    // exercised for real here: each micro-batch persists the 256-byte
    // register buffer into the state store and the next batch merges
    // into the DESERIALIZED buffer — a different code path than the
    // in-memory partial/final merge of a batch aggregate
    val input = MemoryStream[Event]
    def agg(ds: org.apache.spark.sql.DataFrame) = ds
      .select(expr("timestamp_micros(ts_us)").as("ts"), col("user_id"))
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(user_id as string)), 1, 15), " +
          "16, 10) as bigint)"))
    val windowed = agg(input.toDF())
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(HllAgg.graftHll(col("h")).as("est"))
      .select(expr("unix_micros(window.start)").as("w_us"), col("est"))
    val q = windowed.writeStream.format("memory")
      .queryName("hll_stream_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // window 1 (hour containing base): users 1-2000 split across
      // TWO micro-batches (forces a state-store round trip
      // mid-window); window 2: users 1500-4100 — both well above the
      // 2.5·m small-range threshold so the raw estimator is in its
      // accurate regime; a far-future event closes both
      input.addData((1L to 1000L).map(u => ev(u, u, 0, 0.0)): _*)
      q.processAllAvailable()
      input.addData((1001L to 2000L).map(u => ev(u, 10000 + u, 10, 0.0)): _*)
      q.processAllAvailable()
      input.addData((1500L to 4100L).map(u => ev(u, 20000 + u, 70, 0.0)): _*)
      q.processAllAvailable()
      input.addData(ev(99, 99999, 10000, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("hll_stream_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = agg(
      ((1L to 1000L).map(u => ev(u, u, 0, 0.0)) ++
        (1001L to 2000L).map(u => ev(u, 10000 + u, 10, 0.0)) ++
        (1500L to 4100L).map(u => ev(u, 20000 + u, 70, 0.0))).toDS().toDF())
      .groupBy(window(col("ts"), "1 hour"))
      .agg(HllAgg.graftHll(col("h")).as("est"))
      .select(expr("unix_micros(window.start)").as("w_us"), col("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(batch.size == 2)
    for ((w, est) <- batch)
      assert(got.get(w).contains(est),
        s"window $w: streaming ${got.get(w)} vs batch $est")
    // and the estimates land within a generous 3/√m envelope of the
    // exact counts (2000 and 2601 distinct users)
    val exact = Map(got.keys.min -> 2000.0, got.keys.max -> 2601.0)
    for ((w, e) <- batch)
      assert(math.abs(e - exact(w)) / exact(w) < 0.19,
        s"window $w estimate $e vs exact ${exact(w)}")
  }
}
