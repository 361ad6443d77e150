package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamJoin

/** Stream-stream interval join: cross-micro-batch matching, the
  * window bound, and state EVICTION past the watermark (a right event
  * matching an already-evicted left row yields nothing — the bounded-
  * state contract that lets the join run forever).
  */
case class Ev(user_id: Long, ts_us: Long, event_id: Long)

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000L

  test("interval join across batches; watermark evicts old state") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    def frame(s: MemoryStream[Ev]) =
      s.toDS().toDF().withColumn("ts", timestamp_micros(col("ts_us")))
    val joined = StreamJoin.within(frame(views), frame(buys),
      "user_id", "30 minutes", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("sj_test")
      .outputMode(OutputMode.Append()).start()

    // batch 1: a view; batch 2: purchases in/out of its 30-min window
    views.addData(Ev(1, 1000 * M, 100), Ev(2, 1000 * M, 101))
    q.processAllAvailable()
    buys.addData(Ev(1, 1020 * M, 200), // inside window → match
      Ev(1, 1040 * M, 201),            // outside 30 min → no match
      Ev(3, 1020 * M, 202))            // no such viewer → no match
    q.processAllAvailable()

    // push both watermarks far ahead: user 2's view (ts=1000min) is
    // evicted once wm > 1000+30+10
    views.addData(Ev(9, 3000 * M, 900))
    buys.addData(Ev(9, 5000 * M, 901)) // also outside 9's window
    q.processAllAvailable()
    // a purchase that WOULD match user 2's view arrives after
    // eviction → dropped (bounded state, not wrong results: its event
    // time is behind the watermark, i.e. late data by contract)
    buys.addData(Ev(2, 1010 * M, 203))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sj_test")
      .select("left_id", "right_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 200L)), s"got $got")
    spark.catalog.dropTempView("sj_test")
  }

  test("drained stream join == batch join on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val l = MemoryStream[Ev]
    val r = MemoryStream[Ev]
    def frame(s: MemoryStream[Ev]) =
      s.toDS().toDF().withColumn("ts", timestamp_micros(col("ts_us")))
    val evsL = (0 until 40).map(i => Ev(i % 5, (1000 + i) * M, i))
    val evsR = (0 until 40).map(i => Ev(i % 5, (1005 + i * 2) * M, 1000 + i))
    val q = StreamJoin.within(frame(l), frame(r),
        "user_id", "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sj_parity")
      .outputMode(OutputMode.Append()).start()
    l.addData(evsL.take(20)); r.addData(evsR.take(20))
    q.processAllAvailable()
    l.addData(evsL.drop(20)); r.addData(evsR.drop(20))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sj_parity")
      .select("left_id", "right_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val bl = evsL.toDF().withColumn("ts", timestamp_micros(col("ts_us")))
    val br = evsR.toDF().withColumn("ts", timestamp_micros(col("ts_us")))
    val batch = StreamJoin.within(bl, br, "user_id", "30 minutes", "10 minutes")
      .select("left_id", "right_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(streamed == batch, "streamed join must equal the batch join")
    assert(streamed.nonEmpty)
    spark.catalog.dropTempView("sj_parity")
  }
}
