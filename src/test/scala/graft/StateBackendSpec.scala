package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.SessionizeStream.Event

/** Production state-backend coverage: the same stateful streams the
  * suite verifies under the default HDFS-backed store also run —
  * with identical results — under the RocksDB state store provider
  * (the backend a 100 TB deployment actually uses: state lives
  * off-heap/on-disk per executor instead of in the JVM heap), and
  * the NATIVE dropDuplicatesWithinWatermark path matches batch
  * distinct (the second dedup path beside the custom-state
  * DedupStream, mirroring the native-session_window precedent). */
class StateBackendSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000L
  private val base = 1440L
  private def ev(u: Long, id: Long, minutes: Long) =
    Event(u, id, (base + minutes) * M, 0.0)

  test("windowed HLL aggregation under the RocksDB state store " +
      "equals the default-backend and batch results") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val windowed = input.toDF()
        .select(expr("timestamp_micros(ts_us)").as("ts"), col("user_id"))
        .withColumn("h", expr(
          "cast(conv(substring(md5(cast(user_id as string)), 1, 15), " +
            "16, 10) as bigint)"))
        .withWatermark("ts", "1 minute")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(org.apache.spark.sql.graftagg.HllAgg.graftHll(col("h"))
          .as("est"))
        .select(expr("unix_micros(window.start)").as("w_us"), col("est"))
      val q = windowed.writeStream.format("memory")
        .queryName("hll_rocksdb_test")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData((1L to 800L).map(u => ev(u, u, 0)): _*)
        q.processAllAvailable()
        input.addData((801L to 1600L).map(u => ev(u, 10000 + u, 10)): _*)
        q.processAllAvailable()
        input.addData(ev(9999, 99999, 10000))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("hll_rocksdb_test").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val batch = ((1L to 800L).map(u => ev(u, u, 0)) ++
        (801L to 1600L).map(u => ev(u, 10000 + u, 10))).toDS()
        .select(expr("timestamp_micros(ts_us)").as("ts"), col("user_id"))
        .withColumn("h", expr(
          "cast(conv(substring(md5(cast(user_id as string)), 1, 15), " +
            "16, 10) as bigint)"))
        .groupBy(window(col("ts"), "1 hour"))
        .agg(org.apache.spark.sql.graftagg.HllAgg.graftHll(col("h"))
          .as("est"))
        .select(expr("unix_micros(window.start)").as("w_us"), col("est"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(batch.nonEmpty)
      for ((w, est) <- batch)
        assert(got.get(w).contains(est),
          s"window $w rocksdb ${got.get(w)} vs batch $est")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("native dropDuplicatesWithinWatermark matches batch distinct " +
      "across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = input.toDF()
      .select(expr("timestamp_micros(ts_us)").as("ts"),
        col("event_id"), col("user_id"))
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory")
      .queryName("ddww_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // ids 1..5 in batch 1; batch 2 REPLAYS 3..5 (inside the
      // watermark window) and adds 6..8
      input.addData((1L to 5L).map(i => ev(i, i, i)): _*)
      q.processAllAvailable()
      input.addData(((3L to 8L).map(i => ev(100 + i, i, 10 + i))): _*)
      q.processAllAvailable()
      input.addData(ev(999, 999, 10000))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ddww_test").collect()
      .map(_.getAs[Long]("event_id")).toSet
    assert(got == ((1L to 8L).toSet + 999L),
      s"each id exactly once: $got")
    assert(spark.table("ddww_test").count() == 9L)
  }
}
