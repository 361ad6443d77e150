package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.operators.Health

/** Single-pass observe() health counters: metrics collected on the
  * SAME action as the plan agree exactly with a separate aggregation,
  * and survive into a write action (the production shape: counters on
  * the job that lands the data, not a second scan over it).
  */
class HealthSpec extends SparkSpec {

  test("observed counters equal a direct aggregation, from one pass") {
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
      .withColumn("maybe_null",
        when(col("doc_id") % 3 === 0, col("n_chars")))
    val obs = Observation("health")
    val observed = Health.withCounters(docs, obs, Seq("maybe_null", "text"))
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    val direct = docs.agg(
      count(lit(1)).as("rows"),
      sum(when(col("maybe_null").isNull, 1L).otherwise(0L)).as("nm"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("nt")).head()
    assert(m("rows") == direct.getLong(0))
    assert(m("null_maybe_null") == direct.getLong(1))
    assert(m("null_maybe_null").asInstanceOf[Long] > 0,
      "fixture must exercise the null branch")
    assert(m("null_text") == direct.getLong(2))
  }

  test("streaming: per-batch observed metrics ride each micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Option[Double])]
    // streaming observe: named metric map lands in every batch's
    // StreamingQueryProgress — monitoring rides the ingest job itself
    val observed = input.toDF().toDF("id", "v")
      .observe("health",
        count(lit(1)).as("rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("null_v"))
    val q = observed.writeStream.format("noop").start()
    input.addData((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
    q.processAllAvailable()
    input.addData((4L, None), (5L, None))
    q.processAllAvailable()
    val batches = q.recentProgress.toSeq
      .filter(_.observedMetrics.containsKey("health"))
      .map(_.observedMetrics.get("health"))
      .map(r => (r.getAs[Long]("rows"), r.getAs[Long]("null_v")))
    q.stop()
    assert(batches.contains((3L, 1L)), s"batch 1 metrics missing: $batches")
    assert(batches.contains((2L, 2L)), s"batch 2 metrics missing: $batches")
  }
}
