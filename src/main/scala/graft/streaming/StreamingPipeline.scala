package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The reference's whole daily pipeline as an incremental job: a file
  * source streams fundamentals snapshots; each micro-batch runs the
  * full batch valuation (cleanse → medians → ladders → ordered output)
  * inside foreachBatch and lands a single ordered CSV per batch.
  *
  * Why foreachBatch: sector medians need full-snapshot aggregation +
  * joins that the incremental streaming engine cannot express — but
  * each arriving snapshot IS a complete batch, so running the batch
  * plan per micro-batch is exactly the reference's cron semantics
  * with the stream engine handling discovery/ordering/exactly-once
  * bookkeeping (`/root/reference/README.md:236-241` — "streaming" is
  * a daily re-run; this is its Spark-native form).
  */
object StreamingPipeline {

  /** Stream snapshot parquet files from `srcGlob`, run the valuation
    * pipeline per batch, write `outDir/valuations_batch<N>.csv`.
    * Returns after draining (AvailableNow).
    */
  def run(spark: SparkSession, srcGlob: String,
      schema: org.apache.spark.sql.types.StructType,
      outDir: String, asOfDate: String, runTsUtc: String): Unit = {
    val stream = spark.readStream.schema(schema).parquet(srcGlob)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val out = graft.Pipeline.run(batch,
            monotonically_increasing_id(),
            asOfDate = asOfDate, runTsUtc = runTsUtc)
          graft.sources.Sources.writeSingleCsv(
            out.orderBy("ticker"), s"$outDir/valuations_batch$batchId.csv")
        }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .start()
    q.awaitTermination()
  }
}
