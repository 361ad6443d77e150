package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming keep-latest UPSERT sink — the online form of the q98 CDC
  * compaction: each micro-batch MERGEs into a keyed parquet table
  * (one row per key, highest version wins; in-version ties broken by
  * latest batch, the arrival-order rule), written as a NEW versioned
  * snapshot directory with the previous snapshot left intact until
  * the swap completes. This is the transaction-log pattern every
  * lakehouse table format uses, reduced to its engine core:
  *
  *  - foreachBatch is serial, so read-merge-write needs no lock;
  *  - a snapshot is immutable once written — the merge reads snapshot
  *    N and writes snapshot N+1, never appends in place, so a crash
  *    mid-batch leaves snapshot N valid (foreachBatch replays the
  *    batch, the at-least-once contract NearDupStream documents);
  *  - the merge itself is the one-exchange keep-latest window keyed
  *    by the upsert key — at table scale the snapshot would be
  *    bucketed by key (BucketingSpec) and even that exchange
  *    disappears.
  */
object UpsertSink {

  /** Drain `stream` (AvailableNow, one file per trigger when staged
    * that way) into a snapshot chain under `tableDir`; returns the
    * final snapshot as a DataFrame. Rows: (doc_id, version, text). */
  def drainUpsert(spark: SparkSession, stream: DataFrame,
      tableDir: String): DataFrame = {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_upsert_ckpt")
    val byKey = Window.partitionBy("doc_id")
      .orderBy(desc("version"), desc("batch_id"))
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val incoming = batch.withColumn("batch_id", lit(batchId))
        val prev = latestSnapshot(spark, tableDir)
        val merged = prev.map(_.unionByName(incoming)).getOrElse(incoming)
          .withColumn("rk", row_number().over(byKey))
          .where(col("rk") === 1)
          .drop("rk")
        merged.write.mode("overwrite")
          .parquet(s"$tableDir/snapshot_$batchId")
        ()
      }
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      StreamingResidue.release(ckpt)
    }
    latestSnapshot(spark, tableDir)
      .getOrElse(throw new IllegalStateException("no snapshot written"))
  }

  /** Highest-numbered snapshot directory, if any. */
  private def latestSnapshot(spark: SparkSession,
      tableDir: String): Option[DataFrame] = {
    val dir = new java.io.File(tableDir)
    val snaps = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("snapshot_"))
      .sortBy(f => f.getName.stripPrefix("snapshot_").toLong)
    snaps.lastOption.map(f => spark.read.parquet(f.getAbsolutePath))
  }
}
