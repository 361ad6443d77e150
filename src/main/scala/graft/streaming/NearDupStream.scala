package graft.streaming

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.Dedup

/** Online NEAR-duplicate dedup — the approximate sibling of
  * [[DedupStream]]: a document arriving in a later micro-batch that is
  * merely SIMILAR to one already admitted (not byte-identical) is
  * dropped. Uses the exact same MinHash band-bucket key space as the
  * offline pair finder (`Dedup.bandBuckets` — same hash family, same
  * banding), so online and offline decisions agree.
  *
  * Shape: `foreachBatch` + a persistent seen-bucket table, not a
  * stateful operator. `dropDuplicatesWithinWatermark` can't express
  * this — a doc owns SEVERAL band keys and the doc-level verdict
  * ("any band seen before") needs a per-doc aggregate over per-band
  * state, and in-batch ties between bands must resolve to ONE
  * representative deterministically (engine-defined per-key winners
  * can disagree across a doc's bands, dropping every copy). Per
  * micro-batch:
  *
  *  1. band buckets of the batch's docs (narrow projection + one
  *     shuffle keyed by doc id, same as offline);
  *  2. drop docs sharing ANY bucket with the seen-bucket table
  *     (equi-join on the bucket hash — broadcastable while the state
  *     is small, shuffle-join at scale; never touches raw text);
  *  3. in-batch resolution among survivors: connected components over
  *     the batch's bucket-co-membership graph (the same transitive
  *     clustering the offline pair graph yields), keeping the MIN doc
  *     id of each component — so chain-shaped in-batch clusters
  *     (A~B~C with A≁C) resolve to ONE representative, identical to
  *     `Dedup.connectedComponents` offline;
  *  4. ALL batch buckets (kept and dropped docs') are appended to the
  *     state so future arrivals chain through intermediates — the
  *     same transitive clustering the offline pair graph yields;
  *  5. kept docs are appended to the output table.
  *
  * Docs too short to shingle have no LSH identity and pass through
  * unconditionally (the exact [[DedupStream]] layer catches their
  * literal copies).
  *
  * State growth: the bucket table grows with ADMITTED content (plus
  * novel buckets of dropped docs), i.e. with unique data, not with
  * ingest volume. Production retention = date-partition the state dir
  * and drop partitions beyond the dedup horizon; the offline q31 pass
  * over accumulated output remains the global backstop, exactly like
  * the exact-dedup layering.
  *
  * Delivery contract: `foreachBatch` is AT-LEAST-ONCE — a crash
  * between the appends and the checkpoint commit replays the batch.
  * Replay is CONSERVATIVE here, never lossy: the output append runs
  * BEFORE the state append (order matters — see processBatch), so a
  * replay can only duplicate output rows, exactly what the offline
  * exact-dedup backstop removes; re-appended buckets are harmless
  * (the state join is a semi-join). Exactly-once output requires an
  * idempotent sink keyed by (batch id, doc id), the standard
  * foreachBatch discipline.
  */
object NearDupStream {

  /** Drain `docs` (streaming frame of [[DedupStream.Doc]] rows) with
    * AvailableNow, writing admitted docs to `outDir` and bucket state
    * to `stateDir`. Returns after the backlog is fully processed.
    *
    * Pass a persistent `checkpoint` to make repeated drains
    * INCREMENTAL: the offset log skips committed files, so a cron'd
    * re-run processes only new arrivals (without it, each drain
    * re-reads everything — correct but wasteful: replayed docs just
    * match their own buckets in state and drop). */
  def drain(spark: SparkSession, docs: Dataset[DedupStream.Doc],
      stateDir: Path, outDir: Path,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      checkpoint: Option[Path] = None): Unit = {
    val ckpt = checkpoint.getOrElse(
      Files.createTempDirectory("graft_ckpt_neardup"))
    val q = docs.writeStream
      .foreachBatch { (batch: Dataset[DedupStream.Doc], _: Long) =>
        processBatch(batch.toDF(), stateDir, outDir, k, bands, shingleN)
      }
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally {
      q.stop()
      if (checkpoint.isEmpty) StreamingResidue.release(ckpt)
      else org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    }
  }

  private def processBatch(batch: DataFrame, stateDir: Path, outDir: Path,
      k: Int, bands: Int, shingleN: Int): Unit = {
    val spark = batch.sparkSession
    val b = batch.persist()
    try {
      val buckets = Dedup.bandBuckets(b, "doc_id", "text", k, bands, shingleN)
        .persist()
      val seen =
        if (Files.exists(stateDir) && hasParquet(stateDir))
          spark.read.parquet(stateDir.toString)
        else spark.emptyDataFrame.select(lit("").as("bucket")).limit(0)
      // 2. cross-batch: any bucket already seen → drop
      val hits = buckets.join(seen, Seq("bucket"), "left_semi")
        .select("id").distinct()
      // 3. in-batch: transitive resolution. Star edges (member, bucket
      //    min) connect every bucket's members; chains that share docs
      //    connect across buckets; connected components then labels
      //    each doc with its component's min id — the same transitive
      //    clustering as the offline pair graph (one-hop min alone
      //    keeps two docs from a chain A~B~C where offline keeps one).
      val bucketMin = buckets.groupBy("bucket").agg(min("id").as("bmin"))
      val pairs = buckets.join(bucketMin, "bucket")
        .where(col("id") =!= col("bmin"))
        .select(col("id").as("a"), col("bmin").as("b")).distinct()
      val inBatchDrop = Dedup.connectedComponents(pairs)
        .where(col("cluster") < col("id")).select("id")
      val dropped = hits.union(inBatchDrop).distinct()
        .withColumnRenamed("id", "doc_id")
      // 4. emit survivors (short un-shingleable docs pass through).
      //    Output BEFORE state, deliberately: a crash between the two
      //    appends then replays to a duplicate output (at-least-once,
      //    offline backstop removes it). The reverse order is LOSSY —
      //    the replayed batch would see its own buckets in state and
      //    drop every doc with no admitted copy anywhere.
      b.join(dropped, Seq("doc_id"), "left_anti")
        .write.mode("append").parquet(outDir.toString)
      // 5. register every batch bucket (transitive chaining)
      buckets.select("bucket").distinct()
        .write.mode("append").parquet(stateDir.toString)
      buckets.unpersist(blocking = false)
    } finally {
      b.unpersist(blocking = false)
      // a micro-batch is one unit of work: free the checkpoint blocks
      // connectedComponents registered for this batch's in-batch CC
      // (nothing else calls releaseAll on the streaming path, and a
      // long-lived stream would otherwise accumulate one block-set +
      // one registry thunk per batch)
      graft.CacheRegistry.releaseAll()
    }
  }

  private def hasParquet(dir: Path): Boolean =
    scala.util.Using.resource(Files.list(dir)) { s =>
      s.iterator().asScala.exists(_.toString.endsWith(".parquet"))
    }
}
