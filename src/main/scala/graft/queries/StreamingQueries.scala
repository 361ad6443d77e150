package graft.queries

import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.streaming.StreamingOps

/** Streaming query inventory. Each runs a real Structured Streaming
  * query to completion (Trigger.AvailableNow) and returns the final
  * result table; the oracle is the equivalent batch SQL — streaming
  * and batch must agree exactly.
  */
object StreamingQueries {

  /** q40 — streaming hourly window aggregation == batch q14. */
  val q40 = QuerySpec("q40_stream_hourly",
    (s, dir) => StreamingOps.hourlyEventStats(s, dir)
      .orderBy("hour", "event_type"),
    Some("""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_value,
  CAST(round(sum(CAST(value AS DECIMAL(28,10))) / count(*), 6) AS DOUBLE) AS avg_value
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""))

  /** q45 — streaming exact dedup == batch keep-first. Two
    * deterministic micro-batches are staged from the documents table:
    * batch 1 is the keep-min-id pre-dedup of the corpus (so its
    * fingerprints are unique — within-batch winners never race, at
    * any SF), batch 2 re-sends every even-id keeper verbatim (a
    * cross-batch duplicate the STATE must drop) and every odd-id
    * keeper with a novel suffix token (a new fingerprint the state
    * must admit). `DedupStream.firstOccurrences` drains with
    * maxFilesPerTrigger=1, so batch 2's dups are decided purely by
    * the state store — the oracle is plain batch SQL over the same
    * construction. Event times sit 1 s past epoch (the epoch-0
    * initial-watermark collision) and far inside the horizon.
    */
  val q45 = QuerySpec("q45_stream_dedup",
    (s, dir) => {
      import java.nio.file.Files
      import org.apache.spark.sql.expressions.Window
      import graft.streaming.DedupStream
      val docsTable = graft.Tables(s, dir, "documents")
      // Batch-2 ids shift strictly past the corpus id space — a fixed
      // +1M shift collides with genuine doc_ids once the table's id
      // space exceeds 1M (e.g. ScaleGen copies start at 10M), and a
      // colliding (doc_id, fp) pair makes the ORDER BY doc_id row
      // order nondeterministic vs the oracle. One-scalar aggregate,
      // mirrored by the oracle's scalar subquery.
      val shift = docsTable.agg(max("doc_id")).head.getLong(0) + 1L
      val keepers = docsTable
        .withColumn("fp", graft.functions.Text.fingerprint(col("text")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("fp").orderBy("doc_id")))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("text"))
      val batch2 = keepers.select(
        (col("doc_id") + shift).as("doc_id"),
        when(col("doc_id") % 2 === 1, concat(col("text"), lit(" novelmark")))
          .otherwise(col("text")).as("text"))
      val inDir = Files.createTempDirectory("graft_q45_in")
      def stage(df: org.apache.spark.sql.DataFrame, idx: Int): Unit = {
        val part = df.select(col("doc_id"),
          (col("doc_id") + 1000000L).as("ts_us"), col("text"))
        val tmp = Files.createTempDirectory("graft_q45_stage")
        part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val f = scala.util.Using.resource(Files.list(tmp)) { st =>
          st.filter(_.toString.endsWith(".parquet")).findFirst().get()
        }
        val dest = inDir.resolve(f"part-$idx%04d.parquet")
        Files.move(f, dest)
        graft.streaming.StreamingResidue.deleteRecursively(tmp)
        // file order = micro-batch order (FileStreamSource sorts by
        // mod time): pin it explicitly
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(1000000000L + idx * 60000L))
      }
      stage(keepers, 0)
      stage(batch2, 1)
      import s.implicits._
      val docs = s.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[DedupStream.Doc]].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(inDir.toString).as[DedupStream.Doc]
      val admitted = graft.streaming.StreamingOps.drainToBatch(s,
        DedupStream.firstOccurrences(docs), "stream_dedup",
        outputMode = "append")
      graft.streaming.StreamingResidue.deleteRecursively(inDir)
      admitted.select(col("doc_id"), col("fp")).orderBy("doc_id")
    },
    Some("""
WITH k AS (
  SELECT doc_id, text, fp FROM (
    SELECT doc_id, text,
      md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      row_number() OVER (
        PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
        ORDER BY doc_id) AS rn
    FROM documents) WHERE rn = 1
)
SELECT doc_id, fp FROM k
UNION ALL
SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents) AS doc_id,
  md5(trim(regexp_replace(lower(text || ' novelmark'), '\s+', ' ', 'g'))) AS fp
FROM k WHERE doc_id % 2 = 1
ORDER BY doc_id
"""))

  val all: Seq[QuerySpec] = Seq(q40, q45)
}
