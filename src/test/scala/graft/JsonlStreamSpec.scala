package graft

import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.sources.Sources
import graft.streaming.{DedupStream, StreamingOps}

/** Streaming JSONL ingestion: the landing-directory tail — gzip'd
  * shards arrive as micro-batches, the coercing-schema + corrupt-row
  * contract holds per batch, and the parsed stream feeds the
  * state-store dedup exactly like a parquet stream. */
class JsonlStreamSpec extends SparkSpec {

  private def writeJsonlChunk(lines: Seq[String], dir: Path, idx: Int): Unit = {
    val dest = dir.resolve(f"part-$idx%04d.jsonl.gz")
    val out = new GZIPOutputStream(Files.newOutputStream(dest))
    out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
    out.close()
    Files.setLastModifiedTime(dest,
      java.nio.file.attribute.FileTime.fromMillis(1000000000L + idx * 60000L))
  }

  test("jsonl stream: per-batch coercion + corrupt quarantine + dedup state") {
    import spark.implicits._
    val target = StructType(Seq(StructField("doc_id", LongType),
      StructField("ts_us", LongType), StructField("text", StringType)))
    val base = 1000L * 60L * 1000000L
    val dir = Files.createTempDirectory("graft_jsonl_stream")
    writeJsonlChunk(Seq(
      s"""{"doc_id": 1, "ts_us": ${base + 1}, "text": "hello world"}""",
      s"""{"doc_id": 2, "ts_us": "${base + 2}", "text": "fresh text"}""", // quoted ts
      """{not json at all"""), dir, 0)
    writeJsonlChunk(Seq(
      s"""{"doc_id": 3, "ts_us": ${base + 3}, "text": "  Hello   WORLD "}""", // dup of 1
      s"""{"doc_id": 4, "ts_us": ${base + 4}, "text": "another doc"}""",
      """{"doc_id": broken"""), dir, 1)
    val parsed = Sources.streamJsonl(spark, dir.toString, target)
    val docs = parsed.where(!col("is_corrupt"))
      .select(col("doc_id"), col("ts_us"), col("text"))
      .as[DedupStream.Doc]
    val admitted = StreamingOps.drainToBatch(spark,
      DedupStream.firstOccurrences(docs), "jsonl_stream_dedup",
      outputMode = "append")
    val ids = admitted.select("doc_id").collect().map(_.getLong(0)).toSet
    // 3 is a cross-batch normalized dup of 1 (state-store drop);
    // the two corrupt lines are quarantined, never failures
    assert(ids == Set(1L, 2L, 4L))
    graft.streaming.StreamingResidue.deleteRecursively(dir)
    CacheRegistry.releaseAll()
  }
}
