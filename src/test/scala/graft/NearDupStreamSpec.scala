package graft

import java.nio.file.Files
import graft.streaming.{DedupStream, NearDupStream}
import graft.streaming.DedupStream.Doc
import graft.operators.Dedup

/** Online approximate dedup: a doc that is merely SIMILAR (one token
  * appended — different fingerprint, so the exact layer would admit
  * it) to a doc admitted in an EARLIER micro-batch is dropped, via the
  * same MinHash band buckets the offline q31 pair finder uses.
  */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000L
  private val base =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey xray yankee zulu"
  private val nearDup = base + " omega" // one appended token
  private val distinctDoc =
    "entirely different content about weather patterns over the " +
      "southern ocean measured daily by autonomous buoy networks"

  test("fixture sanity: near-dup pair shares a band bucket, distinct doesn't") {
    val df = Seq((1L, base), (2L, nearDup), (3L, distinctDoc))
      .toDF("doc_id", "text")
    val buckets = Dedup.bandBuckets(df, "doc_id", "text").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("bucket")))
    def of(id: Long) = buckets.filter(_._1 == id).map(_._2).toSet
    assert(of(1).intersect(of(2)).nonEmpty,
      "near-dup pair must collide in at least one band")
    assert(of(1).intersect(of(3)).isEmpty && of(2).intersect(of(3)).isEmpty)
  }

  test("near-duplicate arriving in a later micro-batch is dropped") {
    val dir = Files.createTempDirectory("graft_neardup_in")
    val stateDir = Files.createTempDirectory("graft_neardup_state")
    val outDir = Files.createTempDirectory("graft_neardup_out")
    // batch 1: base doc + a distinct doc + an in-batch near-dup pair
    // member (id 5 < 9 → 5 is the deterministic representative)
    writeChunk(Seq(
      Doc(5, 1000 * M, base),
      Doc(9, 1001 * M, base + " extra"),
      Doc(6, 1002 * M, distinctDoc)).toDS().toDF(), dir, 0)
    // batch 2: near-dup of the admitted base doc (NOT byte-identical:
    // exact fingerprints differ) + a short un-shingleable doc + fresh
    writeChunk(Seq(
      Doc(7, 1010 * M, nearDup),
      Doc(8, 1011 * M, "hi"),
      Doc(10, 1012 * M, "fresh report on volcanic seismic activity " +
        "compiled weekly from island observatory stations")).toDS().toDF(), dir, 1)

    val docs = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString).as[Doc]
    NearDupStream.drain(spark, docs, stateDir, outDir)

    val kept = spark.read.parquet(outDir.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 5 admitted (min id of the in-batch pair {5, 9}); 9 dropped;
    // 7 dropped across batches though not byte-identical; 8 passes
    // through (no LSH identity); 6 and 10 are genuinely new
    assert(kept == Set(5L, 6L, 8L, 10L), s"got $kept")

    // exact-dedup layer would NOT have caught the near-dup: different
    // normalized fingerprints
    val fps = Seq((1L, base), (2L, nearDup)).toDF("doc_id", "text")
    assert(Dedup.exact(fps, "doc_id", "text").count() == 2)
  }

  test("persistent checkpoint: re-drain processes only new files") {
    val M = 60L * 1000000L
    val dir = Files.createTempDirectory("graft_neardup_inc")
    val stateDir = Files.createTempDirectory("graft_neardup_inc_state")
    val outDir = Files.createTempDirectory("graft_neardup_inc_out")
    val ckpt = Files.createTempDirectory("graft_neardup_inc_ckpt")
    def docs = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString).as[Doc]
    def out() = spark.read.parquet(outDir.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted

    writeChunk(Seq(Doc(1, 1000 * M, base),
      Doc(2, 1001 * M, distinctDoc)).toDS().toDF(), dir, 0)
    NearDupStream.drain(spark, docs, stateDir, outDir,
      checkpoint = Some(ckpt))
    assert(out() == Seq(1L, 2L))

    // cron'd catch-up over the same directory with ONE new file: the
    // committed file is skipped (offset log), so the output gains only
    // the genuinely new admissions — zero duplicate rows
    writeChunk(Seq(Doc(3, 1010 * M, nearDup), // near-dup of 1 → dropped
      Doc(4, 1011 * M, "completely new words about tidal energy " +
        "converters moored beyond the continental shelf break"))
      .toDS().toDF(), dir, 1)
    NearDupStream.drain(spark, docs, stateDir, outDir,
      checkpoint = Some(ckpt))
    assert(out() == Seq(1L, 2L, 4L), s"got ${out()}")
  }
}
