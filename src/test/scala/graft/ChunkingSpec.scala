package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunking

/** Document chunking: window arithmetic pinned by hand, the
  * contained-trailing-window rule, degenerate inputs, and provenance
  * stability (a doc's chunks don't depend on the rest of the corpus).
  */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("windows, overlap, and the contained-trailing-window rule") {
    // 11 tokens, chunk 4, overlap 2 → starts 0,2,4,6,8,10; start 8
    // ends at 11 > prev end 10 → kept (3 tokens); start 10 ends at 11
    // ≤ its prev end 12 → contained → dropped
    val d = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text")
    val got = Chunking.chunk(d, "doc_id", "text", chunkTokens = 4, overlap = 2)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("start"),
        r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk_text")))
    assert(got.toSeq == Seq(
      (0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 2L, 4L, "t2 t3 t4 t5"),
      (2L, 4L, 4L, "t4 t5 t6 t7"),
      (3L, 6L, 4L, "t6 t7 t8 t9"),
      (4L, 8L, 3L, "t8 t9 t10")))
    // 10 tokens: start 8 ends at 10 = prev window's end → the whole
    // trailing window is inside [6,10) → dropped, no verbatim dup
    val d10 = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val starts = Chunking.chunk(d10, "doc_id", "text", 4, 2)
      .select("start").collect().map(_.getLong(0)).toSeq.sorted
    assert(starts == Seq(0L, 2L, 4L, 6L))
  }

  test("degenerate inputs: empty text no chunks, short doc one chunk") {
    val d = Seq((1L, ""), (2L, "   "), (3L, "only three tokens"))
      .toDF("doc_id", "text")
    val got = Chunking.chunk(d, "doc_id", "text", 32, 8).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("doc_id") == 3L &&
      got(0).getAs[Long]("n_chunk_tokens") == 3L &&
      got(0).getAs[String]("chunk_text") == "only three tokens")
  }

  test("coverage property: every token of every doc appears in ≥1 kept chunk") {
    // the guarantee chunking exists to provide — no span lost at a
    // window boundary, even with the contained-trailing-window drop.
    // Checked over the real corpus for several (chunk, overlap) pairs.
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
      .limit(200)
    for ((c, o) <- Seq((32, 8), (16, 4), (8, 7), (5, 0))) {
      val uncovered = Chunking.chunk(docs, "doc_id", "text", c, o)
        .groupBy("doc_id")
        .agg(max(col("start") + col("n_chunk_tokens")).as("covered_to"),
          min("start").as("first_start"))
        .join(docs.select(col("doc_id"),
          graft.functions.Text.tokenCount(
            graft.functions.Text.normalizeText(col("text"))).cast("long").as("n")),
          "doc_id")
        .where(col("first_start") =!= 0 || col("covered_to") < col("n"))
        .count()
      // consecutive kept windows overlap by construction (step ≤ chunk),
      // so first_start=0 + covered_to=n ⇒ full coverage
      assert(uncovered == 0, s"chunk=$c overlap=$o left gaps")
    }
  }

  test("plan is narrow: chunking adds NO exchange over the scan") {
    // the 100 TB claim: chunking pipelines into the surrounding scan/
    // write with zero shuffles — assert no ShuffleExchange in the plan
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
    val plan = Chunking.chunk(docs, "doc_id", "text", 32, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange in:\n$plan")
  }

  test("provenance is per-document: corpus growth never changes a doc's chunks") {
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
    val one = Chunking.chunk(docs.where(col("doc_id") === 7), "doc_id", "text", 32, 8)
      .collect().map(_.toString).sorted
    val all = Chunking.chunk(docs, "doc_id", "text", 32, 8)
      .where(col("doc_id") === 7).collect().map(_.toString).sorted
    assert(one.sameElements(all))
  }
}
