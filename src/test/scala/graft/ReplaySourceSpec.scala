package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** [[graft.sources.ReplaySource]] (`graft-replay`, the custom DSv2
  * micro-batch streaming source): admission control splits the drain
  * into one batch per file; offsets persisted in the checkpoint make
  * a second drain RESUME (only new files read, state carried); a
  * malformed line fails naming the file. */
class ReplaySourceSpec extends SparkSpec {

  private def writeSeg(dir: Path, idx: Int, lines: Seq[String]): Unit =
    Files.writeString(dir.resolve(f"seg$idx%02d.csv"),
      lines.mkString("", "\n", "\n"))

  /** Drain the replay dir through a complete-mode per-type count+sum
    * into a memory sink; returns (result rows, per-batch input rows). */
  private def drain(dir: Path, ckpt: Path): (Seq[(String, Long, Long)], Seq[Long]) = {
    val agg = spark.readStream.format("graft-replay")
      .option("path", dir.toString).option("maxFilesPerBatch", 1).load()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
    val name = s"replay_spec_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination()
      val out = rows(spark.table(name).orderBy("event_type"))
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val batches = q.recentProgress.toSeq
        .map(_.numInputRows).filter(_ > 0)
      (out, batches)
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  test("admission control: one micro-batch per file, exact totals") {
    val dir = Files.createTempDirectory("graft_replay_spec")
    val ckpt = Files.createTempDirectory("graft_replay_ckpt")
    try {
      writeSeg(dir, 0, Seq("1000,1,view,10", "2000,2,view,20"))
      writeSeg(dir, 1, Seq("3000,1,buy,100"))
      writeSeg(dir, 2, Seq("4000,3,view,30", "5000,1,buy,200"))
      val (out, batches) = drain(dir, ckpt)
      assert(batches.size == 3, s"expected 3 fed batches, got $batches")
      assert(batches == Seq(2L, 1L, 2L))
      assert(out == Seq(("buy", 2L, 300L), ("view", 3L, 60L)))
    } finally {
      graft.streaming.StreamingResidue.deleteRecursively(dir)
      graft.streaming.StreamingResidue.deleteRecursively(ckpt)
    }
  }

  test("checkpointed offsets resume: a second drain reads ONLY new " +
      "files and carries the state forward") {
    val dir = Files.createTempDirectory("graft_replay_resume")
    val ckpt = Files.createTempDirectory("graft_replay_resume_ckpt")
    try {
      writeSeg(dir, 0, Seq("1000,1,view,10"))
      writeSeg(dir, 1, Seq("2000,2,view,20"))
      val (out1, batches1) = drain(dir, ckpt)
      assert(out1 == Seq(("view", 2L, 30L)))
      assert(batches1.sum == 2L)
      // two new segments land; SAME checkpoint → replay resumes at
      // offset 2, reads exactly the 3 new rows, state carries the
      // first drain's 2 rows through the checkpoint
      writeSeg(dir, 2, Seq("3000,1,buy,100", "4000,2,buy,200"))
      writeSeg(dir, 3, Seq("5000,3,view,40"))
      val (out2, batches2) = drain(dir, ckpt)
      assert(batches2.sum == 3L,
        s"resume re-read already-committed files: $batches2")
      assert(out2 == Seq(("buy", 2L, 300L), ("view", 3L, 70L)))
    } finally {
      graft.streaming.StreamingResidue.deleteRecursively(dir)
      graft.streaming.StreamingResidue.deleteRecursively(ckpt)
    }
  }

  test("malformed line fails naming the file") {
    val dir = Files.createTempDirectory("graft_replay_bad")
    val ckpt = Files.createTempDirectory("graft_replay_bad_ckpt")
    try {
      writeSeg(dir, 0, Seq("1000,1,view,10", "not-a-number,2,view,20"))
      val err = intercept[Exception] { drain(dir, ckpt) }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else String.valueOf(t.getMessage) +: messages(t.getCause)
      assert(messages(err).exists(m =>
        m.contains("seg00.csv") && m.contains("malformed")))
    } finally {
      graft.streaming.StreamingResidue.deleteRecursively(dir)
      graft.streaming.StreamingResidue.deleteRecursively(ckpt)
    }
  }
}
