package graft.sources

import graft.SparkSpec

/** Scale-deployment contracts for the shard-stream ingest path:
  * driver Hadoop conf must survive the trip to executors (object-store
  * creds/endpoints set via `spark.hadoop.*`), and shard streams must
  * close on iterator exhaustion — not only at task end — so a task
  * flatMapping thousands of shards holds at most one fd at a time.
  */
class ShardConfSpec extends SparkSpec {

  test("SerializableHadoopConf round-trips spark.hadoop.* settings " +
      "through java serialization (the broadcast wire format)") {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("graft.test.marker", "v1")
    conf.set("fs.s3a.endpoint", "http://store.example:9000")
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bos)
    out.writeObject(new Sources.SerializableHadoopConf(conf)); out.close()
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val back = in.readObject().asInstanceOf[Sources.SerializableHadoopConf]
    assert(back.value.get("graft.test.marker") == "v1")
    assert(back.value.get("fs.s3a.endpoint") == "http://store.example:9000")
  }

  test("driver hadoopConfiguration markers are visible task-side via " +
      "the broadcast conf (not a fresh executor Configuration)") {
    val sc = spark.sparkContext
    sc.hadoopConfiguration.set("graft.test.taskside", "seen")
    try {
      val bconf = sc.broadcast(
        new Sources.SerializableHadoopConf(sc.hadoopConfiguration))
      val got = sc.parallelize(1 to 4, 4)
        .map(_ => Option(bconf.value.value.get("graft.test.taskside"))
          .getOrElse("MISSING"))
        .collect().toSeq
      assert(got == Seq.fill(4)("seen"))
      // a bare executor-side Configuration would NOT carry the marker —
      // this is exactly what the broadcast exists to prevent
      val bare = sc.parallelize(Seq(1), 1)
        .map(_ => Option(new org.apache.hadoop.conf.Configuration()
          .get("graft.test.taskside")).getOrElse("MISSING"))
        .collect().head
      assert(bare == "MISSING")
    } finally sc.hadoopConfiguration.unset("graft.test.taskside")
  }

  test("parseWarcStream closes its stream on iterator exhaustion, " +
      "before any task-completion fallback could run") {
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 3\r\n\r\nabc\r\n\r\n").getBytes("US-ASCII")
    var closed = 0
    val in = new java.io.ByteArrayInputStream(rec ++ rec ++ rec) {
      override def close(): Unit = { closed += 1; super.close() }
    }
    val it = Sources.parseWarcStream(in)
    assert(it.size == 3)          // drain
    assert(closed == 1, "stream must close exactly once, at exhaustion")
    assert(!it.hasNext)           // idempotent after finish
    assert(closed == 1)
  }

  test("truncated tail record also releases the stream at detection") {
    val good = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 3\r\n\r\nabc\r\n\r\n").getBytes("US-ASCII")
    val truncated = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 10\r\n\r\nab").getBytes("US-ASCII")
    var closed = 0
    val in = new java.io.ByteArrayInputStream(good ++ truncated) {
      override def close(): Unit = { closed += 1; super.close() }
    }
    val it = Sources.parseWarcStream(in)
    assert(it.size == 1)          // truncated record dropped
    assert(closed == 1)
  }
}
