package graft.sources

import org.apache.spark.sql.connector.write.streaming.StreamingWrite

/** Test seam (mirrors [[ShardStatsSourceTestHook]]): the replay write
  * classes are `private[sources]`, but [[graft.ReplayWriteSpec]]
  * drives the epoch-idempotence and abort contracts at the
  * [[StreamingWrite]] level directly — the end-to-end relay path is
  * exercised by q377. */
object ReplaySourceTestHook {
  def streamingWrite(dir: String): StreamingWrite =
    new ReplayStreamingWrite(dir)

  def listFiles(dir: String): Array[String] = ReplaySource.listFiles(dir)

  def offset(i: Int): org.apache.spark.sql.connector.read.streaming.Offset =
    ReplayOffset(i)

  def deserialize(json: String)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    ReplayOffset(json.trim.toInt)
}
