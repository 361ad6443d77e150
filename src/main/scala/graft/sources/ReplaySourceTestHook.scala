package graft.sources

import org.apache.spark.sql.connector.write.streaming.StreamingWrite

/** Test seam (mirrors [[ShardStatsSourceTestHook]]): the replay write
  * classes are `private[sources]`, but [[graft.ReplayWriteSpec]]
  * drives the epoch-idempotence and abort contracts at the
  * [[StreamingWrite]] level directly — the end-to-end relay path is
  * exercised by q377. */
object ReplaySourceTestHook {
  def streamingWrite(dir: String): StreamingWrite =
    new ReplayStreamingWrite(dir, ReplaySource.rowSchema)

  def streamingWrite(dir: String,
      schema: org.apache.spark.sql.types.StructType): StreamingWrite =
    new ReplayStreamingWrite(dir, schema)

  def listFiles(dir: String): Array[String] = ReplaySource.listFiles(dir)

  def offset(i: Int): org.apache.spark.sql.connector.read.streaming.Offset =
    ReplayOffset(i)

  def offsetPinned(i: Int, last: String)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    ReplayOffset(i, Some(last))

  def deserialize(json: String)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    ReplayOffset.parse(json)
}
