package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.readStream.format("graft-replay")` — a custom DataSourceV2
  * MICRO-BATCH STREAMING source (the Kafka-shaped read surface: the
  * one streaming capability the engine's connector matrix still
  * lacked; every other stream in the registry rides Spark's built-in
  * file source). It replays a staged directory of numbered CSV event
  * files as a deterministic stream:
  *
  *  - OFFSETS are file indexes into the lexicographically-sorted file
  *    list — `ReplayOffset(i)` means "the first i files are consumed".
  *    Offsets serialize to JSON in the checkpoint like any production
  *    source's, so a restarted query resumes mid-replay.
  *  - ADMISSION CONTROL (`SupportsAdmissionControl.latestOffset(start,
  *    limit)`): at most `maxFilesPerBatch` files (default 1, or the
  *    planner's `ReadMaxFiles` if smaller) are admitted per
  *    micro-batch — the rate-limit contract that keeps a 100 TB
  *    backlog drain in bounded-memory batches with a checkpoint
  *    between each, instead of one giant catch-up batch.
  *  - `SupportsTriggerAvailableNow`: `prepareForTriggerAvailableNow`
  *    PINS the replay end at the trigger moment, so an AvailableNow
  *    drain processes exactly the files present at start — in bounded
  *    batches — and terminates even if files keep landing.
  *
  * The row schema is fixed (`ts_us` long micros, `user_id` long,
  * `event_type` string, `cents` long); malformed lines name the file,
  * same strictness as [[KeyedShardSource]]. Files are read whole —
  * one input partition per file per batch — so batch boundaries are
  * exactly file boundaries and every drain of the same directory
  * yields the same batch sequence (what makes the stream ≡ batch
  * oracle comparison in q376 exact rather than probabilistic).
  */
class ReplaySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-replay"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplaySource.rowSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ReplayTable(new CaseInsensitiveStringMap(properties))
}

object ReplaySource {
  val rowSchema: StructType = StructType(Seq(
    StructField("ts_us", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("cents", LongType, nullable = false)))

  private[sources] def listFiles(dir: String): Array[String] = {
    val fs = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".csv") &&
        !f.getName.startsWith("."))
      .map(_.getAbsolutePath).sorted
    require(fs.nonEmpty, s"graft-replay: no .csv files under $dir")
    fs
  }
}

private[sources] class ReplayTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "graft-replay"
  override def schema(): StructType = ReplaySource.rowSchema
  override def capabilities(): util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(
      caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](
      options.asCaseSensitiveMap())
    merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
    new ReplayScan(new CaseInsensitiveStringMap(merged))
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val dir = Option(options.get("path"))
      .orElse(Option(info.options().get("path")))
      .getOrElse(throw new IllegalArgumentException(
        "graft-replay: 'path' is required for writes"))
    // strict schema gate: a replay segment that doesn't round-trip
    // through the read schema would corrupt every downstream drain
    val got = info.schema()
    require(got.fields.map(f => (f.name, f.dataType)).toSeq ==
      ReplaySource.rowSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"graft-replay: write schema ${got.simpleString} must match " +
        s"${ReplaySource.rowSchema.simpleString}")
    new ReplayWriteBuilder(dir)
  }
}

private[sources] class ReplayWriteBuilder(dir: String) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toStreaming: StreamingWrite = new ReplayStreamingWrite(dir)
  }
}

/** The WRITE half of the replay surface — a custom
  * [[StreamingWrite]] with per-epoch EXACTLY-ONCE publication, the
  * Kafka-producer-shaped counterpart of [[ReplayMicroBatchStream]]:
  *
  *  - each task writes its rows to a dot-prefixed STAGED file
  *    (`.stage-<epoch>-p<partition>-<uuid>`) the read side never
  *    lists, and ships only the PATH in its commit message — no data
  *    bytes ride through the driver;
  *  - `commit(epochId, msgs)` publishes by pure ATOMIC RENAME to the
  *    deterministic name `epoch<E>-p<P>.csv` (REPLACE_EXISTING):
  *    re-running a crashed epoch re-stages and re-publishes the SAME
  *    names, so duplicates are structurally impossible — idempotence
  *    by naming, the same two-phase discipline as the graft-shard
  *    batch writer, with the epoch id as the transaction id;
  *  - `abort` deletes whatever staged files its attempt produced and
  *    leaves published segments untouched.
  *
  * Output segments are themselves a valid `graft-replay` READ layout
  * (lexicographic name order == epoch order == event-time order for
  * monotone pipelines), so stream stages compose: land → drain →
  * transform → re-land. Same executor/driver shared-filesystem
  * contract as [[KeyedShardSource]] (documented there). */
private[sources] class ReplayStreamingWrite(dir: String)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new ReplayWriterFactory(dir)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    messages.foreach {
      case ReplayStagedFile(partitionId, staged) =>
        val src = java.nio.file.Paths.get(staged)
        // an idempotent epoch replay may find its stage already
        // consumed by the previous successful publish of this name
        if (java.nio.file.Files.exists(src)) {
          java.nio.file.Files.move(src,
            d.resolve(f"epoch$epochId%05d-p$partitionId%05d.csv"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      case m => throw new IllegalStateException(
        s"graft-replay: foreign commit message $m")
    }
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case ReplayStagedFile(_, staged) =>
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(staged))
      case _ => ()
    }
}

private[sources] final case class ReplayStagedFile(
    partitionId: Int, stagedPath: String) extends WriterCommitMessage

private[sources] class ReplayWriterFactory(dir: String)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val d = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(d)
      private val staged = d.resolve(
        f".stage-$epochId%05d-p$partitionId%05d-${java.util.UUID.randomUUID()}")
      private val out = java.nio.file.Files.newBufferedWriter(staged)

      override def write(r: InternalRow): Unit = {
        out.write(s"${r.getLong(0)},${r.getLong(1)}," +
          s"${r.getUTF8String(2)},${r.getLong(3)}")
        out.write("\n")
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        ReplayStagedFile(partitionId, staged.toString)
      }
      override def abort(): Unit = {
        out.close()
        java.nio.file.Files.deleteIfExists(staged)
      }
      override def close(): Unit = ()
    }
}

private[sources] class ReplayScan(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = ReplaySource.rowSchema
  override def description(): String = "graft-replay"
  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new ReplayMicroBatchStream(options)
}

/** File-index offset; equality/hash ride on the json per the Offset
  * base-class contract. */
private[sources] final case class ReplayOffset(idx: Int) extends Offset {
  override def json(): String = idx.toString
}

private[sources] class ReplayMicroBatchStream(
    options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val dir = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("graft-replay: 'path' is required"))
  private val maxFilesPerBatch = options.getInt("maxFilesPerBatch", 1)
  require(maxFilesPerBatch > 0,
    "graft-replay: maxFilesPerBatch must be positive")

  // the file list is resolved lazily and then FROZEN for this stream
  // instance: offsets index into it, so it must not shift underneath
  // a running query (new files are picked up by the NEXT stream
  // instance — the restart path — exactly like a log segment list)
  private lazy val files: Array[String] = ReplaySource.listFiles(dir)

  /** End pinned by prepareForTriggerAvailableNow; -1 = unpinned. */
  @volatile private var availableNowEnd: Int = -1

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = files.length

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxFiles(maxFilesPerBatch)

  override def initialOffset(): Offset = ReplayOffset(0)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-replay implements SupportsAdmissionControl — " +
        "latestOffset(Offset, ReadLimit) is the entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[ReplayOffset].idx
    val cap = limit match {
      case mf: ReadMaxFiles => math.min(mf.maxFiles(), maxFilesPerBatch)
      case _ => maxFilesPerBatch
    }
    val hardEnd = if (availableNowEnd >= 0) availableNowEnd else files.length
    ReplayOffset(math.min(from + cap, hardEnd))
  }

  override def reportLatestOffset(): Offset = ReplayOffset(
    if (availableNowEnd >= 0) availableNowEnd else files.length)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[ReplayOffset].idx
    val to = end.asInstanceOf[ReplayOffset].idx
    (from until to).map(i => ReplayFilePartition(files(i)))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ReplayReaderFactory

  override def deserializeOffset(json: String): Offset =
    ReplayOffset(json.trim.toInt)

  override def commit(end: Offset): Unit = () // nothing external to ack
  override def stop(): Unit = ()
}

private[sources] final case class ReplayFilePartition(file: String)
  extends InputPartition

private[sources] class ReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[ReplayFilePartition].file
    new PartitionReader[InternalRow] {
      private val stream = java.nio.file.Files.lines(
        java.nio.file.Paths.get(file))
      private val lines = stream.iterator()
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (lines.hasNext) {
          val line = lines.next().trim
          if (line.nonEmpty) {
            val parts = line.split(",", -1)
            if (parts.length != 4)
              throw new IllegalArgumentException(
                s"graft-replay: malformed line '$line' in $file " +
                  "(expected ts_us,user_id,event_type,cents)")
            try {
              current = InternalRow(parts(0).toLong, parts(1).toLong,
                UTF8String.fromString(parts(2)), parts(3).toLong)
            } catch { case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"graft-replay: malformed number in '$line' in $file")
            }
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = stream.close()
    }
  }
}
