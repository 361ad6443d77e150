package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
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
  *    list — "the first i files are consumed" — and additionally PIN
  *    the NAME of the last consumed file: a restart re-lists the
  *    directory, and if a file has landed with a lexicographically
  *    earlier name than an already-consumed segment (violating the
  *    log-segment append contract) every index would silently shift,
  *    re-reading some events and skipping others — so the resume path
  *    verifies the pinned name still sits at the pinned index and
  *    fails LOUDLY on prefix drift instead. Offsets serialize to JSON
  *    in the checkpoint like any production source's (bare-integer
  *    offsets from older checkpoints still deserialize, unpinned).
  *  - ADMISSION CONTROL (`SupportsAdmissionControl.latestOffset(start,
  *    limit)`): at most `maxFilesPerBatch` files (default 1) AND at
  *    most `maxBytesPerBatch` cumulative bytes (always admitting at
  *    least one file so the stream cannot stall) per micro-batch,
  *    intersected with the planner's own `ReadMaxFiles`/`ReadMaxBytes`
  *    limits — the rate-limit contract that keeps a 100 TB backlog
  *    drain in bounded-memory batches with a checkpoint between each,
  *    instead of one giant catch-up batch.
  *  - `SupportsTriggerAvailableNow`: `prepareForTriggerAvailableNow`
  *    PINS the replay end at the trigger moment, so an AvailableNow
  *    drain processes exactly the files present at start — in bounded
  *    batches — and terminates even if files keep landing.
  *
  * The DEFAULT row schema is the events shape (`ts_us` long micros,
  * `user_id` long, `event_type` string, `cents` long), but the source
  * accepts a user-declared schema (`supportsExternalMetadata`;
  * `readStream.schema(...)`) of any BIGINT/DOUBLE/STRING columns —
  * the same generalization step Kafka's value-schema takes. Malformed
  * lines name the file, same strictness as [[KeyedShardSource]].
  * Files are read whole — one input partition per file per batch — so
  * batch boundaries are exactly file boundaries and every drain of
  * the same directory yields the same batch sequence (what makes the
  * stream ≡ batch oracle comparison in q376 exact rather than
  * probabilistic).
  */
class ReplaySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-replay"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReplaySource.rowSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    ReplaySource.validateSchema(schema)
    new ReplayTable(schema, new CaseInsensitiveStringMap(properties))
  }
}

object ReplaySource {
  val rowSchema: StructType = StructType(Seq(
    StructField("ts_us", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("cents", LongType, nullable = false)))

  def validateSchema(schema: StructType): Unit = {
    require(schema.fields.nonEmpty, "graft-replay: empty schema")
    schema.fields.foreach(f => require(
      f.dataType == LongType || f.dataType == DoubleType ||
        f.dataType == StringType,
      s"graft-replay: unsupported column type ${f.dataType.simpleString} " +
        s"for '${f.name}' (BIGINT/DOUBLE/STRING only)"))
  }

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

private[sources] class ReplayTable(tableSchema: StructType,
    options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "graft-replay"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(
      caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](
      options.asCaseSensitiveMap())
    merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
    new ReplayScan(tableSchema, new CaseInsensitiveStringMap(merged))
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
      tableSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"graft-replay: write schema ${got.simpleString} must match " +
        s"${tableSchema.simpleString}")
    new ReplayWriteBuilder(dir, tableSchema)
  }
}

private[sources] class ReplayWriteBuilder(dir: String,
    schema: StructType) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toStreaming: StreamingWrite =
      new ReplayStreamingWrite(dir, schema)
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
  * transform → re-land. To keep that contract TRUE rather than
  * aspirational, string values are VALIDATED at write time: a value
  * containing the CSV delimiter or a line terminator would produce
  * segments the read side rejects (or, crafted, mis-parses), so the
  * task fails loudly instead of accepting a row it cannot round-trip.
  * Same executor/driver shared-filesystem contract as
  * [[KeyedShardSource]] (documented there). */
private[sources] class ReplayStreamingWrite(dir: String,
    schema: StructType) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new ReplayWriterFactory(dir, schema)

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

private[sources] class ReplayWriterFactory(dir: String,
    schema: StructType) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val d = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(d)
      private val staged = d.resolve(
        f".stage-$epochId%05d-p$partitionId%05d-${java.util.UUID.randomUUID()}")
      private val out = java.nio.file.Files.newBufferedWriter(staged)
      private val types = schema.fields.map(_.dataType)

      override def write(r: InternalRow): Unit = {
        val line = types.indices.map { i =>
          types(i) match {
            case LongType => r.getLong(i).toString
            case DoubleType => r.getDouble(i).toString
            case StringType =>
              val s = r.getUTF8String(i).toString
              // refuse rows the CSV layout cannot round-trip — a
              // delimiter or line break inside a value would publish
              // a segment the read side rejects or mis-parses
              if (s.indexOf(',') >= 0 || s.indexOf('\n') >= 0 ||
                  s.indexOf('\r') >= 0)
                throw new IllegalArgumentException(
                  s"graft-replay: string value for " +
                    s"'${schema.fields(i).name}' contains a CSV " +
                    s"delimiter or line terminator and cannot " +
                    s"round-trip through a replay segment: " +
                    s"'${s.take(80)}'")
              s
            case dt => throw new IllegalStateException(s"unsupported $dt")
          }
        }.mkString(",")
        out.write(line)
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

private[sources] class ReplayScan(schema: StructType,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = schema
  override def description(): String = "graft-replay"
  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new ReplayMicroBatchStream(schema, options)
}

/** File-index offset, PINNED to the basename of the last consumed
  * file so a restart can detect list drift (see class doc above).
  * Equality/hash ride on the json per the Offset base-class contract;
  * a bare integer (the pre-pinning format) still deserializes, as
  * unpinned. */
private[sources] final case class ReplayOffset(idx: Int,
    last: Option[String] = None) extends Offset {
  override def json(): String = last match {
    case None => idx.toString
    case Some(n) =>
      val node = ReplayOffset.mapper.createObjectNode()
      node.put("idx", idx)
      node.put("last", n)
      ReplayOffset.mapper.writeValueAsString(node)
  }
}

private[sources] object ReplayOffset {
  /** Proper JSON codec (Jackson, which Spark ships) — the previous
    * hand-rolled regex + sequential unescape was order-ambiguous for
    * segment names mixing backslashes and quotes, and its greedy
    * capture assumed no other fields could ever appear. */
  private[sources] val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
  def parse(json: String): ReplayOffset = {
    val t = json.trim
    if (t.startsWith("{")) {
      val node = mapper.readTree(t)
      require(node.hasNonNull("idx"),
        s"graft-replay: malformed checkpoint offset '$t'")
      ReplayOffset(node.get("idx").asInt(),
        Option(node.get("last")).filterNot(_.isNull).map(_.asText()))
    } else ReplayOffset(t.toInt) // pre-pinning bare-integer format
  }
}

private[sources] class ReplayMicroBatchStream(schema: StructType,
    options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val dir = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("graft-replay: 'path' is required"))
  private val maxFilesPerBatch = options.getInt("maxFilesPerBatch", 1)
  require(maxFilesPerBatch > 0,
    "graft-replay: maxFilesPerBatch must be positive")
  private val maxBytesPerBatch =
    options.getLong("maxBytesPerBatch", Long.MaxValue)
  require(maxBytesPerBatch > 0,
    "graft-replay: maxBytesPerBatch must be positive")

  // the file list is resolved lazily and then FROZEN for this stream
  // instance: offsets index into it, so it must not shift underneath
  // a running query (new files are picked up by the NEXT stream
  // instance — the restart path — exactly like a log segment list)
  private lazy val files: Array[String] = ReplaySource.listFiles(dir)

  private def baseName(path: String): String =
    java.nio.file.Paths.get(path).getFileName.toString

  /** The log-segment contract, VERIFIED instead of assumed: a resumed
    * offset's pinned last-consumed name must still sit at its pinned
    * index in the re-listed directory — if a file landed with a
    * lexicographically earlier name every index shifted, and resuming
    * would silently re-read some events and skip others. */
  private def verify(o: ReplayOffset): ReplayOffset = {
    o.last.foreach { name =>
      require(o.idx >= 1 && o.idx <= files.length &&
        baseName(files(o.idx - 1)) == name,
        s"graft-replay: checkpoint offset pins file $name at index " +
          s"${o.idx - 1}, but the re-listed directory has " +
          (if (o.idx >= 1 && o.idx <= files.length)
            s"'${baseName(files(o.idx - 1))}'"
          else s"only ${files.length} files") +
          " there — a segment landed out of lexicographic order and " +
          "shifted the consumed prefix; refusing to resume (would " +
          "silently re-read and skip events)")
    }
    o
  }

  private def pinned(idx: Int): ReplayOffset =
    ReplayOffset(idx, if (idx >= 1) Some(baseName(files(idx - 1))) else None)

  /** End pinned by prepareForTriggerAvailableNow; -1 = unpinned. */
  @volatile private var availableNowEnd: Int = -1

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = files.length

  override def getDefaultReadLimit: ReadLimit =
    if (maxBytesPerBatch != Long.MaxValue)
      ReadLimit.compositeLimit(Array(
        ReadLimit.maxFiles(maxFilesPerBatch): ReadLimit,
        ReadLimit.maxBytes(maxBytesPerBatch)))
    else ReadLimit.maxFiles(maxFilesPerBatch)

  override def initialOffset(): Offset = ReplayOffset(0)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft-replay implements SupportsAdmissionControl — " +
        "latestOffset(Offset, ReadLimit) is the entry point")

  /** Admission: intersect the source's own caps with the planner's
    * limits, admit files in order until either cap trips — but always
    * at least ONE file (a single over-cap segment must not stall the
    * stream; same rule as Spark's file source and Kafka's
    * minOffsetPerTrigger floor). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = verify(ReplayOffset.parse(
      start.asInstanceOf[ReplayOffset].json())).idx
    var fileCap = maxFilesPerBatch
    var byteCap = maxBytesPerBatch
    def absorb(l: ReadLimit): Unit = l match {
      case mf: ReadMaxFiles => fileCap = math.min(mf.maxFiles(), fileCap)
      case mb: ReadMaxBytes => byteCap = math.min(mb.maxBytes(), byteCap)
      case c: CompositeReadLimit => c.getReadLimits.foreach(absorb)
      case _ => ()
    }
    absorb(limit)
    val hardEnd = if (availableNowEnd >= 0) availableNowEnd else files.length
    var i = from
    var bytes = 0L
    while (i < hardEnd && (i - from) < fileCap && bytes < byteCap) {
      val sz = new java.io.File(files(i)).length()
      if (i > from && bytes + sz > byteCap) {
        // next file would blow the byte budget — stop before it
        bytes = byteCap
      } else {
        bytes += sz
        i += 1
      }
    }
    pinned(i)
  }

  override def reportLatestOffset(): Offset = pinned(
    if (availableNowEnd >= 0) availableNowEnd else files.length)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = verify(ReplayOffset.parse(
      start.asInstanceOf[ReplayOffset].json())).idx
    val to = verify(ReplayOffset.parse(
      end.asInstanceOf[ReplayOffset].json())).idx
    (from until to).map(i => ReplayFilePartition(files(i)))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ReplayReaderFactory(schema)

  override def deserializeOffset(json: String): Offset =
    verify(ReplayOffset.parse(json))

  override def commit(end: Offset): Unit = () // nothing external to ack
  override def stop(): Unit = ()
}

private[sources] final case class ReplayFilePartition(file: String)
  extends InputPartition

private[sources] class ReplayReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[ReplayFilePartition].file
    val types = schema.fields.map(_.dataType)
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
            if (parts.length != types.length)
              throw new IllegalArgumentException(
                s"graft-replay: malformed line '$line' in $file " +
                  s"(expected ${schema.fieldNames.mkString(",")})")
            try {
              current = InternalRow(types.indices.map { i =>
                types(i) match {
                  case LongType => java.lang.Long.valueOf(parts(i))
                  case DoubleType => java.lang.Double.valueOf(parts(i))
                  case StringType => UTF8String.fromString(parts(i))
                  case dt =>
                    throw new IllegalStateException(s"unsupported $dt")
                }
              }.toIndexedSeq: _*)
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
