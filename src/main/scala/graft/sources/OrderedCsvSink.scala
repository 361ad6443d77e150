package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `df.write.format("graft-csv")` — the DataSourceV2 WRITE shell of
  * the reference's ordered, headered, single-file CSV sink
  * (`pipeline_job.py:130-142`): the declarative twin of
  * [[Sources.writeSingleCsv]] (S4), completing the engine's DSv2
  * surface (read: `graft-html`; write: this).
  *
  * The interesting part is HOW the ordering/single-file contract is
  * expressed: the Write implements
  * [[RequiresDistributionAndOrdering]] with an ordered distribution
  * over the `order` option's columns and requiredNumPartitions = 1 —
  * so SPARK plans the global sort and the single partition (the same
  * planner mechanism EnsureRequirements uses for any exec), instead
  * of the caller hand-writing `coalesce(1).sortWithinPartitions`.
  * The executor-side DataWriter streams rows to a task-temp file; the
  * driver-side commit renames it onto `path` atomically — classic
  * two-phase V2 commit, and crash/abort leaves only temp files.
  *
  * Scale note (same as S4): a single ordered CSV is a COLLECTION
  * endpoint — the reference's contract for its ≤ few-hundred-row
  * report — not a distributed table format; the 1-partition
  * requirement is the semantic, not a limitation.
  */
class OrderedCsvSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-csv"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only source: schema comes from the frame
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OrderedCsvTable(schema)
}

private[sources] class OrderedCsvTable(schema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = "graft-csv"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new OrderedCsvWriteBuilder(info)
}

private[sources] class OrderedCsvWriteBuilder(info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder = this // overwrite == replace file
  override def build(): Write = new OrderedCsvWrite(info)
}

private[sources] class OrderedCsvWrite(info: LogicalWriteInfo)
    extends Write with RequiresDistributionAndOrdering {
  private val path = Option(info.options.get("path")).getOrElse(
    throw new IllegalArgumentException("graft-csv requires a path option"))
  private val orderCols: Array[String] =
    Option(info.options.get("order")).map(_.split(",").map(_.trim))
      .getOrElse(Array.empty)

  override def requiredDistribution(): Distribution =
    if (orderCols.isEmpty) Distributions.unspecified()
    else Distributions.ordered(orderCols.map(c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)))
  override def requiredOrdering(): Array[SortOrder] =
    orderCols.map(c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))
  override def requiredNumPartitions(): Int = 1

  override def toBatch: BatchWrite =
    new OrderedCsvBatchWrite(path, info.schema())
}

private[sources] case class CsvCommit(tmpPath: String)
    extends WriterCommitMessage

private[sources] class OrderedCsvBatchWrite(path: String,
    schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new OrderedCsvWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val tmps = messages.collect { case CsvCommit(t) => t }
    require(tmps.length == 1,
      s"graft-csv expects exactly one partition, got ${tmps.length}")
    val target = Paths.get(path)
    Option(target.toAbsolutePath.getParent).foreach(Files.createDirectories(_))
    Files.move(Paths.get(tmps.head), target,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case CsvCommit(t) => t }
      .foreach(t => Files.deleteIfExists(Paths.get(t)))
}

private[sources] class OrderedCsvWriterFactory(path: String,
    schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new OrderedCsvDataWriter(s"$path.tmp-$partitionId-$taskId", schema)
}

private[sources] class OrderedCsvDataWriter(tmpPath: String,
    schema: StructType) extends DataWriter[InternalRow] {
  private val out = Files.newBufferedWriter(Paths.get(tmpPath),
    StandardCharsets.UTF_8)
  out.write(schema.fieldNames.map(quote).mkString(","))
  out.write("\n")

  private def quote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def render(row: InternalRow, i: Int, dt: DataType): String =
    if (row.isNullAt(i)) ""
    else dt match {
      case StringType => quote(row.getUTF8String(i).toString)
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case DoubleType => row.getDouble(i).toString
      case FloatType => row.getFloat(i).toString
      case BooleanType => row.getBoolean(i).toString
      case TimestampType => // µs since epoch → ISO, UTC (S4 parity)
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(row.getLong(i), 1000000L),
          Math.floorMod(row.getLong(i), 1000000L) * 1000L)
          .toString.stripSuffix("Z").replace("T", " ")
      case other => throw new UnsupportedOperationException(
        s"graft-csv: unsupported type $other")
    }

  override def write(row: InternalRow): Unit = {
    var i = 0
    val n = schema.length
    val sb = new java.lang.StringBuilder
    while (i < n) {
      if (i > 0) sb.append(',')
      sb.append(render(row, i, schema(i).dataType))
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString)
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    CsvCommit(tmpPath)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(Paths.get(tmpPath))
  }

  override def close(): Unit = ()
}
