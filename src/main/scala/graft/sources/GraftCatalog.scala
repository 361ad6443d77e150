package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.sql.catalog.<name> = graft.sources.GraftCatalog` — a
  * filesystem-backed DataSourceV2 [[TableCatalog]] whose tables
  * support the FULL SQL DML surface, including ROW-LEVEL OPERATIONS
  * (`DELETE FROM` / `UPDATE` / `MERGE INTO`) via
  * [[SupportsRowLevelOperations]] in the COPY-ON-WRITE (group-based)
  * style: Catalyst's RewriteDelete/RewriteUpdate/RewriteMergeIntoTable
  * plans compute the complete post-operation content of every
  * affected group through the operation's own scan, and the
  * operation's write REPLACES those groups atomically. This is the
  * mechanism behind every table format's MERGE (Iceberg/Delta
  * copy-on-write), exercised here with the SIMPLEST sound group
  * geometry — ONE group per table — so the replace is a single
  * atomic rename; a production variant keys groups by file exactly
  * like [[KeyedShardSource]] keys partitions, swapping only the
  * group-resolution and commit fan-out, not the interfaces.
  *
  * Layout: `<root>/<namespace…>/<table>/schema.json` (Spark's own
  * StructType JSON) + `data.tsv` (tab-separated; `\t \n \\` escaped,
  * `\N` is NULL). Long/Double/String columns (the DML battery's
  * domain); anything else is refused at CREATE. Writes stage
  * per-task files and commit by concatenate-and-atomic-rename —
  * append for INSERT, replace for row-level ops and TRUNCATE
  * overwrites. Same shared-filesystem contract as
  * [[KeyedShardSource]].
  */
class GraftCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: Path = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Paths.get(Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name': spark.sql.catalog.$name.root is required")))
    Files.createDirectories(root)
  }

  override def name(): String = catalogName

  private def tableDir(ident: Identifier): Path =
    ident.namespace().foldLeft(root)(_.resolve(_)).resolve(ident.name())

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = namespace.foldLeft(root)(_.resolve(_))
    if (!Files.isDirectory(ns))
      throw new NoSuchNamespaceException(namespace)
    Option(ns.toFile.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory &&
        Files.exists(d.toPath.resolve("schema.json")))
      .map(d => Identifier.of(namespace, d.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    val schemaFile = dir.resolve("schema.json")
    if (!Files.exists(schemaFile))
      throw new NoSuchTableException(ident)
    val schema = DataType.fromJson(Files.readString(schemaFile))
      .asInstanceOf[StructType]
    new GraftRlTable(ident.toString, dir, schema)
  }

  /** TIME TRAVEL (`SELECT … VERSION AS OF n`): every commit snapshots
    * the published group as `data.v<n>.tsv` (copy-on-write versioning
    * IS a retained copy per commit — the lakehouse trade), so loading
    * version n is just reading that immutable snapshot. Versioned
    * tables are read-only: they expose no write builder target and a
    * DML statement against them fails in analysis. v0 (the empty
    * just-created table) is addressable too. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    val schemaFile = dir.resolve("schema.json")
    if (!Files.exists(schemaFile))
      throw new NoSuchTableException(ident)
    val v = try version.trim.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"graft catalog: VERSION AS OF expects an integer, got '$version'")
      }
    val snap = if (v == 0L) None else Some(dir.resolve(f"data.v$v%05d.tsv"))
    snap.foreach(p => require(Files.exists(p),
      s"graft catalog: ${ident.toString} has no version $v"))
    val schema = DataType.fromJson(Files.readString(schemaFile))
      .asInstanceOf[StructType]
    new GraftRlTable(s"${ident.toString}@v$v", dir, schema,
      dataFileName = snap.map(_.getFileName.toString)
        .getOrElse("data.v00000.tsv"))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft catalog: partitioned tables not supported (one group per table)")
    schema.fields.foreach(f => require(
      f.dataType == LongType || f.dataType == StringType ||
        f.dataType == DoubleType,
      s"graft catalog: unsupported column type ${f.dataType.simpleString}"))
    val dir = tableDir(ident)
    if (Files.exists(dir.resolve("schema.json")))
      throw new TableAlreadyExistsException(
        ident.namespace().toSeq :+ ident.name())
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("schema.json"), schema.json)
    Files.writeString(dir.resolve("data.tsv"), "")
    Files.writeString(dir.resolve("data.v00000.tsv"), "")
    new GraftRlTable(ident.toString, dir, schema)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER TABLE not supported")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!Files.exists(dir.resolve("schema.json"))) false
    else {
      graft.streaming.StreamingResidue.deleteRecursively(dir)
      true
    }
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: RENAME not supported")
}

private[sources] object GraftRlTable {
  /** TSV escaping: `\t`, `\n`, `\\`; NULL is the bare token `\N`. */
  def escape(s: String): String = {
    val b = new StringBuilder(s.length)
    s.foreach {
      case '\t' => b.append("\\t")
      case '\n' => b.append("\\n")
      case '\\' => b.append("\\\\")
      case c => b.append(c)
    }
    b.result()
  }

  def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => b.append('\t'); i += 2
          case 'n' => b.append('\n'); i += 2
          case '\\' => b.append('\\'); i += 2
          case other => b.append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.result()
  }

  /** `off` skips leading non-data fields: Spark 4's group-based
    * ReplaceData query PREPENDS a literal `__row_operation` marker
    * column to every row (the analyzed plan is
    * `Project [6 AS __row_operation, <table cols>]`) even though the
    * LogicalWriteInfo schema declares only the data columns — the
    * row-level write path passes off=1 and validates the arity. */
  def rowToLine(r: InternalRow, schema: StructType, off: Int): String = {
    require(r.numFields == schema.fields.length + off,
      s"graft catalog: writer row has ${r.numFields} fields, " +
        s"expected ${schema.fields.length + off}")
    schema.fields.indices.map { i =>
      if (r.isNullAt(i + off)) "\\N"
      else schema.fields(i).dataType match {
        case LongType => r.getLong(i + off).toString
        case DoubleType =>
          // canonical bit pattern, not a formatted decimal — the
          // round trip must be exact for every double
          java.lang.Long.toHexString(
            java.lang.Double.doubleToLongBits(r.getDouble(i + off)))
        case StringType => escape(r.getUTF8String(i + off).toString)
        case dt => throw new IllegalStateException(s"unsupported $dt")
      }
    }.mkString("\t")
  }

  def lineToRow(line: String, schema: StructType): InternalRow = {
    val parts = line.split("\t", -1)
    require(parts.length == schema.fields.length,
      s"graft catalog: malformed row '$line'")
    InternalRow(schema.fields.indices.map { i =>
      val p = parts(i)
      if (p == "\\N") null
      else schema.fields(i).dataType match {
        case LongType => java.lang.Long.valueOf(p)
        case DoubleType => java.lang.Double.valueOf(
          java.lang.Double.longBitsToDouble(
            java.lang.Long.parseUnsignedLong(p, 16)))
        case StringType => UTF8String.fromString(unescape(p))
        case dt => throw new IllegalStateException(s"unsupported $dt")
      }
    }: _*)
  }
}

private[sources] class GraftRlTable(ident: String, dir: Path,
    tableSchema: StructType, dataFileName: String = "data.tsv")
  extends Table with SupportsRead with SupportsWrite
  with SupportsRowLevelOperations {

  override def name(): String = ident
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRlScan(dir, tableSchema, dataFileName)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftRlWriteBuilder(dir, tableSchema, info.schema())

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = new RowLevelOperation {
        override def command(): RowLevelOperation.Command = info.command()
        override def description(): String =
          s"graft-rl ${info.command()} on $ident"
        // the rewrite plan reads the affected groups through the
        // operation's OWN scan (one group = the whole table here)
        override def newScanBuilder(
            options: CaseInsensitiveStringMap): ScanBuilder =
          new GraftRlScan(dir, tableSchema)
        // ...and REPLACES them with the computed post-operation rows
        override def newWriteBuilder(
            info: LogicalWriteInfo): WriteBuilder = {
          require(info.schema().fields.map(f => (f.name, f.dataType))
              .toSeq ==
            tableSchema.fields.map(f => (f.name, f.dataType)).toSeq,
            s"graft catalog: replace-write schema " +
              s"${info.schema().simpleString} != table " +
              s"${tableSchema.simpleString}")
          new WriteBuilder {
            override def build(): Write = new Write {
              override def toBatch: BatchWrite = new GraftRlBatchWrite(
                dir, tableSchema, replace = true, rowOffset = 1)
            }
          }
        }
      }
    }
}

private[sources] class GraftRlScan(dir: Path, schema: StructType,
    dataFileName: String = "data.tsv")
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"graft-rl-table $dir/$dataFileName"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftRlPartition(dir.resolve(dataFileName).toString))
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRlReaderFactory(schema)
}

private[sources] final case class GraftRlPartition(file: String)
  extends InputPartition

private[sources] class GraftRlReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[GraftRlPartition].file
    new PartitionReader[InternalRow] {
      private val stream = Files.lines(Paths.get(file))
      private val lines = stream.iterator()
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (lines.hasNext) {
          val line = lines.next()
          if (line.nonEmpty) {
            current = GraftRlTable.lineToRow(line, schema)
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

private[sources] class GraftRlWriteBuilder(dir: Path,
    tableSchema: StructType, writeSchema: StructType)
  extends WriteBuilder with SupportsTruncate {
  require(writeSchema.fields.map(f => (f.name, f.dataType)).toSeq ==
    tableSchema.fields.map(f => (f.name, f.dataType)).toSeq,
    s"graft catalog: write schema ${writeSchema.simpleString} must " +
      s"match table schema ${tableSchema.simpleString}")
  private var replace = false
  override def truncate(): WriteBuilder = { replace = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftRlBatchWrite(dir, tableSchema, replace)
  }
}

private[sources] final case class GraftRlStaged(stagedPath: String)
  extends WriterCommitMessage

/** Two-phase commit over the single group: tasks stage dot-prefixed
  * files, commit concatenates them (plus the existing content for
  * appends) into a fresh file and ATOMIC-renames it over `data.tsv` —
  * the same staged/publish discipline as the graft-shard and replay
  * writers, with replace-vs-append the only branch. */
private[sources] class GraftRlBatchWrite(dir: Path, schema: StructType,
    replace: Boolean, rowOffset: Int = 0) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftRlWriterFactory(dir.toString, schema, rowOffset)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val target = dir.resolve("data.tsv")
    val tmp = dir.resolve(s".commit-${java.util.UUID.randomUUID()}")
    val out = Files.newBufferedWriter(tmp)
    try {
      if (!replace && Files.exists(target)) {
        val prior = Files.lines(target)
        try prior.iterator().asScala.foreach { l =>
          if (l.nonEmpty) { out.write(l); out.write("\n") }
        } finally prior.close()
      }
      messages.foreach {
        case GraftRlStaged(p) =>
          val path = Paths.get(p)
          if (Files.exists(path)) {
            val st = Files.lines(path)
            try st.iterator().asScala.foreach { l =>
              if (l.nonEmpty) { out.write(l); out.write("\n") }
            } finally st.close()
            Files.delete(path)
          }
        case m => throw new IllegalStateException(
          s"graft catalog: foreign commit message $m")
      }
    } finally out.close()
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // version snapshot for time travel: the next free data.v<n>.tsv
    // (monotone per table; commits are serialized by the driver)
    val next = 1L + Option(dir.toFile.listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .collect { case n if n.startsWith("data.v") && n.endsWith(".tsv") =>
        n.stripPrefix("data.v").stripSuffix(".tsv").toLong
      }.foldLeft(-1L)(math.max)
    Files.copy(target, dir.resolve(f"data.v$next%05d.tsv"))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftRlStaged(p) => Files.deleteIfExists(Paths.get(p))
      case _ => ()
    }
}

private[sources] class GraftRlWriterFactory(dir: String,
    schema: StructType, rowOffset: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val staged = Paths.get(dir).resolve(
        f".stage-p$partitionId%05d-t$taskId-${java.util.UUID.randomUUID()}")
      private val out = Files.newBufferedWriter(staged)
      override def write(r: InternalRow): Unit = {
        out.write(GraftRlTable.rowToLine(r, schema, rowOffset))
        out.write("\n")
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        GraftRlStaged(staged.toString)
      }
      override def abort(): Unit = {
        out.close()
        Files.deleteIfExists(staged)
      }
      override def close(): Unit = ()
    }
}
