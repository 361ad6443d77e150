package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns, SupportsReportOrdering, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("graft-shard-keyed")` — a DataSourceV2 connector
  * over a KEY-PARTITIONED shard directory (the `write.partitionBy("g")`
  * layout: `g=<value>/…​.csv`, one `x` per line) that implements
  * `SupportsReportPartitioning`: the scan DECLARES its data is already
  * clustered by `g` (`KeyGroupedPartitioning`, one input partition per
  * key directory, each carrying its `HasPartitionKey` row), so under
  * `spark.sql.sources.v2.bucketing.enabled` Spark's EnsureRequirements
  * sees every `GROUP BY g` / join-on-g clustering requirement ALREADY
  * satisfied and plans NO Exchange — the storage-partitioned-execution
  * contract (SPARK-37377), and the remaining read-path DSv2 capability
  * [[ShardStatsSource]]'s ladder (filters, pruning, aggregates, limit,
  * top-n, runtime filtering) doesn't cover.
  *
  * Why it matters at 100 TB: a corpus laid out by its natural key
  * (tenant, date, priority) re-shuffles on EVERY aggregate/join over
  * that key if the engine can't see the layout — the single largest
  * avoidable exchange in a warehouse. Reporting the partitioning turns
  * those into narrow, per-directory pipelines. All files of one key
  * are CHAINED INTO ONE input partition by the scan itself, so
  * correctness never depends on Spark's optional same-key split
  * grouping; the cost is one task per key, which is the right shape
  * when the key domain is the unit of downstream consumption.
  *
  * The layout is self-describing (`g=` directory names, URL-escaped by
  * the writer, decoded here); non-keyed directories fail loudly rather
  * than degrade to a mis-declared partitioning — a WRONG partitioning
  * claim silently produces WRONG aggregates, so the guard is strict.
  *
  * FILESYSTEM CONTRACT: this source lists directories with
  * driver-local `java.io.File` and readers open executor-local
  * absolute paths with `java.nio.Files` — it requires a filesystem
  * every node sees at the same path (local mode, NFS/Lustre/FUSE
  * mounts). It intentionally does NOT route through Hadoop
  * `FileSystem`: the connector exists to demonstrate the
  * `SupportsReportPartitioning` contract, and a production object-store
  * variant would swap only `keyedDirs` + the reader's open call —
  * the partitioning declaration (the part Spark cares about) is
  * path-scheme-agnostic. Compare [[ShardStatsSource]] which shows the
  * Hadoop-FS-routed listing for the same shard layout.
  */
class KeyedShardSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-shard-keyed"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedShardSource.rowSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KeyedShardTable(new CaseInsensitiveStringMap(properties))
}

object KeyedShardSource {
  val rowSchema: StructType = StructType(Seq(
    StructField("g", StringType, nullable = false),
    StructField("x", LongType, nullable = false)))

  /** (key, sorted csv files) per `g=<value>` subdirectory. */
  private[sources] def keyedDirs(
      opts: CaseInsensitiveStringMap): Array[(String, Array[String])] = {
    val dir = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-shard-keyed: 'path' is required"))
    val subs = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory)
      .filter(_.getName.startsWith("g="))
    require(subs.nonEmpty,
      s"graft-shard-keyed: no g=<value> subdirectories under $dir — " +
        "refusing to claim a partitioning the layout doesn't have")
    subs.map { d =>
      val key = java.net.URLDecoder.decode(
        d.getName.stripPrefix("g="), "UTF-8")
      val files = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".csv"))
        .map(_.getAbsolutePath).sorted
      (key, files)
    }.sortBy(_._1)
  }
}

private[sources] class KeyedShardTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsMetadataColumns {
  override def name(): String = "graft-shard-keyed"
  override def schema(): StructType = KeyedShardSource.rowSchema
  override def capabilities(): util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  /** `_shard_dir` — the `g=<value>` directory a row was read from:
    * file-provenance as a METADATA COLUMN (`SupportsMetadataColumns`,
    * the `_metadata` mechanism user tables get for free), projected
    * only when referenced — absent from `SELECT *`, pruned like any
    * column when unused, so provenance costs nothing unless asked
    * for. */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_shard_dir"
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String =
        "g=<value> shard directory this row was read from"
    })
  override def newScanBuilder(
      caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](
      options.asCaseSensitiveMap())
    merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
    new KeyedShardScan(new CaseInsensitiveStringMap(merged))
  }
}

private[sources] class KeyedShardScan(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch with SupportsReportPartitioning
    with SupportsReportOrdering with SupportsPushDownRequiredColumns {

  private lazy val dirs = KeyedShardSource.keyedDirs(options)
  private val ordered = options.getBoolean("ordered", false)

  /** COLUMN PRUNING (`SupportsPushDownRequiredColumns`): the planner
    * hands down exactly the referenced columns — including the
    * `_shard_dir` metadata column when (and only when) the query asks
    * for it — and the reader materializes nothing else. A scan that
    * decodes `g` strings for a `sum(x)` rollup is wasted I/O at any
    * scale. */
  private var prunedSchema: StructType = KeyedShardSource.rowSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    prunedSchema = requiredSchema

  override def build(): Scan = this
  override def readSchema(): StructType = prunedSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-shard-keyed keys=${dirs.length} ordered=$ordered " +
      s"columns=[${prunedSchema.fieldNames.mkString(",")}]"

  private def has(name: String): Boolean =
    prunedSchema.fieldNames.contains(name)

  /** The key-grouped claim is only valid while `g` is in the output —
    * a pruned-away clustering column leaves nothing for
    * EnsureRequirements to match against, so the scan degrades
    * honestly to UnknownPartitioning instead of referencing a column
    * it no longer produces. */
  override def outputPartitioning(): Partitioning =
    if (has("g"))
      new KeyGroupedPartitioning(
        Array(Expressions.identity("g")), dirs.length)
    else new UnknownPartitioning(dirs.length)

  /** `option("ordered", true)` is the writer's declaration that every
    * file carries non-decreasing `x` AND each key's files are named so
    * their lexicographic order concatenates sorted (the
    * sortWithinPartitions staging layout) — the scan then reports
    * per-partition ordering `[g ASC, x ASC]` (g is constant within a
    * key partition, so any g direction holds vacuously) and Spark's
    * EnsureRequirements drops the Sort under windows/SMJs keyed this
    * way — the sort-elimination half of storage-partitioned execution.
    * The claim is VERIFIED, not trusted: the reader throws on the
    * first out-of-order row (a wrong ordering claim silently corrupts
    * merge joins and window frames — same strictness as the
    * partitioning guard above). Without the option the scan reports
    * no ordering and plans sort as usual. */
  override def outputOrdering(): Array[SortOrder] =
    if (ordered)
      Array(("g", has("g")), ("x", has("x"))).collect {
        case (c, true) =>
          Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)
      }
    else Array.empty

  override def planInputPartitions(): Array[InputPartition] =
    dirs.map { case (k, files) =>
      KeyedShardPartition(k, files, ordered, prunedSchema.fieldNames)
    }.toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new KeyedShardReaderFactory
}

private[sources] final case class KeyedShardPartition(
    key: String, files: Array[String], ordered: Boolean = false,
    columns: Array[String] = Array("g", "x"))
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(UTF8String.fromString(key))
}

private[sources] class KeyedShardReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[KeyedShardPartition]
    new PartitionReader[InternalRow] {
      private val g = UTF8String.fromString(kp.key)
      private var fileIdx = 0
      private var lines: java.util.Iterator[String] = _
      private var stream: java.util.stream.Stream[String] = _
      private var current: InternalRow = _
      private var prevX = Long.MinValue
      private var shardDir: UTF8String = _

      private def advance(): Boolean = {
        while (true) {
          if (lines != null && lines.hasNext) {
            val line = lines.next().trim
            if (line.nonEmpty) {
              val x =
                try line.toLong
                catch { case _: NumberFormatException =>
                  throw new IllegalArgumentException(
                    s"graft-shard-keyed: malformed long '$line' in " +
                      s"${kp.files(fileIdx - 1)} (key g=${kp.key})")
                }
              if (kp.ordered) {
                if (x < prevX)
                  throw new IllegalStateException(
                    s"graft-shard-keyed: ordered=true but $x < $prevX in " +
                      s"${kp.files(fileIdx - 1)} (key g=${kp.key}) — " +
                      "refusing to serve a false ordering claim")
                prevX = x
              }
              current = InternalRow(kp.columns.map {
                case "g" => g
                case "x" => java.lang.Long.valueOf(x)
                case "_shard_dir" => shardDir
                case other => throw new IllegalStateException(
                  s"graft-shard-keyed: unknown column '$other'")
              }.toIndexedSeq: _*)
              return true
            }
          } else if (fileIdx < kp.files.length) {
            if (stream != null) stream.close()
            val path = java.nio.file.Paths.get(kp.files(fileIdx))
            shardDir = UTF8String.fromString(
              path.getParent.getFileName.toString)
            stream = java.nio.file.Files.lines(path)
            lines = stream.iterator()
            fileIdx += 1
          } else return false
        }
        false
      }

      override def next(): Boolean = advance()
      override def get(): InternalRow = current
      override def close(): Unit = if (stream != null) stream.close()
    }
  }
}
