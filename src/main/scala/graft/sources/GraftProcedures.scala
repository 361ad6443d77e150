package graft.sources

import java.nio.file.{Path, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL STORED PROCEDURES (`CALL cat.system.optimize('db.t', 1000)`) —
  * the maintenance tier exposed through Spark 4's DSv2
  * [[org.apache.spark.sql.connector.catalog.ProcedureCatalog]]
  * protocol, the same surface Iceberg ships its `system.*` procedures
  * on. Every operation the Scala API offers is callable from pure
  * SQL: compaction (plain or clustered, always through the
  * DISTRIBUTED one-task-per-bin path — a SQL shell has a live
  * session), snapshot retention, tagging, DESCRIBE HISTORY, and the
  * dead-row ledger. Each call returns its result as rows (a
  * [[LocalScan]]), so `CALL` composes with the rest of SQL tooling:
  * the output of a maintenance run is a query result, not a log
  * line. */
private[sources] object GraftProcedures {
  val Namespace: Array[String] = Array("system")

  private def param(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def paramDefault(name: String, dt: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private def str(r: InternalRow, i: Int): String =
    r.getUTF8String(i).toString

  /** One finished result as a scan: rows are computed eagerly inside
    * `call` (procedures are driver-side by contract). */
  private final class ResultScan(schema: StructType,
      data: Seq[InternalRow]) extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = data.toArray
  }

  private def result(schema: StructType,
      data: Seq[InternalRow]): java.util.Iterator[Scan] =
    java.util.List.of[Scan](new ResultScan(schema, data)).iterator()

  private def utf(s: String): UTF8String = UTF8String.fromString(s)

  /** `'db.t'` (or `'t'`) relative to this catalog's root. Segments
    * are validated before touching the filesystem: empty, `.`, `..`,
    * and separator-bearing segments are refused, and the resolved
    * path is re-checked to sit under the catalog root — a
    * `CALL cat.system.optimize('../other/t', …)` must not run
    * maintenance outside the catalog it was addressed to. */
  private def tableDir(root: Path, table: String): Path = {
    val segs = table.split('.')
    require(segs.nonEmpty && segs.forall(s =>
        s.nonEmpty && s != "." && s != ".." &&
          !s.contains('/') && !s.contains('\\')),
      s"graft catalog: malformed table name '$table' — segments must " +
        "be non-empty and free of '.', '..', and path separators")
    val dir = segs.foldLeft(root)(_.resolve(_)).normalize()
    require(dir.startsWith(root.normalize()),
      s"graft catalog: table '$table' escapes the catalog root $root")
    require(java.nio.file.Files.exists(dir.resolve("schema.json")),
      s"graft catalog: no such table '$table' under $root")
    dir
  }

  private abstract class GraftProcedure(procName: String,
      procDescription: String) extends UnboundProcedure
    with BoundProcedure {
    override def name(): String = procName
    override def description(): String = procDescription
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
  }

  def procedure(root: Path, name: String): Option[UnboundProcedure] =
    name match {
      case "optimize" => Some(new GraftProcedure("optimize",
        "bin-pack (or range-cluster with sort_col, or Morton-cluster " +
          "with comma-separated zorder_cols) small group files; " +
          "distributed — one Spark task per bin") {
        override def parameters(): Array[ProcedureParameter] = Array(
          param("table", StringType),
          param("target_rows", LongType),
          paramDefault("sort_col", StringType, "NULL"),
          paramDefault("zorder_cols", StringType, "NULL"))
        private val schema = StructType(Seq(
          StructField("removed_files", LongType, nullable = false),
          StructField("added_files", LongType, nullable = false),
          StructField("version", LongType, nullable = false)))
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val dir = tableDir(root, str(input, 0))
          val sortCol =
            if (input.isNullAt(2)) None else Some(str(input, 2))
          val zorderCols =
            if (input.isNullAt(3)) Nil
            else str(input, 3).split(',').map(_.trim)
              .filter(_.nonEmpty).toSeq
          val res = GraftCatalog.optimizeTable(
            org.apache.spark.sql.SparkSession.active, dir,
            input.getLong(1), sortCol, zorderCols)
          result(schema, Seq(InternalRow(
            res.removedFiles.size.toLong, res.addedFiles.size.toLong,
            res.version)))
        }
      })
      case "expire_snapshots" => Some(new GraftProcedure(
        "expire_snapshots",
        "retire all but the newest retain_last versions (tagged " +
          "versions pinned), vacuum unreferenced files older than " +
          "grace_ms") {
        override def parameters(): Array[ProcedureParameter] = Array(
          param("table", StringType),
          param("retain_last", LongType),
          paramDefault("grace_ms", LongType, "600000"))
        private val schema = StructType(Seq(
          StructField("expired_versions", LongType, nullable = false),
          StructField("deleted_files", LongType, nullable = false),
          StructField("retained_versions", LongType, nullable = false)))
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val res = GraftCatalog.expireSnapshots(
            tableDir(root, str(input, 0)), input.getLong(1).toInt,
            input.getLong(2))
          result(schema, Seq(InternalRow(
            res.expiredVersions.size.toLong,
            res.deletedDataFiles.size.toLong,
            res.retainedVersions.size.toLong)))
        }
      })
      case "evolve_partition" => Some(new GraftProcedure(
        "evolve_partition",
        "change the partition column (NULL drops partitioning) for " +
          "writes from now on; existing files keep their era's " +
          "layout — no rewrite") {
        override def parameters(): Array[ProcedureParameter] = Array(
          param("table", StringType),
          paramDefault("col", StringType, "NULL"))
        private val schema = StructType(Seq(
          StructField("era", LongType, nullable = false),
          StructField("col", StringType, nullable = true)))
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val col = if (input.isNullAt(1)) None else Some(str(input, 1))
          val era = GraftCatalog.evolvePartition(
            tableDir(root, str(input, 0)), col)
          result(schema, Seq(InternalRow(era,
            col.map(utf).orNull)))
        }
      })
      case "create_branch" => Some(new GraftProcedure("create_branch",
        "fork a WRITABLE branch at the current version (write-audit-" +
          "publish); address it as db.`t$branch$<name>`") {
        override def parameters(): Array[ProcedureParameter] = Array(
          param("table", StringType),
          param("branch", StringType))
        private val schema = StructType(Seq(
          StructField("branch", StringType, nullable = false),
          StructField("fork_version", LongType, nullable = false)))
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val b = str(input, 1)
          val fork = GraftCatalog.createBranch(
            tableDir(root, str(input, 0)), b)
          result(schema, Seq(InternalRow(utf(b), fork)))
        }
      })
      case "publish_branch" => Some(new GraftProcedure("publish_branch",
        "fast-forward main to the branch head in one atomic publish; " +
          "refuses if main moved since the fork (the audit would be " +
          "stale)") {
        override def parameters(): Array[ProcedureParameter] = Array(
          param("table", StringType),
          param("branch", StringType))
        private val schema = StructType(Seq(
          StructField("branch", StringType, nullable = false),
          StructField("version", LongType, nullable = false)))
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val b = str(input, 1)
          val v = GraftCatalog.publishBranch(
            tableDir(root, str(input, 0)), b)
          result(schema, Seq(InternalRow(utf(b), v)))
        }
      })
      case "tag_snapshot" => Some(new GraftProcedure("tag_snapshot",
        "pin a committed version under an immutable name (resolvable " +
          "via VERSION AS OF, exempt from retention)") {
        override def parameters(): Array[ProcedureParameter] = Array(
          param("table", StringType),
          param("tag", StringType),
          param("version", LongType))
        private val schema = StructType(Seq(
          StructField("tag", StringType, nullable = false),
          StructField("version", LongType, nullable = false)))
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val (tag, v) = (str(input, 1), input.getLong(2))
          GraftCatalog.tagSnapshot(tableDir(root, str(input, 0)), tag, v)
          result(schema, Seq(InternalRow(utf(tag), v)))
        }
      })
      case "history" => Some(new GraftProcedure("history",
        "one audit row per retained version: commit shape, explicit " +
          "commit time, file deltas, streaming txn marker") {
        override def parameters(): Array[ProcedureParameter] =
          Array(param("table", StringType))
        private val schema = StructType(Seq(
          StructField("version", LongType, nullable = false),
          StructField("commit_time_ms", LongType, nullable = false),
          StructField("operation", StringType, nullable = false),
          StructField("files_added", LongType, nullable = false),
          StructField("files_removed", LongType, nullable = false),
          StructField("txn", StringType, nullable = true)))
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val h = GraftCatalog.history(tableDir(root, str(input, 0)))
          result(schema, h.map(e => InternalRow(e.version,
            e.commitTimeMillis, utf(e.operation), e.filesAdded.toLong,
            e.filesRemoved.toLong, e.txn.map(utf).orNull)))
        }
      })
      case "dead_rows" => Some(new GraftProcedure("dead_rows",
        "per-group occupancy of the current version: total vs live " +
          "rows (deletion-vector read amplification), manifest-only") {
        override def parameters(): Array[ProcedureParameter] =
          Array(param("table", StringType))
        private val schema = StructType(Seq(
          StructField("file", StringType, nullable = false),
          StructField("rows", LongType, nullable = false),
          StructField("live_rows", LongType, nullable = false)))
        override def call(input: InternalRow)
            : java.util.Iterator[Scan] = {
          val dir = tableDir(root, str(input, 0))
          val files = GraftRl.readManifest(dir,
            GraftRl.currentVersion(dir)).getOrElse(Seq.empty)
          result(schema, files.map(g =>
            InternalRow(utf(g.name), g.rows, g.liveRows)))
        }
      })
      case _ => None
    }

  val names: Seq[String] = Seq("optimize", "expire_snapshots",
    "evolve_partition", "create_branch", "publish_branch",
    "tag_snapshot", "history", "dead_rows")
}
