package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{Filter => SFilter}
import org.apache.spark.sql.{sources => sf}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.sql.catalog.<name> = graft.sources.GraftCatalog` — a
  * filesystem-backed DataSourceV2 [[TableCatalog]] whose tables
  * support the FULL SQL DML surface, including ROW-LEVEL OPERATIONS
  * (`DELETE FROM` / `UPDATE` / `MERGE INTO`) via
  * [[SupportsRowLevelOperations]] in the COPY-ON-WRITE (group-based)
  * style with FILE-KEYED GROUPS: a table is a set of immutable
  * `data-*.tsv` group files bound together by a versioned MANIFEST,
  * Catalyst's RewriteDelete/RewriteUpdate/RewriteMergeIntoTable plans
  * compute the post-operation content of the groups the operation's
  * scan READ, and the commit replaces exactly those files in the next
  * manifest — untouched groups are never rewritten and never even
  * opened. Two independent pruning layers keep "touched" small:
  *
  *   - STATIC: each manifest line carries per-file min/max stats for
  *     every BIGINT column; the command condition is pushed into the
  *     row-level scan (Spark's GroupBasedRowLevelOperationScanPlanning
  *     → `SupportsPushDownFilters`) and files whose stats prove no row
  *     can match are dropped before any I/O. The pushdown is INEXACT
  *     (all filters are returned as residual), so surviving groups
  *     still stream every row into the rewrite — the COW contract.
  *   - RUNTIME: the scan exposes the `_file` METADATA COLUMN
  *     ([[SupportsMetadataColumns]]) and implements
  *     [[SupportsRuntimeV2Filtering]] on it, so Spark's
  *     RowLevelOperationRuntimeGroupFiltering rule narrows a MERGE
  *     (whose ON condition references the source and cannot be pushed
  *     statically) to the groups that actually contain matches via a
  *     dynamic IN-subquery over `_file`.
  *
  * Scans plan ONE InputPartition PER GROUP FILE, so reads of a
  * many-group table are parallel — the geometry that holds at 100 TB,
  * where a MERGE touching one hot partition must not rewrite (or
  * serially re-scan) the other thousand.
  *
  * CONCURRENCY: commits are optimistic. A writer publishes version
  * `n+1` by writing a temp manifest and hard-linking it to
  * `v<n+1>.manifest` — creation is atomic-exclusive on POSIX, so of
  * two racing commits exactly one wins. INSERT appends REBASE onto
  * the winner and retry (appends commute); row-level operations and
  * overwrites ABORT loudly (their result was computed against a
  * snapshot the winner invalidated) and delete their staged files —
  * no committed row is ever silently lost to a last-write-wins race.
  *
  * TIME TRAVEL (`SELECT … VERSION AS OF n`): version n IS manifest n —
  * data files are immutable, so every historical version stays
  * bit-stable and readable for free until
  * [[GraftCatalog.expireSnapshots]] retires it (retain-last-N; an
  * expired version refuses loudly, live versions are untouched, and
  * data files referenced by no surviving manifest are vacuumed).
  * Versioned loads are read-only: DML against a snapshot refuses.
  *
  * Layout: `<root>/<ns…>/<table>/schema.json` (Spark StructType JSON),
  * `v<NNNNN>.manifest` (one per commit; `file \t rows \t stats` lines),
  * `data-*.tsv` (tab-separated; `\t \n \r \\` escaped, `\N` is NULL).
  * Long/Double/String columns (the DML battery's domain); anything
  * else is refused at CREATE. Same shared-filesystem contract as
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

  private def readSchema(dir: Path, ident: Identifier): StructType = {
    val schemaFile = dir.resolve("schema.json")
    if (!Files.exists(schemaFile))
      throw new NoSuchTableException(ident)
    DataType.fromJson(Files.readString(schemaFile)).asInstanceOf[StructType]
  }

  private def readPartCol(dir: Path): Option[String] = {
    val p = dir.resolve("partcol")
    if (Files.exists(p)) Some(Files.readString(p).trim) else None
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = tableDir(ident)
    val schema = readSchema(dir, ident)
    val cur = GraftRl.currentVersion(dir)
    val files = GraftRl.readManifest(dir, cur).getOrElse(
      throw new IllegalStateException(
        s"graft catalog: ${ident.toString} current manifest v$cur unreadable"))
    new GraftRlTable(ident.toString, dir, schema, cur, files,
      writable = true, partCol = readPartCol(dir))
  }

  /** Version n is manifest n — immutable data files make every
    * retained snapshot bit-stable history. Distinguishes loudly
    * between a version that never existed (> current) and one retired
    * by [[GraftCatalog.expireSnapshots]]. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    val schema = readSchema(dir, ident)
    val v = try version.trim.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"graft catalog: VERSION AS OF expects an integer, got '$version'")
      }
    val cur = GraftRl.currentVersion(dir)
    if (v < 0 || v > cur)
      throw new IllegalArgumentException(
        s"graft catalog: ${ident.toString} has no version $v " +
          s"(current is $cur)")
    val files = GraftRl.readManifest(dir, v).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog: ${ident.toString} version $v has been expired " +
          "by snapshot retention and is no longer addressable"))
    new GraftRlTable(s"${ident.toString}@v$v", dir, schema, v, files,
      writable = false, partCol = readPartCol(dir))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // PARTITIONED BY (col): at most one IDENTITY transform on a
    // BIGINT column — each partition value becomes its own group
    // file(s), making partition-keyed DML metadata-only and scans
    // key-grouped by construction
    val partCol = partitions.toSeq match {
      case Seq() => None
      case Seq(t) =>
        val refs = t.references()
        require(t.name() == "identity" && refs.length == 1 &&
          refs(0).fieldNames().length == 1,
          s"graft catalog: only identity(<column>) partitioning is " +
            s"supported, got $t")
        val c = refs(0).fieldNames()(0)
        require(schema.fields.exists(f => f.name == c &&
          f.dataType == LongType),
          s"graft catalog: partition column '$c' must be a BIGINT " +
            "table column")
        Some(c)
      case many => throw new IllegalArgumentException(
        s"graft catalog: at most one partition transform, got $many")
    }
    schema.fields.foreach(f => require(
      f.dataType == LongType || f.dataType == StringType ||
        f.dataType == DoubleType,
      s"graft catalog: unsupported column type ${f.dataType.simpleString}"))
    require(!schema.fieldNames.contains("_file"),
      "graft catalog: column name _file is reserved for file provenance")
    val dir = tableDir(ident)
    if (Files.exists(dir.resolve("schema.json")))
      throw new TableAlreadyExistsException(
        ident.namespace().toSeq :+ ident.name())
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("schema.json"), schema.json)
    partCol.foreach(c => Files.writeString(dir.resolve("partcol"), c))
    require(GraftRl.publish(dir, 0L, ""),
      s"graft catalog: concurrent CREATE of ${ident.toString}")
    new GraftRlTable(ident.toString, dir, schema, 0L, Seq.empty,
      writable = true, partCol = partCol)
  }

  /** SCHEMA EVOLUTION — `ALTER TABLE … ADD COLUMNS`, the
    * schema-on-read half every production table format ships: the new
    * column appends to the schema, existing group files are NEVER
    * rewritten (their rows read the column as NULL, and the stats
    * accessors know the null count exactly — metadata-only COUNT over
    * an added column stays answerable), and only appending nullable
    * BIGINT/DOUBLE/STRING columns at the end is allowed — anything
    * needing a data rewrite or a position shuffle refuses loudly.
    * Time travel reads historic versions through the CURRENT schema
    * (added columns null), the Delta-style convention. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = tableDir(ident)
    val schema = readSchema(dir, ident)
    val newSchema = changes.foldLeft(schema) { (sch, ch) =>
      ch match {
        case a: TableChange.AddColumn =>
          require(a.fieldNames().length == 1,
            "graft catalog: nested columns not supported")
          val n = a.fieldNames()(0)
          require(!sch.fieldNames.contains(n) && n != "_file",
            s"graft catalog: column '$n' already exists or is reserved")
          require(a.isNullable,
            "graft catalog: added columns must be nullable — existing " +
              "rows read them as NULL")
          require(a.position() == null,
            "graft catalog: added columns append at the end (a " +
              "position shuffle would rewrite every file)")
          require(a.defaultValue() == null,
            "graft catalog: DEFAULT values not supported")
          require(a.dataType() == LongType ||
            a.dataType() == DoubleType || a.dataType() == StringType,
            s"graft catalog: unsupported column type " +
              s"${a.dataType().simpleString}")
          sch.add(StructField(n, a.dataType(), nullable = true))
        case other => throw new UnsupportedOperationException(
          s"graft catalog: unsupported ALTER TABLE change $other " +
            "(only ADD COLUMNS)")
      }
    }
    val tmp = dir.resolve(s".schema-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, newSchema.json)
    Files.move(tmp, dir.resolve("schema.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    loadTable(ident)
  }

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

object GraftCatalog {
  /** Result of [[expireSnapshots]]: which manifest versions were
    * retired, which now-unreferenced data files were vacuumed, and
    * which versions remain addressable. */
  final case class ExpireResult(expiredVersions: Seq[Long],
      deletedDataFiles: Seq[String], retainedVersions: Seq[Long])

  /** SNAPSHOT RETENTION — the maintenance half every table format
    * pairs with time travel: retire all but the newest `retainLast`
    * manifest versions, then vacuum data files referenced by no
    * surviving manifest. Live versions are untouched (immutable files,
    * bit-stable before/after); an expired `VERSION AS OF` refuses
    * loudly at load. CAVEAT (shared with every vacuum from Delta to
    * Iceberg): must not run concurrently with an in-flight writer,
    * whose staged-but-uncommitted files look unreferenced. */
  def expireSnapshots(tableDir: Path, retainLast: Int): ExpireResult = {
    require(retainLast >= 1,
      s"graft catalog: retainLast must be >= 1, got $retainLast")
    val versions = GraftRl.manifestVersions(tableDir)
    require(versions.nonEmpty,
      s"graft catalog: $tableDir has no manifests (not a table?)")
    val cur = versions.max
    val (keep, expire) = versions.sorted.partition(_ > cur - retainLast)
    expire.foreach(v => Files.delete(GraftRl.manifestPath(tableDir, v)))
    val live: Set[String] = keep.flatMap(v =>
      GraftRl.readManifest(tableDir, v).getOrElse(Seq.empty))
      .map(_.name).toSet
    val dead = Option(tableDir.toFile.listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .filter(n => n.startsWith("data-") && n.endsWith(".tsv") &&
        !live.contains(n))
      .sorted.toSeq
    dead.foreach(n => Files.delete(tableDir.resolve(n)))
    ExpireResult(expire, dead, keep)
  }
}

/** Driver-side fault-injection seam for the concurrency specs: runs
  * immediately before a commit's first publish attempt so a test can
  * interleave a competing writer at exactly the racy instant.
  * No-ops in production. */
private[sources] object GraftRlConcurrencyHook {
  @volatile var beforeReplacePublish: () => Unit = () => ()
  @volatile var beforeAppendPublish: () => Unit = () => ()
}

/** Manifest + group-file model: a table version is the list of
  * immutable group files named by `v<NNNNN>.manifest`, one line per
  * group — `<file> \t <rows> \t <stats>` where stats is a
  * comma-joined per-column token: `lo:hi:nulls` (decimal) for a
  * BIGINT column with at least one non-null value, `N:nulls` for an
  * all-null BIGINT column, `-` otherwise (non-BIGINT, or a legacy
  * `lo:hi` token without a null count). The stats power static group
  * pruning, metadata-only COUNT/MIN/MAX, and metadata-only DELETE;
  * they are advisory for pruning (an unknown token just means
  * "cannot prune") and LOAD-BEARING only where a proof is required —
  * there an unknown token makes the fast path refuse, never lie. */
private[sources] object GraftRl {
  final case class GroupFile(name: String, rows: Long, statsToken: String) {
    private lazy val tokens: Array[String] = statsToken.split(",", -1)
    /** number of columns this file was WRITTEN with (one stats token
      * per column) — smaller than the current schema after an ALTER
      * TABLE ADD COLUMNS; the missing trailing columns of every row
      * read as NULL, which the stats accessors below KNOW exactly */
    lazy val width: Int = tokens.length
    /** column index → (min, max) over NON-NULL values */
    lazy val longStats: Map[Int, (Long, Long)] =
      tokens.zipWithIndex.collect {
        case (tok, i) if tok.nonEmpty && tok != "-" &&
            !tok.startsWith("N:") =>
          val parts = tok.split(":", 3)
          i -> (parts(0).toLong, parts(1).toLong)
      }.toMap
    /** column index → null count; absent when unknown (legacy token
      * or non-BIGINT column) */
    lazy val longNulls: Map[Int, Long] =
      tokens.zipWithIndex.collect {
        case (tok, i) if tok.startsWith("N:") =>
          i -> tok.stripPrefix("N:").toLong
        case (tok, i) if tok.nonEmpty && tok != "-" &&
            tok.count(_ == ':') == 2 =>
          i -> tok.split(":", 3)(2).toLong
      }.toMap
    /** Schema-evolution-aware accessors: a column the file predates
      * is all-NULL by construction, so its range is empty and its
      * null count equals the row count — exact knowledge, not a
      * refused proof. */
    def statsFor(i: Int): Option[(Long, Long)] =
      if (i >= width) None else longStats.get(i)
    def nullsFor(i: Int): Option[Long] =
      if (i >= width) Some(rows) else longNulls.get(i)
    def manifestLine: String = s"$name\t$rows\t$statsToken"
  }

  def manifestPath(dir: Path, v: Long): Path =
    dir.resolve(f"v$v%05d.manifest")

  def manifestVersions(dir: Path): Seq[Long] =
    Option(dir.toFile.listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong
      }.sorted.toSeq

  def currentVersion(dir: Path): Long = {
    val vs = manifestVersions(dir)
    require(vs.nonEmpty, s"graft catalog: no manifests in $dir — corrupt " +
      "table (create writes v00000.manifest)")
    vs.max
  }

  def readManifest(dir: Path, v: Long): Option[Seq[GroupFile]] = {
    val p = manifestPath(dir, v)
    if (!Files.exists(p)) None
    else Some(Files.readString(p).split("\n", -1).toSeq
      .filter(_.nonEmpty).map { line =>
        val parts = line.split("\t", -1)
        require(parts.length == 3,
          s"graft catalog: malformed manifest line '$line' in $p")
        GroupFile(parts(0), parts(1).toLong, parts(2))
      })
  }

  /** Atomic-exclusive manifest publish (the commit's linearization
    * point): write a temp file, HARD-LINK it to the versioned name —
    * link creation is atomic and fails if the target exists, so of
    * two racing commits to the same version exactly one wins. Returns
    * whether this writer won. */
  def publish(dir: Path, v: Long, content: String): Boolean = {
    val target = manifestPath(dir, v)
    if (Files.exists(target)) return false
    val tmp = dir.resolve(s".manifest-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, content)
    try { Files.createLink(target, tmp); true }
    catch { case _: FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  def render(files: Seq[GroupFile]): String =
    if (files.isEmpty) "" else files.map(_.manifestLine).mkString("", "\n", "\n")

  /** Conservative may-this-file-contain-a-match test against per-file
    * BIGINT min/max stats. Returns true ("keep") on anything it cannot
    * prove — non-long columns, null-sensitive predicates, unknown
    * filter shapes — so pruning is always sound, never load-bearing. */
  def mightMatch(gf: GroupFile, longIdx: Map[String, Int],
      filter: SFilter): Boolean = {
    def rng(attr: String): Option[(Long, Long)] =
      longIdx.get(attr).flatMap(gf.statsFor)
    def num(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
    filter match {
      case sf.EqualTo(a, v) =>
        (rng(a), num(v)) match {
          case (Some((lo, hi)), Some(x)) => x >= lo && x <= hi
          case _ => true
        }
      case sf.EqualNullSafe(a, v) if v != null =>
        mightMatch(gf, longIdx, sf.EqualTo(a, v))
      case sf.GreaterThan(a, v) =>
        (rng(a), num(v)) match {
          case (Some((_, hi)), Some(x)) => hi > x
          case _ => true
        }
      case sf.GreaterThanOrEqual(a, v) =>
        (rng(a), num(v)) match {
          case (Some((_, hi)), Some(x)) => hi >= x
          case _ => true
        }
      case sf.LessThan(a, v) =>
        (rng(a), num(v)) match {
          case (Some((lo, _)), Some(x)) => lo < x
          case _ => true
        }
      case sf.LessThanOrEqual(a, v) =>
        (rng(a), num(v)) match {
          case (Some((lo, _)), Some(x)) => lo <= x
          case _ => true
        }
      case sf.In(a, vs) =>
        rng(a) match {
          case Some((lo, hi)) => vs.exists(v => num(v) match {
            case Some(x) => x >= lo && x <= hi
            case None => true
          })
          case None => true
        }
      case sf.And(l, r) =>
        mightMatch(gf, longIdx, l) && mightMatch(gf, longIdx, r)
      case sf.Or(l, r) =>
        mightMatch(gf, longIdx, l) || mightMatch(gf, longIdx, r)
      case _ => true
    }
  }

  /** Writes to a partitioned table declare
    * [[org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering]]
    * clustered on the partition column: Spark shuffles the incoming
    * rows so each task sees whole partition values, keeping the
    * file-per-value layout tight instead of scattering every value
    * across every task's output file. */
  def maybeClustered(partCol: Option[String],
      bw: BatchWrite): Write = partCol match {
    case Some(c) =>
      new Write with org.apache.spark.sql.connector.write
        .RequiresDistributionAndOrdering {
        override def toBatch: BatchWrite = bw
        override def requiredDistribution()
            : org.apache.spark.sql.connector.distributions.Distribution =
          org.apache.spark.sql.connector.distributions.Distributions
            .clustered(Array(Expressions.identity(c)))
        override def requiredOrdering()
            : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          Array.empty
      }
    case None => new Write { override def toBatch: BatchWrite = bw }
  }

  /** The single partition value of a file on column `i`, when
    * provable: `Some(Some(v))` (constant non-null v, no nulls),
    * `Some(None)` (all-null), `None` (mixed or unknown — the file
    * does not respect the partition layout, so scans degrade to
    * per-file partitions and no key grouping is claimed). */
  def partValueOf(gf: GroupFile, i: Int): Option[Option[Long]] =
    gf.statsFor(i) match {
      case Some((lo, hi)) if lo == hi &&
          gf.nullsFor(i).contains(0L) => Some(Some(lo))
      case None if gf.rows > 0L &&
          gf.nullsFor(i).contains(gf.rows) => Some(None)
      case _ => None
    }

  /** Tri-state per-file predicate coverage — the proof engine behind
    * METADATA-ONLY DELETE: `AllRows` means every row of the file
    * provably satisfies the predicate (drop the whole file from the
    * manifest, zero data I/O), `NoRows` means provably none does
    * (keep untouched), `SomeRows` means unprovable either way (the
    * caller must fall back to the copy-on-write rewrite). SQL null
    * semantics are honored: a NULL predicate keeps its row, so an
    * all-match proof additionally requires a ZERO null count on every
    * referenced column — a legacy stats token without null counts can
    * prove NoRows but never AllRows. Everything unrecognized
    * degrades to SomeRows: the fast path may refuse, never lie. */
  sealed trait Coverage
  case object AllRows extends Coverage
  case object NoRows extends Coverage
  case object SomeRows extends Coverage

  def deleteCoverage(gf: GroupFile, longIdx: Map[String, Int],
      p: Predicate): Coverage = {
    import org.apache.spark.sql.connector.expressions.{Expression => VExpr, Literal => VLit, NamedReference}
    def refCol(e: VExpr): Option[Int] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        longIdx.get(r.fieldNames()(0))
      case _ => None
    }
    def litLong(e: VExpr): Option[Long] = e match {
      case l: VLit[_] => l.value match {
        case v: java.lang.Long => Some(v)
        case v: java.lang.Integer => Some(v.toLong)
        case v: java.lang.Short => Some(v.toLong)
        case v: java.lang.Byte => Some(v.toLong)
        case _ => None
      }
      case _ => None
    }
    /** (allNonNull, noneNonNull) for `col <op> v` over the file's
      * non-null domain [lo, hi]; vacuous (true, true) when the file
      * has no non-null values in the column. */
    def cmp(op: String, i: Int, v: Long): Option[(Boolean, Boolean)] =
      gf.statsFor(i) match {
        case None if gf.nullsFor(i).contains(gf.rows) =>
          Some((true, true)) // all-null column: no non-null rows exist
        case None => None // legacy/unknown stats: no proof either way
        case Some((lo, hi)) => op match {
          case "=" => Some((lo == v && hi == v, v < lo || v > hi))
          case "<=>" => Some((lo == v && hi == v, v < lo || v > hi))
          case "<" => Some((hi < v, lo >= v))
          case "<=" => Some((hi <= v, lo > v))
          case ">" => Some((lo > v, hi <= v))
          case ">=" => Some((lo >= v, hi < v))
          case "<>" => Some((v < lo || v > hi, lo == v && hi == v))
          case _ => None
        }
      }
    def nullsKnownZero(i: Int): Boolean = gf.nullsFor(i).contains(0L)
    // NULL comparisons are never TRUE (<=> against a non-null literal
    // included): nulls count toward "none", and they break an "all"
    // proof unless the null count is known to be zero
    def fromNonNull(i: Int, an: Boolean, nn: Boolean,
        nullSafe: Boolean): Coverage =
      if (nn) NoRows
      else if (an && nullsKnownZero(i)) AllRows
      else SomeRows
    def eval(pred: Predicate): Coverage = pred match {
      case a: org.apache.spark.sql.connector.expressions.filter.And =>
        (eval(a.left()), eval(a.right())) match {
          case (AllRows, AllRows) => AllRows
          case (NoRows, _) | (_, NoRows) => NoRows
          case _ => SomeRows
        }
      case o: org.apache.spark.sql.connector.expressions.filter.Or =>
        (eval(o.left()), eval(o.right())) match {
          case (NoRows, NoRows) => NoRows
          case (AllRows, _) | (_, AllRows) => AllRows
          case _ => SomeRows
        }
      case _ => pred.name() match {
        case "ALWAYS_TRUE" => AllRows
        case "ALWAYS_FALSE" => NoRows
        case "IS_NULL" =>
          refCol(pred.children()(0)).flatMap(i =>
            gf.nullsFor(i).map(n =>
              if (n == gf.rows) AllRows
              else if (n == 0L) NoRows else SomeRows))
            .getOrElse(SomeRows)
        case "IS_NOT_NULL" =>
          refCol(pred.children()(0)).flatMap(i =>
            gf.nullsFor(i).map(n =>
              if (n == 0L) AllRows
              else if (n == gf.rows) NoRows else SomeRows))
            .getOrElse(SomeRows)
        case op @ ("=" | "<=>" | "<" | "<=" | ">" | ">=" | "<>") =>
          val ch = pred.children()
          if (ch.length != 2) SomeRows
          else {
            val direct = for {
              i <- refCol(ch(0)); v <- litLong(ch(1))
              r <- cmp(op, i, v)
            } yield (i, r)
            val flippedOp = op match {
              case "<" => ">" case "<=" => ">="
              case ">" => "<" case ">=" => "<=" case other => other
            }
            val flipped = for {
              i <- refCol(ch(1)); v <- litLong(ch(0))
              r <- cmp(flippedOp, i, v)
            } yield (i, r)
            direct.orElse(flipped) match {
              case Some((i, (an, nn))) =>
                fromNonNull(i, an, nn, nullSafe = op == "<=>")
              case None => SomeRows
            }
          }
        case "IN" =>
          val ch = pred.children()
          refCol(ch.head) match {
            case Some(i) =>
              val vs = ch.tail.flatMap(litLong)
              if (vs.length != ch.length - 1) SomeRows
              else {
                val per = vs.map(v => cmp("=", i, v))
                if (per.exists(_.isEmpty)) SomeRows
                else {
                  val covs = per.flatten
                  if (covs.forall(_._2)) NoRows // no value can match
                  else if (covs.exists(_._1) && nullsKnownZero(i))
                    AllRows // one value covers the whole file
                  else SomeRows
                }
              }
            case None => SomeRows
          }
        case _ => SomeRows
      }
    }
    if (gf.rows == 0L) NoRows else eval(p)
  }

  /** Extract the group names admitted by a runtime `_file IN (...)` /
    * `_file = ...` predicate; None when the predicate is not a
    * recognizable `_file` restriction (then it must be ignored — a
    * misread runtime filter would corrupt the replaced-group set). */
  def fileInValues(p: Predicate): Option[Set[String]] = {
    def litString(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        l.value match {
        case u: UTF8String => Some(u.toString)
        case s: String => Some(s)
        case _ => None
      }
      case _ => None
    }
    val ch = p.children()
    val onFile = ch.headOption.exists {
      case r: NamedReference => r.fieldNames().sameElements(Array("_file"))
      case _ => false
    }
    if (!onFile) None
    else p.name() match {
      case "IN" | "=" =>
        val vals = ch.tail.flatMap(litString)
        if (vals.length == ch.length - 1) Some(vals.toSet) else None
      case _ => None
    }
  }
}

private[sources] object GraftRlTable {
  /** TSV escaping: `\t`, `\n`, `\r`, `\\`; NULL is the bare token
    * `\N`. `\r` matters because `Files.lines` treats a lone carriage
    * return as a line terminator — unescaped it would split one
    * stored string into two file lines (silent row duplication for a
    * single-string-column table). */
  def escape(s: String): String = {
    val b = new StringBuilder(s.length)
    s.foreach {
      case '\t' => b.append("\\t")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
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
          case 'r' => b.append('\r'); i += 2
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

  def lineToValues(line: String, schema: StructType): Array[Any] =
    lineToValues(line, schema, schema.fields.length)

  /** `width` is the column count the file was written with: rows from
    * files predating an ADD COLUMN carry fewer fields, and the
    * missing trailing columns read as NULL (schema-on-read, the
    * null-fill every production table format does). */
  def lineToValues(line: String, schema: StructType,
      width: Int): Array[Any] = {
    val parts = line.split("\t", -1)
    require(parts.length == width && width <= schema.fields.length,
      s"graft catalog: malformed row '$line' (expected $width fields)")
    schema.fields.indices.map { i =>
      if (i >= width) null
      else {
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
      }
    }.toArray
  }

  def lineToRow(line: String, schema: StructType): InternalRow =
    InternalRow(lineToValues(line, schema).toIndexedSeq: _*)
}

private[sources] class GraftRlTable(ident: String, dir: Path,
    tableSchema: StructType, version: Long,
    files: Seq[GraftRl.GroupFile], writable: Boolean,
    partCol: Option[String] = None)
  extends Table with SupportsRead with SupportsWrite
  with SupportsRowLevelOperations with SupportsMetadataColumns
  with org.apache.spark.sql.connector.catalog.SupportsDeleteV2 {

  private def partIdx: Option[Int] = partCol.map(tableSchema.fieldIndex)

  /** `PARTITIONED BY (identity(col))` — reported back to Spark so
    * SHOW CREATE / catalog introspection see the layout, and the
    * scan's KeyGroupedPartitioning claim has a declared source. */
  override def partitioning(): Array[Transform] =
    partCol.map(c => Expressions.identity(c)).toArray

  private lazy val longIdx: Map[String, Int] =
    tableSchema.fields.zipWithIndex.collect {
      case (f, i) if f.dataType == LongType => f.name -> i
    }.toMap

  private def conjCoverage(gf: GraftRl.GroupFile,
      predicates: Array[Predicate]): GraftRl.Coverage =
    predicates.foldLeft(GraftRl.AllRows: GraftRl.Coverage) { (acc, p) =>
      (acc, GraftRl.deleteCoverage(gf, longIdx, p)) match {
        case (GraftRl.NoRows, _) | (_, GraftRl.NoRows) => GraftRl.NoRows
        case (GraftRl.AllRows, GraftRl.AllRows) => GraftRl.AllRows
        case _ => GraftRl.SomeRows
      }
    }

  /** METADATA-ONLY DELETE ([[SupportsDeleteV2]]): Spark's
    * OptimizeMetadataOnlyDeleteFromTable replaces the copy-on-write
    * rewrite with a pure manifest edit whenever every group file is
    * PROVABLY all-match (drop it) or none-match (keep it) under the
    * delete predicates — the per-file min/max/null-count stats are
    * the proof. Deleting an aligned key range from a 100 TB table
    * then costs zero data I/O: no scan, no rewrite, one manifest.
    * Any unprovable file makes canDeleteWhere refuse and the
    * row-level COW path runs instead — the fast path may refuse,
    * never lie. */
  override def canDeleteWhere(predicates: Array[Predicate]): Boolean =
    writable && files.forall(gf =>
      conjCoverage(gf, predicates) != GraftRl.SomeRows)

  override def deleteWhere(predicates: Array[Predicate]): Unit = {
    require(writable,
      s"graft catalog: $ident is a versioned snapshot and is read-only")
    val keep = files.filter(gf =>
      conjCoverage(gf, predicates) != GraftRl.AllRows)
    if (!GraftRl.publish(dir, version + 1, GraftRl.render(keep)))
      throw new java.util.ConcurrentModificationException(
        s"graft catalog: concurrent commit on $ident — metadata " +
          s"delete read snapshot v$version but v${version + 1} was " +
          "published by another writer; re-run the statement")
  }

  override def truncateTable(): Boolean = {
    require(writable,
      s"graft catalog: $ident is a versioned snapshot and is read-only")
    if (!GraftRl.publish(dir, version + 1, ""))
      throw new java.util.ConcurrentModificationException(
        s"graft catalog: concurrent commit on $ident during TRUNCATE")
    true
  }

  override def name(): String = ident
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    if (writable)
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
        TableCapability.MICRO_BATCH_READ)
    else java.util.EnumSet.of(TableCapability.BATCH_READ)

  /** `_file` — the group file a row lives in: file provenance as a
    * metadata column, and the attribute Spark's runtime group
    * filtering narrows row-level operations on (a MERGE's dynamic
    * `_file IN (subquery)` is what keeps a one-partition upsert from
    * rewriting the whole table). */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_file"
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String =
        "group file this row was read from"
    })

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRlScanBuilder(dir, tableSchema, files, None,
      partCol.map(c => (c, tableSchema.fieldIndex(c))), options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(writable,
      s"graft catalog: $ident is a versioned snapshot and is read-only")
    new GraftRlWriteBuilder(dir, tableSchema, info.schema(), partCol)
  }

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    require(writable,
      s"graft catalog: $ident is a versioned snapshot and is read-only")
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = new GraftRlOperation(
        dir, ident, tableSchema, version, files, info.command(), partCol)
    }
  }
}

/** One row-level statement = one instance: carries the snapshot it
  * operates on (base version + group files) and RECORDS which groups
  * its scan actually read — after static stats pruning and runtime
  * `_file` filtering — so the commit replaces exactly those files.
  * The runtime-group-filter subquery does NOT flow through here
  * (Spark rebuilds it against the original table), so the recording
  * is unambiguous. */
private[sources] class GraftRlOperation(dir: Path, ident: String,
    schema: StructType, baseVersion: Long,
    baseFiles: Seq[GraftRl.GroupFile],
    cmd: RowLevelOperation.Command,
    partCol: Option[String] = None) extends RowLevelOperation {

  @volatile private var scanned: Option[Seq[String]] = None
  def recordScanned(names: Seq[String]): Unit = scanned = Some(names)
  def scannedGroups: Option[Seq[String]] = scanned

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"graft-rl $cmd on $ident"

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRlScanBuilder(dir, schema, baseFiles, Some(this), None)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"graft catalog: replace-write schema " +
        s"${info.schema().simpleString} != table ${schema.simpleString}")
    new WriteBuilder {
      override def build(): Write = GraftRl.maybeClustered(partCol,
        new GraftRlReplaceWrite(dir, ident, schema, baseVersion,
          baseFiles, GraftRlOperation.this,
          partCol.map(schema.fieldIndex)))
    }
  }
}

/** Scan builder shared by plain reads and row-level operations:
  * column pruning (including the `_file` metadata column), and
  * INEXACT filter pushdown — pushed predicates prune GROUP FILES via
  * manifest min/max stats but are all returned as residual, so
  * surviving groups still yield every row (exactly the Parquet
  * row-group-stats discipline, and the only sound choice for a COW
  * scan whose unread groups are silently kept). */
private[sources] class GraftRlScanBuilder(dir: Path,
    tableSchema: StructType, files: Seq[GraftRl.GroupFile],
    op: Option[GraftRlOperation], partInfo: Option[(String, Int)],
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  private var required: StructType = tableSchema
  private var candidates: Seq[GraftRl.GroupFile] = files
  private var accepted: Array[SFilter] = Array.empty
  private var agg: Option[(StructType, Array[java.lang.Long])] = None
  private val longIdx: Map[String, Int] =
    tableSchema.fields.zipWithIndex.collect {
      case (f, i) if f.dataType == LongType => f.name -> i
    }.toMap

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[SFilter]): Array[SFilter] = {
    candidates = candidates.filter(gf =>
      filters.forall(f => GraftRl.mightMatch(gf, longIdx, f)))
    accepted = filters
    filters // ALL residual: stats pruning is inexact by design
  }
  override def pushedFilters(): Array[SFilter] = accepted

  /** METADATA-ONLY COUNT/MIN/MAX ([[SupportsPushDownAggregates]],
    * complete pushdown): an ungrouped COUNT(*) / MIN / MAX over
    * BIGINT columns is answered straight from the manifest — row
    * counts summed, per-file mins/maxs folded — so `SELECT count(*)`
    * on a 100 TB table reads ZERO data files (the Iceberg
    * metadata-table trick). Refused whenever a proof is impossible:
    * any filter present (rows would need scanning), a grouping, a
    * non-BIGINT column, or a file whose stats token predates null
    * counts. MIN/MAX ignore nulls by SQL semantics, so all-null
    * files simply contribute nothing. */
  override def supportCompletePushDown(
      aggregation: org.apache.spark.sql.connector.expressions
        .aggregate.Aggregation): Boolean =
    translateAgg(aggregation).isDefined

  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions
        .aggregate.Aggregation): Boolean = {
    agg = translateAgg(aggregation)
    agg.isDefined
  }

  private def translateAgg(
      aggregation: org.apache.spark.sql.connector.expressions
        .aggregate.Aggregation)
      : Option[(StructType, Array[java.lang.Long])] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (aggregation.groupByExpressions().nonEmpty) return None
    if (accepted.nonEmpty) return None // filtered: values need a scan
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[Int] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        longIdx.get(r.fieldNames()(0))
      case _ => None
    }
    // a file with rows but no usable stats for the column defeats the
    // proof; an all-null column (N: token) legitimately contributes
    // nothing to MIN/MAX
    def statsComplete(i: Int): Boolean = candidates.forall(gf =>
      gf.rows == 0L || gf.statsFor(i).isDefined ||
        gf.nullsFor(i).contains(gf.rows))
    val out = aggregation.aggregateExpressions().map {
      case _: CountStar =>
        Some((StructField("count_star", LongType, nullable = false),
          java.lang.Long.valueOf(candidates.map(_.rows).sum)))
      case c: Count if !c.isDistinct =>
        // COUNT(col) = rows minus nulls — needs a null count per file
        colOf(c.column()).filter(i => candidates.forall(gf =>
          gf.rows == 0L || gf.nullsFor(i).isDefined)).map { i =>
          val v = candidates.map(gf =>
            gf.rows - gf.nullsFor(i).getOrElse(0L)).sum
          (StructField(s"count_$i", LongType, nullable = false),
            java.lang.Long.valueOf(v))
        }
      case m: Min =>
        colOf(m.column()).filter(statsComplete).map { i =>
          val vs = candidates.flatMap(_.statsFor(i)).map(_._1)
          (StructField(s"min_$i", LongType, nullable = true),
            if (vs.isEmpty) null
            else java.lang.Long.valueOf(vs.min))
        }
      case m: Max =>
        colOf(m.column()).filter(statsComplete).map { i =>
          val vs = candidates.flatMap(_.statsFor(i)).map(_._2)
          (StructField(s"max_$i", LongType, nullable = true),
            if (vs.isEmpty) null
            else java.lang.Long.valueOf(vs.max))
        }
      case _ => None
    }
    if (out.exists(_.isEmpty)) None
    else Some((StructType(out.flatten.map(_._1)),
      out.flatten.map(_._2).toArray))
  }

  override def build(): Scan = agg match {
    case Some((schema, values)) => new GraftRlAggScan(dir, schema, values)
    case None => op match {
      case Some(o) =>
        new GraftRlRowLevelScan(dir, tableSchema, required, candidates, o)
      case None =>
        new GraftRlScan(dir, tableSchema, required, candidates, None,
          partInfo, options)
    }
  }
}

/** The manifest-answered aggregate scan: one partition, one row, the
  * values computed on the driver from stats — no data file is ever
  * opened. The description advertises the fast path so plan asserts
  * can pin it. */
private[sources] class GraftRlAggScan(dir: Path, aggSchema: StructType,
    values: Array[java.lang.Long]) extends Scan with Batch {
  override def readSchema(): StructType = aggSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-rl-agg $dir metadata-only " +
      s"[${aggSchema.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftRlAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val vals = p.asInstanceOf[GraftRlAggPartition].values
          private var served = false
          override def next(): Boolean =
            if (served) false else { served = true; true }
          override def get(): InternalRow = InternalRow(
            vals.map(v => if (v == null) null
              else java.lang.Long.valueOf(v.longValue())).toIndexedSeq: _*)
          override def close(): Unit = ()
        }
    }
}

private[sources] final case class GraftRlAggPartition(
    values: Array[java.lang.Long]) extends InputPartition

/** One InputPartition per group file — a table with N groups scans
  * with N-way parallelism (the single-task table scan was this
  * catalog's round-16 weakness). A PARTITIONED table goes further:
  * group files are bucketed by their provable partition value and the
  * scan reports `KeyGroupedPartitioning(identity(partCol))`
  * ([[SupportsReportPartitioning]]), so joins and aggregates keyed on
  * the partition column run with ZERO exchange under
  * `spark.sql.sources.v2.bucketing.enabled` — storage-partitioned
  * execution straight off the manifest. The claim degrades honestly:
  * a pruned-away partition column, an empty scan, or any file whose
  * stats cannot prove a single value (a pre-partitioning layout)
  * falls back to per-file UnknownPartitioning. */
private[sources] class GraftRlScan(dir: Path, tableSchema: StructType,
    required: StructType, initial: Seq[GraftRl.GroupFile],
    op: Option[GraftRlOperation],
    partInfo: Option[(String, Int)] = None,
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning {

  /** STREAMING READS (`spark.readStream.table(...)`): the manifest
    * version history IS a change log, so the table doubles as a
    * micro-batch source — see [[GraftRlChangeStream]]. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftRlChangeStream(dir, tableSchema, required, options)

  @volatile protected var kept: Seq[GraftRl.GroupFile] = initial

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-rl-table $dir groups=${kept.size} " +
      s"columns=[${required.fieldNames.mkString(",")}]"

  /** (nullKey?, key, files) per provable partition value — None when
    * key grouping cannot be claimed. */
  private def keyedGroups
      : Option[Seq[(Boolean, Long, Seq[GraftRl.GroupFile])]] =
    partInfo.flatMap { case (name, idx) =>
      if (!required.fieldNames.contains(name) || kept.isEmpty) None
      else {
        val vals = kept.map(f => GraftRl.partValueOf(f, idx))
        if (vals.contains(None)) None
        else Some(kept.zip(vals.map(_.get))
          .groupBy(_._2).toSeq
          .map { case (k, fs) =>
            (k.isEmpty, k.getOrElse(0L), fs.map(_._1)) }
          .sortBy { case (isNull, k, _) => (!isNull, k) })
      }
    }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    keyedGroups match {
      case Some(gs) =>
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(
            Array(Expressions.identity(partInfo.get._1)), gs.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(kept.size)
    }

  override def planInputPartitions(): Array[InputPartition] = {
    // the groups handed to Spark are BY CONTRACT the groups a
    // row-level commit replaces — record them on the operation
    op.foreach(_.recordScanned(kept.map(_.name)))
    keyedGroups match {
      case Some(gs) => gs.map { case (isNull, k, fs) =>
        GraftRlKeyedPartition(
          fs.map(f => dir.resolve(f.name).toString).toArray,
          fs.map(_.name).toArray, fs.map(_.width).toArray, isNull, k)
      }.toArray[InputPartition]
      case None => kept.map(f =>
        GraftRlPartition(Array(dir.resolve(f.name).toString),
          Array(f.name), Array(f.width))).toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRlReaderFactory(tableSchema, required)
}

/** The row-level variant adds runtime group filtering: Spark's
  * RowLevelOperationRuntimeGroupFiltering plans a `_file IN
  * (matching-groups subquery)` dynamic filter for conditions it
  * cannot push statically (a MERGE's ON references the source), and
  * this scan narrows its group list when that filter arrives. */
private[sources] class GraftRlRowLevelScan(dir: Path,
    tableSchema: StructType, required: StructType,
    initial: Seq[GraftRl.GroupFile], rlOp: GraftRlOperation)
  extends GraftRlScan(dir, tableSchema, required, initial, Some(rlOp))
  with SupportsRuntimeV2Filtering {

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("_file"))

  override def filter(predicates: Array[Predicate]): Unit = {
    predicates.foreach { p =>
      GraftRl.fileInValues(p).foreach { names =>
        kept = kept.filter(f => names.contains(f.name))
      }
    }
    // runtime filters may arrive after an initial planInputPartitions
    // — re-record so the commit replaces the narrowed set
    rlOp.recordScanned(kept.map(_.name))
  }
}

private[sources] sealed trait GraftRlFileSet {
  def paths: Array[String]
  def names: Array[String]
  def widths: Array[Int]
}

private[sources] final case class GraftRlPartition(
    paths: Array[String], names: Array[String], widths: Array[Int])
  extends InputPartition with GraftRlFileSet

/** A partition-value group: several files, one key — the
  * [[org.apache.spark.sql.connector.read.HasPartitionKey]] half of
  * the scan's KeyGroupedPartitioning claim. */
private[sources] final case class GraftRlKeyedPartition(
    paths: Array[String], names: Array[String], widths: Array[Int],
    keyIsNull: Boolean, key: Long)
  extends InputPartition with GraftRlFileSet
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(if (keyIsNull) null else java.lang.Long.valueOf(key))
}

private[sources] class GraftRlReaderFactory(tableSchema: StructType,
    required: StructType) extends PartitionReaderFactory {
  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftRlFileSet]
    // required-column projection: data columns by table index, the
    // _file metadata column materialized from the partition itself
    val proj: Array[Int] = required.fields.map(f =>
      if (f.name == "_file") -1 else tableSchema.fieldIndex(f.name))
    new PartitionReader[InternalRow] {
      private var fileIdx = 0
      private var stream: java.util.stream.Stream[String] = _
      private var lines: java.util.Iterator[String] = _
      private var fileName: UTF8String = _
      private var width = 0
      private var current: InternalRow = _
      override def next(): Boolean = {
        while (true) {
          if (lines != null && lines.hasNext) {
            val line = lines.next()
            if (line.nonEmpty) {
              val vals = GraftRlTable.lineToValues(line, tableSchema, width)
              current = InternalRow(proj.map(i =>
                if (i == -1) fileName else vals(i)).toIndexedSeq: _*)
              return true
            }
          } else if (fileIdx < gp.paths.length) {
            if (stream != null) stream.close()
            stream = Files.lines(Paths.get(gp.paths(fileIdx)))
            lines = stream.iterator()
            fileName = UTF8String.fromString(gp.names(fileIdx))
            width = gp.widths(fileIdx)
            fileIdx += 1
          } else return false
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = if (stream != null) stream.close()
    }
  }
}

private[sources] class GraftRlWriteBuilder(dir: Path,
    tableSchema: StructType, writeSchema: StructType,
    partCol: Option[String])
  extends WriteBuilder with SupportsTruncate {
  require(writeSchema.fields.map(f => (f.name, f.dataType)).toSeq ==
    tableSchema.fields.map(f => (f.name, f.dataType)).toSeq,
    s"graft catalog: write schema ${writeSchema.simpleString} must " +
      s"match table schema ${tableSchema.simpleString}")
  private var replace = false
  override def truncate(): WriteBuilder = { replace = true; this }
  override def build(): Write = GraftRl.maybeClustered(partCol,
    new GraftRlBatchWrite(dir, tableSchema, replace,
      partCol.map(tableSchema.fieldIndex)))
}

private[sources] final case class GraftRlStagedFile(name: String,
    rows: Long, statsToken: String) {
  def toGroupFile: GraftRl.GroupFile =
    GraftRl.GroupFile(name, rows, statsToken)
}

private[sources] final case class GraftRlStaged(
    files: Seq[GraftRlStagedFile]) extends WriterCommitMessage

/** INSERT / INSERT OVERWRITE commit: tasks stage immutable group
  * files (invisible until a manifest references them), the commit
  * publishes the next manifest by atomic-exclusive hard link, and a
  * LOST RACE REBASES — appends commute (the rebased manifest is the
  * winner's files plus ours) and an overwrite replaces everything
  * regardless, so retrying is sound for both. Bounded attempts; on
  * exhaustion the staged files are deleted and the commit fails
  * loudly. */
private[sources] class GraftRlBatchWrite(dir: Path, schema: StructType,
    replace: Boolean, partIdx: Option[Int]) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftRlWriterFactory(dir.toString, schema, rowOffset = 0, partIdx)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.flatMap {
      case m: GraftRlStaged => m.files
      case m => throw new IllegalStateException(
        s"graft catalog: foreign commit message $m")
    }.filter(_.rows > 0).map(_.toGroupFile).toSeq
    GraftRlConcurrencyHook.beforeAppendPublish()
    var attempt = 0
    var done = false
    while (!done) {
      val cur = GraftRl.currentVersion(dir)
      val prior = if (replace) Seq.empty
        else GraftRl.readManifest(dir, cur).getOrElse(
          throw new IllegalStateException(
            s"graft catalog: manifest v$cur vanished mid-commit in $dir"))
      done = GraftRl.publish(dir, cur + 1, GraftRl.render(prior ++ staged))
      if (!done) {
        attempt += 1
        if (attempt >= 64) {
          staged.foreach(g => Files.deleteIfExists(dir.resolve(g.name)))
          throw new IllegalStateException(
            s"graft catalog: gave up publishing after $attempt rebases " +
              s"in $dir (livelock?) — staged files deleted, no partial " +
              "state published")
        }
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftRlStaged(files) =>
        files.foreach(f => Files.deleteIfExists(dir.resolve(f.name)))
      case _ => ()
    }
}

/** Row-level (DELETE/UPDATE/MERGE) commit: replaces EXACTLY the
  * groups the operation's scan read — survivors of static stats
  * pruning and runtime `_file` filtering — with the staged
  * post-operation files, publishing base+1 by the same
  * atomic-exclusive link. NO REBASE here: the replacement rows were
  * computed against the base snapshot, so if any other commit won
  * version base+1 first this one ABORTS loudly and deletes its
  * staged files — optimistic concurrency, no lost update. */
private[sources] class GraftRlReplaceWrite(dir: Path, ident: String,
    schema: StructType, baseVersion: Long,
    baseFiles: Seq[GraftRl.GroupFile], op: GraftRlOperation,
    partIdx: Option[Int]) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftRlWriterFactory(dir.toString, schema, rowOffset = 1, partIdx)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.collect { case m: GraftRlStaged => m.files }
      .flatten.filter(_.rows > 0).map(_.toGroupFile).toSeq
    def cleanup(): Unit =
      staged.foreach(g => Files.deleteIfExists(dir.resolve(g.name)))
    val read = op.scannedGroups.getOrElse(Seq.empty)
    if (read.isEmpty && staged.nonEmpty) {
      cleanup()
      throw new IllegalStateException(
        s"graft catalog: $ident ${op.command()} produced replacement " +
          "rows but its scan recorded no groups — refusing a commit " +
          "that cannot name the files it replaces")
    }
    val readSet = read.toSet
    val survivors = baseFiles.filterNot(g => readSet.contains(g.name))
    val content = GraftRl.render(survivors ++ staged)
    GraftRlConcurrencyHook.beforeReplacePublish()
    if (!GraftRl.publish(dir, baseVersion + 1, content)) {
      cleanup()
      throw new java.util.ConcurrentModificationException(
        s"graft catalog: concurrent commit on $ident — this " +
          s"${op.command()} read snapshot v$baseVersion but version " +
          s"v${baseVersion + 1} was published by another writer while " +
          "it ran; the operation aborts (its staged files are deleted, " +
          "the other writer's commit is intact) — re-run the statement " +
          "against the current snapshot")
    }
    // replaced groups stay on disk: still referenced by older
    // manifests (time travel) until expireSnapshots retires them
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftRlStaged(files) =>
        files.foreach(f => Files.deleteIfExists(dir.resolve(f.name)))
      case _ => ()
    }
}

/** Tasks write group files under their FINAL immutable names — a
  * file is invisible until a manifest references it, so no rename
  * dance is needed; abort simply deletes. Tracks per-BIGINT-column
  * min/max/null-count while writing (the manifest stats behind static
  * pruning, metadata-only aggregates, and metadata-only deletes).
  * PARTITIONED tables split each task's output into one file per
  * partition value (writes are clustered on the partition column, so
  * a task sees whole values); files are opened lazily on first row,
  * so empty tasks stage nothing. */
private[sources] class GraftRlWriterFactory(dir: String,
    schema: StructType, rowOffset: Int,
    partIdx: Option[Int] = None) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val nCols = schema.fields.length
      private val isLong: Array[Boolean] =
        schema.fields.map(_.dataType == LongType)

      private final class FileState {
        val name =
          f"data-p$partitionId%05d-t$taskId-${java.util.UUID.randomUUID()}.tsv"
        val path = Paths.get(dir).resolve(name)
        val out = Files.newBufferedWriter(path)
        var rows = 0L
        val mins = Array.fill(nCols)(Long.MaxValue)
        val maxs = Array.fill(nCols)(Long.MinValue)
        val seen = Array.fill(nCols)(false)
        val nulls = Array.fill(nCols)(0L)
        def statsToken: String = (0 until nCols).map(i =>
          if (seen(i)) s"${mins(i)}:${maxs(i)}:${nulls(i)}"
          else if (isLong(i)) s"N:${nulls(i)}"
          else "-").mkString(",")
      }
      // keyed by partition value (null key boxed as the sentinel);
      // unpartitioned writes use a single shared key
      private val states =
        scala.collection.mutable.LinkedHashMap.empty[Any, FileState]

      /** Row-level rewrites have shipped rows in two shapes across
        * Spark 4 minors: with a leading `__row_operation` marker the
        * declared schema does not mention (round-16 behavior, before
        * this table declared metadata attributes) and, once
        * ReplaceDataProjections are planned, with exactly the data
        * columns. Resolve the offset from the first row's arity and
        * hold every later row to it. */
      private var off = -1

      override def write(r: InternalRow): Unit = {
        if (off < 0) {
          off = r.numFields - nCols
          require(rowOffset == 0 && off == 0 ||
            rowOffset == 1 && (off == 0 || off == 1),
            s"graft catalog: writer row has ${r.numFields} fields for " +
              s"a ${nCols}-column table (expected offset $rowOffset)")
        }
        val key: Any = partIdx match {
          case Some(i) =>
            if (r.isNullAt(i + off)) " null"
            else java.lang.Long.valueOf(r.getLong(i + off))
          case None => "all"
        }
        val st = states.getOrElseUpdate(key, new FileState)
        st.out.write(GraftRlTable.rowToLine(r, schema, off))
        st.out.write("\n")
        st.rows += 1
        var i = 0
        while (i < nCols) {
          if (isLong(i)) {
            if (r.isNullAt(i + off)) st.nulls(i) += 1
            else {
              val v = r.getLong(i + off)
              if (v < st.mins(i)) st.mins(i) = v
              if (v > st.maxs(i)) st.maxs(i) = v
              st.seen(i) = true
            }
          }
          i += 1
        }
      }

      override def commit(): WriterCommitMessage = {
        states.values.foreach(_.out.close())
        GraftRlStaged(states.values.map(st =>
          GraftRlStagedFile(st.name, st.rows, st.statsToken)).toSeq)
      }

      override def abort(): Unit = states.values.foreach { st =>
        st.out.close()
        Files.deleteIfExists(st.path)
      }
      override def close(): Unit = ()
    }
}

/** STREAMING READS of a catalog table — the manifest version history
  * as a micro-batch CHANGE LOG (the Delta `readStream.table` shape):
  * offsets are manifest VERSIONS, each micro-batch serves the rows of
  * the group files a version ADDED relative to its predecessor, and
  * admission control caps versions per batch (`maxVersionsPerBatch`,
  * default 1) so a long history drains in bounded, checkpointed
  * steps. Semantics are APPEND-ONLY, verified not assumed: a version
  * that also REMOVED files (DELETE/UPDATE/MERGE/OVERWRITE rewrote
  * groups) fails the stream loudly — streaming a rewritten row twice
  * or missing its deletion would silently corrupt every downstream
  * aggregate — unless `skipChangeCommits=true` opts into ignoring
  * those commits wholesale (Delta's knob, same name). Supports
  * `startingVersion` (exclusive low-water mark, default 0 = from
  * creation) and `Trigger.AvailableNow` (end pinned at prepare time).
  * A version retired by snapshot retention refuses loudly: history
  * older than retention cannot be replayed. */
private[sources] class GraftRlChangeStream(dir: Path,
    tableSchema: StructType, required: StructType,
    options: CaseInsensitiveStringMap)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming
    .SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private val maxVersions = options.getInt("maxVersionsPerBatch", 1)
  require(maxVersions > 0,
    "graft catalog: maxVersionsPerBatch must be positive")
  private val skipChangeCommits =
    options.getBoolean("skipChangeCommits", false)
  private val startingVersion = options.getLong("startingVersion", 0L)

  private case class VOff(v: Long) extends Offset {
    override def json(): String = v.toString
  }

  @volatile private var availableNowEnd: Long = -1L

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = GraftRl.currentVersion(dir)

  override def initialOffset(): Offset = VOff(startingVersion)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft catalog stream: latestOffset(Offset, ReadLimit) is the " +
        "admission-control entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[VOff].v
    val hardEnd =
      if (availableNowEnd >= 0L) availableNowEnd
      else GraftRl.currentVersion(dir)
    VOff(math.min(from + maxVersions, math.max(from, hardEnd)))
  }

  override def reportLatestOffset(): Offset = VOff(
    if (availableNowEnd >= 0L) availableNowEnd
    else GraftRl.currentVersion(dir))

  private def manifestAt(v: Long): Seq[GraftRl.GroupFile] =
    GraftRl.readManifest(dir, v).getOrElse(
      throw new IllegalStateException(
        s"graft catalog stream: manifest v$v has been expired by " +
          "snapshot retention — history older than retention cannot " +
          "be replayed; restart from a live startingVersion"))

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[VOff].v
    val to = end.asInstanceOf[VOff].v
    (from + 1 to to).flatMap { v =>
      val prev = manifestAt(v - 1).map(g => g.name -> g).toMap
      val cur = manifestAt(v)
      val removed = prev.keySet -- cur.map(_.name).toSet
      val added = cur.filterNot(g => prev.contains(g.name))
      if (removed.nonEmpty) {
        if (!skipChangeCommits)
          throw new IllegalStateException(
            s"graft catalog stream: version $v of $dir REWRITES " +
              s"group(s) ${removed.mkString(",")} (DELETE/UPDATE/" +
              "MERGE/OVERWRITE) — append-only streaming cannot " +
              "represent it; set skipChangeCommits=true to ignore " +
              "change commits wholesale")
        Nil // Delta semantics: skip the entire change commit
      } else added.map(g => GraftRlPartition(
        Array(dir.resolve(g.name).toString), Array(g.name),
        Array(g.width)))
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRlReaderFactory(tableSchema, required)

  override def deserializeOffset(json: String): Offset =
    VOff(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
