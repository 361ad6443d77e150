package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownOffset, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("graft-shard")` — a DataSourceV2 connector over
  * a directory of CSV telemetry shards (`g,x` per line) that
  * implements AGGREGATE PUSHDOWN (`SupportsPushDownAggregates`), the
  * DSv2 read-path capability the engine's other connectors don't
  * exercise (graft-html: plain batch read; graft-csv: the write
  * path).
  *
  * When the query shape is `[GROUP BY g] count(*) / min(x) / max(x)`,
  * the scan REWRITES ITSELF: each shard's reader streams its file
  * once and emits one row per local group — the rows crossing the
  * source boundary drop from |rows| to |files|·|groups|, and Spark's
  * planner (V2ScanRelationPushDown) finishes with the matching final
  * merge (SUM of partial counts, MIN of partial mins, MAX of partial
  * maxes) because `supportCompletePushDown` stays false — PARTIAL
  * pushdown, the shape that is correct under any file split. Any
  * other aggregate (sum, avg, distinct) or grouping is declined and
  * the source serves plain rows — pushdown must never change
  * semantics, only traffic.
  *
  * At 100 TB this is the connector-side half of the zone-map story
  * (q212): a storage layer that can answer count/min/max per shard
  * turns a full-corpus profile query into metadata traffic. One
  * input partition per shard file = the usual split model; no state
  * is shared across readers.
  */
class ShardStatsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-shard"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShardStatsSource.rowSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ShardStatsTable(new CaseInsensitiveStringMap(properties))
}

object ShardStatsSource {
  val rowSchema: StructType = StructType(Seq(
    StructField("g", StringType, nullable = false),
    StructField("x", LongType, nullable = false)))

  /** Effective runtime-filter guarantee, independent of whether the
    * session's planner chose to insert a DPP subquery: drives the
    * SupportsRuntimeFiltering.filter(...) path directly and counts
    * the rows the readers then serve. Used by the spec's fallback arm
    * so the capability is pinned even if planner heuristics drift. */
  private[sources] def rowsAfterRuntimeFilter(
      path: String, gs: Set[String]): Long = {
    val b = new ShardStatsScanBuilder(new CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("path", path)))
    b.filter(Array[Filter](
      In("g", gs.toArray.sorted[String].map(x => x: Any))))
    val factory = b.toBatch.createReaderFactory()
    b.toBatch.planInputPartitions().map { p =>
      val r = factory.createReader(p)
      var n = 0L
      while (r.next()) n += 1
      r.close(); n
    }.sum
  }

  private[sources] def shardFiles(opts: CaseInsensitiveStringMap): Array[String] = {
    val dir = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-shard: 'path' is required"))
    val d = new java.io.File(dir)
    val fs = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".csv"))
      .map(_.getAbsolutePath)
    java.util.Arrays.sort(fs, java.util.Comparator.naturalOrder[String]())
    fs
  }
}

private[sources] class ShardStatsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "graft-shard"
  override def schema(): StructType = ShardStatsSource.rowSchema
  override def capabilities(): util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ShardWriteBuilder(options, info)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
    new ShardStatsScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private[sources] class ShardStatsScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownOffset
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsRuntimeFiltering {

  // pushed state: None = plain row scan; Some((groupByG, funcs)) =
  // aggregated scan. funcs are tags: 'c' (count*), 'n' (min x),
  // 'x' (max x) — order preserved from the query's Aggregation.
  private var pushed: Option[(Boolean, Seq[Char])] = None
  // LIMIT/TopN pushdown (both PARTIAL: each shard keeps its local
  // k rows / top-k; Spark's plan retains the global Limit / TopK, so
  // the answer is exact under any shard split — the same contract as
  // the partial aggregate pushdown above). topN: (k, descending).
  private var pushedLimit: Option[Int] = None
  private var pushedTopN: Option[(Int, Boolean)] = None
  // accepted scan-level predicates on (g, x) — evaluated at PARSE
  // time inside every reader path (rows, top-n, limited, aggregated),
  // so rejected lines never become rows at all. V2ScanRelationPushDown
  // pushes filters FIRST, so the later-pushed aggregate/top-n/limit
  // semantics apply to the filtered stream — exactly the SQL order.
  private var accepted: Seq[Filter] = Nil
  // column pruning for non-aggregated scans: None = full (g, x)
  private var pruned: Option[StructType] = None

  /** Accept the equality/range shapes a `g,x` line can answer while
    * parsing; everything else is returned for Spark to evaluate
    * post-scan. IsNotNull is vacuously true here (both columns are
    * non-nullable) and is absorbed. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition {
      case EqualTo("g", _: String) => true
      case EqualTo("x", _: Long) => true
      case GreaterThan("x", _: Long) => true
      case GreaterThanOrEqual("x", _: Long) => true
      case LessThan("x", _: Long) => true
      case LessThanOrEqual("x", _: Long) => true
      case IsNotNull("g") | IsNotNull("x") => true
      case _ => false
    }
    accepted = ok.toSeq
    rest
  }
  override def pushedFilters(): Array[Filter] = accepted.toArray

  /** Column pruning for the plain-row path (the aggregate path's
    * output schema is the aggregation itself — pruning is ignored
    * there). An empty required schema (bare count(*) when the
    * aggregate path declined) is honored: readers emit zero-column
    * rows. */
  override def pruneColumns(requiredSchema: StructType): Unit =
    if (pushed.isEmpty) pruned = Some(requiredSchema)

  // ---- RUNTIME filtering (the DSv2 dynamic-partition-pruning
  // analog): when this scan sits on the probe side of a join whose
  // build side is small and filtered, Spark executes the build side
  // first and hands the observed join keys back here as In('g', …) —
  // rows outside the key set then die at PARSE time, before the
  // probe side ever materializes. At 100 TB this is the difference
  // between scanning the fact corpus and scanning the joined slice.
  private var runtimeGs: Option[Set[String]] = None

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("g"))

  override def filter(filters: Array[Filter]): Unit =
    filters.foreach {
      case In("g", vs) =>
        val gs = vs.collect { case s: String => s }.toSet
        // intersect with any earlier runtime set (multiple joins)
        runtimeGs = Some(runtimeGs.fold(gs)(_ intersect gs))
      case _ => () // other runtime shapes: decline silently (safe)
    }

  /** LIMIT k over the raw rows: every shard may stop reading after k
    * lines — a pure traffic cut (|files|·k rows cross the boundary). */
  override def pushLimit(limit: Int): Boolean = {
    if (pushed.isDefined) return false // agg output is already tiny
    pushedLimit = Some(limit)
    true
  }
  override def isPartiallyPushed(): Boolean = true

  /** OFFSET m (paged export): unlike LIMIT, an offset has no partial
    * form — "skip m rows" is only answerable when ONE reader serves
    * the whole scan in its storage order, so the push is accepted
    * only for a single-shard directory (and declined under any
    * aggregate/top-n rewrite). Spark removes the Offset node when
    * accepted; Spark pushes the preceding LIMIT as limit+offset, so
    * the reader serves kept-row indices [offset, limit). */
  private var pushedOffset: Option[Int] = None
  override def pushOffset(offset: Int): Boolean = {
    if (pushed.isDefined || pushedTopN.isDefined) return false
    if (ShardStatsSource.shardFiles(options).length != 1) return false
    pushedOffset = Some(offset)
    true
  }

  /** ORDER BY x [ASC|DESC] LIMIT k: each shard ships only its local
    * top-k by x (bounded heap over one file pass). Only the single
    * numeric column is orderable; anything else is declined and the
    * source serves plain rows — pushdown must never change semantics. */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    if (pushed.isDefined) return false
    orders match {
      case Array(o) if isCol(o.expression(), "x") =>
        pushedTopN = Some((limit, o.direction() == SortDirection.DESCENDING))
        pushedLimit = None // TopN subsumes any plain limit
        true
      case _ => false
    }
  }

  private def isCol(e: Expression, name: String): Boolean = e match {
    case r: NamedReference =>
      r.fieldNames.length == 1 && r.fieldNames()(0).equalsIgnoreCase(name)
    case _ => false
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    false // partial pushdown: correct under any shard split

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val grouped = aggregation.groupByExpressions() match {
      case Array() => false
      case Array(e) if isCol(e, "g") => true
      case _ => return false
    }
    val tags = aggregation.aggregateExpressions().map {
      case _: CountStar => 'c'
      case m: Min if isCol(m.column(), "x") => 'n'
      case m: Max if isCol(m.column(), "x") => 'x'
      case _ => return false
    }
    if (tags.isEmpty) return false
    pushed = Some((grouped, tags.toSeq))
    true
  }

  override def build(): Scan = this
  override def readSchema(): StructType = pushed match {
    case None => pruned.getOrElse(ShardStatsSource.rowSchema)
    case Some((grouped, tags)) =>
      val aggFields = tags.zipWithIndex.map {
        case ('c', i) => StructField(s"count_$i", LongType, nullable = false)
        case ('n', i) => StructField(s"min_$i", LongType, nullable = true)
        case (_, i) => StructField(s"max_$i", LongType, nullable = true)
      }
      StructType(
        (if (grouped) Seq(StructField("g", StringType, nullable = false))
         else Seq.empty) ++ aggFields)
  }
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    // runtime In('g') joins the statically-pushed filters; partitions
    // are (re-)planned by BatchScanExec AFTER filter() runs, so the
    // readers see the runtime key set
    val eff = accepted ++ runtimeGs.map(gs =>
      In("g", gs.toArray.sorted[String].map(x => x: Any)))
    ShardStatsSource.shardFiles(options).map(f =>
      ShardPartition(f, pushed.map { case (g, t) => (g, t.mkString) },
        pushedLimit, pushedTopN, eff,
        pruned.map(_.fieldNames.toSeq), pushedOffset))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ShardStatsReaderFactory
  override def description(): String = {
    val filt =
      if (accepted.isEmpty) ""
      else s" PushedFilters[${accepted.mkString(", ")}]"
    pushed match {
      case Some((grouped, tags)) =>
        s"graft-shard PushedAggregates[${tags.mkString(",")}] " +
          s"grouped=$grouped$filt"
      case None =>
        val topn = pushedTopN.map { case (k, desc) =>
          s" PushedTopN[x ${if (desc) "DESC" else "ASC"} limit=$k]"
        }.getOrElse("")
        val lim = pushedLimit.map(k => s" PushedLimit[$k]").getOrElse("") +
          pushedOffset.map(m => s" PushedOffset[$m]").getOrElse("")
        val cols = pruned.map(p =>
          s" ReadSchema[${p.fieldNames.mkString(",")}]").getOrElse("")
        s"graft-shard rows$topn$lim$filt$cols"
    }
  }
}

private[sources] final case class ShardPartition(
    file: String, pushed: Option[(Boolean, String)],
    limit: Option[Int] = None,
    topN: Option[(Int, Boolean)] = None,
    filters: Seq[Filter] = Nil,
    prunedCols: Option[Seq[String]] = None,
    offset: Option[Int] = None) extends InputPartition

private[sources] class ShardStatsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardPartition]
    val keep = predicate(p.filters)
    val proj = projector(p.prunedCols)
    (p.pushed, p.topN) match {
      case (Some((grouped, tags)), _) =>
        new ShardAggReader(p.file, grouped, tags, keep)
      case (None, Some((k, desc))) =>
        new ShardTopNReader(p.file, k, desc, keep, proj)
      case (None, None) =>
        new ShardRowReader(p.file, p.limit, keep, proj, p.offset)
    }
  }

  private def parse(ln: String): (String, Long) = {
    val i = ln.indexOf(',')
    (ln.substring(0, i), java.lang.Long.parseLong(ln.substring(i + 1)))
  }

  /** Compile the accepted scan filters to one line-level predicate. */
  private def predicate(fs: Seq[Filter]): ((String, Long)) => Boolean = {
    if (fs.isEmpty) return _ => true
    row => fs.forall {
      case EqualTo("g", v: String) => row._1 == v
      case EqualTo("x", v: Long) => row._2 == v
      case GreaterThan("x", v: Long) => row._2 > v
      case GreaterThanOrEqual("x", v: Long) => row._2 >= v
      case LessThan("x", v: Long) => row._2 < v
      case LessThanOrEqual("x", v: Long) => row._2 <= v
      case In("g", vs) => vs.exists(_ == row._1) // runtime key set
      case IsNotNull(_) => true
      case _ => true // unreachable: pushFilters accepted only the above
    }
  }

  /** Compile the pruned column list to an InternalRow projector. */
  private def projector(cols: Option[Seq[String]])
      : ((String, Long)) => InternalRow = cols match {
    case None => row => InternalRow(UTF8String.fromString(row._1), row._2)
    case Some(cs) =>
      row => InternalRow.fromSeq(cs.map {
        case "g" => UTF8String.fromString(row._1)
        case _ => row._2
      })
  }

  private class ShardRowReader(file: String, limit: Option[Int] = None,
      keep: ((String, Long)) => Boolean = _ => true,
      proj: ((String, Long)) => InternalRow =
        r => InternalRow(UTF8String.fromString(r._1), r._2),
      offset: Option[Int] = None)
      extends PartitionReader[InternalRow] {
    private val src = scala.io.Source.fromFile(file, "UTF-8")
    private val it = src.getLines().map(parse).filter(keep)
    private var cur: (String, Long) = _
    private var emitted = 0
    // pushed OFFSET: the first m SURVIVING rows are consumed (parsed,
    // filtered, never shipped) before the first next(); with a pushed
    // LIMIT alongside (Spark pushes it as limit+offset), the reader
    // serves kept-row indices [offset, limit)
    offset.foreach { m =>
      while (emitted < m && it.hasNext) { it.next(); emitted += 1 }
    }
    override def next(): Boolean = {
      // pushed LIMIT: stop reading this shard after k SURVIVING rows
      // — the remainder of the file is never shipped
      if (limit.exists(emitted >= _)) return false
      val h = it.hasNext
      if (h) { cur = it.next(); emitted += 1 }
      h
    }
    override def get(): InternalRow = proj(cur)
    override def close(): Unit = src.close()
  }

  /** Pushed ORDER BY x LIMIT k: one file pass through a bounded heap
    * of size k (ties kept arbitrarily — Spark's retained global TopK
    * re-sorts, so only the SET of per-shard top values must be a
    * superset of the shard's contribution to the global answer, which
    * a size-k heap guarantees). Emits in heap-pop order; order across
    * the boundary is irrelevant under partial pushdown. */
  private class ShardTopNReader(file: String, k: Int, desc: Boolean,
      keep: ((String, Long)) => Boolean = _ => true,
      proj: ((String, Long)) => InternalRow =
        r => InternalRow(UTF8String.fromString(r._1), r._2))
      extends PartitionReader[InternalRow] {
    private lazy val rows: Iterator[(String, Long)] = {
      val ord: Ordering[(String, Long)] =
        if (desc) Ordering.by[(String, Long), Long](_._2).reverse
        else Ordering.by[(String, Long), Long](_._2)
      // PQ keeps the WORST retained row at the head for O(log k) evict
      val pq = scala.collection.mutable.PriorityQueue.empty[(String, Long)](ord)
      scala.util.Using.resource(scala.io.Source.fromFile(file, "UTF-8")) {
        src =>
          src.getLines().foreach { ln =>
            val row = parse(ln)
            if (keep(row)) {
              if (pq.size < k) pq.enqueue(row)
              else if (ord.lt(row, pq.head)) { pq.dequeue(); pq.enqueue(row) }
            }
          }
      }
      pq.iterator.toList.iterator
    }
    private var cur: (String, Long) = _
    override def next(): Boolean = {
      val h = rows.hasNext; if (h) cur = rows.next(); h
    }
    override def get(): InternalRow = proj(cur)
    override def close(): Unit = ()
  }

  /** One file pass → one output row per local group (or one total). */
  private class ShardAggReader(file: String, grouped: Boolean, tags: String,
      keep: ((String, Long)) => Boolean = _ => true)
      extends PartitionReader[InternalRow] {
    private lazy val rows: Iterator[InternalRow] = {
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, (Long, Long, Long)] // count, min, max
      scala.util.Using.resource(scala.io.Source.fromFile(file, "UTF-8")) {
        src =>
          src.getLines().foreach { ln =>
            val row = parse(ln)
            if (keep(row)) {
              val (g, x) = row
              val key = if (grouped) g else ""
              val (c, mn, mx) =
                acc.getOrElse(key, (0L, Long.MaxValue, Long.MinValue))
              acc.update(key, (c + 1, math.min(mn, x), math.max(mx, x)))
            }
          }
      }
      acc.iterator.map { case (g, (c, mn, mx)) =>
        val aggVals: Seq[Any] = tags.map {
          case 'c' => c
          case 'n' => mn
          case _ => mx
        }.toSeq
        InternalRow.fromSeq(
          (if (grouped) Seq(UTF8String.fromString(g)) else Seq.empty) ++
            aggVals)
      }
    }
    private var cur: InternalRow = _
    override def next(): Boolean = {
      val h = rows.hasNext; if (h) cur = rows.next(); h
    }
    override def get(): InternalRow = cur
    override def close(): Unit = ()
  }
}

/** WRITE path of the `graft-shard` connector: a TRANSACTIONAL DSv2
  * batch write with the two-phase task/job commit protocol every
  * 100 TB-safe sink needs —
  *
  *  1. each task writes its rows to a private file under
  *     `<dir>/.staging-<queryId>/` (one file per task ATTEMPT:
  *     partitionId + taskId in the name, so a speculative retry can
  *     never collide with the attempt it races);
  *  2. task commit returns the staged file name as the commit
  *     message — only files NAMED IN A MESSAGE exist as far as the
  *     job is concerned;
  *  3. job commit publishes exactly the message-named files into the
  *     directory by rename (and, for a truncate/overwrite write,
  *     removes the previous generation first), then drops the staging
  *     directory — orphans from failed/speculative attempts vanish
  *     with it;
  *  4. job abort deletes the staging directory — a failed write leaves
  *     the target byte-identical to before.
  *
  * Same executor-visible-filesystem contract as the read side (local
  * mode / shared POSIX mounts); an object-store deployment would swap
  * the rename for a manifest write, keeping the protocol. Append and
  * truncate (SaveMode.Overwrite) are supported; the input schema must
  * be exactly (g STRING, x BIGINT). */
private[sources] class ShardWriteBuilder(options: CaseInsensitiveStringMap,
    info: LogicalWriteInfo) extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = {
    val s = info.schema()
    require(s.length == 2 &&
      s(0).name == "g" && s(0).dataType == StringType &&
      s(1).name == "x" && s(1).dataType == LongType,
      s"graft-shard write requires schema (g STRING, x BIGINT), got $s")
    val dir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-shard: 'path' is required"))
    new Write {
      override def toBatch: BatchWrite =
        new ShardBatchWrite(dir, info.queryId(), truncateFirst)
    }
  }
}

private[graft] final case class ShardCommit(stagedFile: String)
  extends WriterCommitMessage

private[graft] class ShardBatchWrite(dir: String, queryId: String,
    truncateFirst: Boolean) extends BatchWrite {
  private val staging = new java.io.File(dir, s".staging-$queryId")

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    staging.mkdirs()
    ShardWriterFactory(staging.getAbsolutePath)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val target = new java.io.File(dir)
    target.mkdirs()
    if (truncateFirst)
      Option(target.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".csv"))
        .foreach(_.delete())
    messages.foreach { case ShardCommit(staged) =>
      val src = new java.io.File(staged)
      java.nio.file.Files.move(src.toPath,
        new java.io.File(target, src.getName).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    deleteStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    deleteStaging()

  private def deleteStaging(): Unit = {
    Option(staging.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    staging.delete()
  }
}

private[graft] final case class ShardWriterFactory(stagingDir: String)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    val f = new java.io.File(stagingDir,
      f"part-$partitionId%05d-$taskId.csv")
    new DataWriter[InternalRow] {
      private val out = new java.io.BufferedWriter(new java.io.FileWriter(f))
      override def write(row: InternalRow): Unit = {
        val g = row.getUTF8String(0).toString
        require(!g.contains(',') && !g.contains('\n'),
          s"graft-shard: group value '$g' would corrupt the g,x line format")
        out.write(g); out.write(',')
        out.write(java.lang.Long.toString(row.getLong(1))); out.write('\n')
      }
      override def commit(): WriterCommitMessage = {
        out.close(); ShardCommit(f.getAbsolutePath)
      }
      override def abort(): Unit = { out.close(); f.delete(): Unit }
      override def close(): Unit = ()
    }
  }
}
