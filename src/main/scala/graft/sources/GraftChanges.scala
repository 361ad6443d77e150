package graft.sources

import java.nio.file.{Path, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** ROW-LEVEL CHANGE DATA FEED — `SELECT * FROM cat.db.`t$changes``
  * (the Iceberg changes-table / Delta `table_changes` shape): every
  * retained commit replayed as typed change rows
  * `(<data columns>, _change_type, _commit_version)`, derived
  * entirely from the catalog's own MOR machinery with NO extra
  * writer-side CDC files:
  *
  *   - a commit's ADDED group files are its inserted rows,
  *   - a commit's deletion-vector DELTA on a surviving file (the
  *     positions dead at v but live at v-1) are its removed rows —
  *     readable as full PRE-IMAGES because MOR never rewrites the
  *     underlying file,
  *   - a commit with only additions classifies `insert`; only DV
  *     growth `delete`; both (the shape
  *     `representUpdateAsDeleteAndInsert` produces for UPDATE and
  *     MERGE) `update_preimage`/`update_postimage`.
  *
  * REWRITE commits (COW row-level ops, OPTIMIZE, TRUNCATE) remove
  * files; a manifest diff cannot tell copied rows from changed rows
  * there, so the feed REFUSES them loudly — or skips them wholesale
  * under `skipRewrites=true` (OPTIMIZE is content-preserving, so
  * skipping it is exact; the option mirrors the change stream's
  * `skipChangeCommits` contract of explicit opt-in). Versions older
  * than retention refuse like every history read.
  *
  * Served BATCH (`startingVersion`/`endingVersion`, both inclusive,
  * defaults 1..current) and STREAMING (micro-batch per version with
  * `maxVersionsPerBatch` admission control and AvailableNow support,
  * version offsets checkpointed) — one slice planner for both, so a
  * streaming consumer and a batch backfill see identical change
  * rows. Scale shape: one InputPartition per (file × change kind);
  * pre-image slices re-read ONLY the vectored file with a projected
  * column subset, so a one-row DELETE on a 100 TB table feeds
  * downstream consumers at the cost of one group file, not a diff of
  * two snapshots. */
private[sources] class GraftRlChangesTable(ident: String, dir: Path,
    dataSchema: StructType) extends Table with SupportsRead {

  private val fullSchema = StructType(dataSchema.fields.toSeq ++ Seq(
    StructField("_change_type", StringType, nullable = false),
    StructField("_commit_version", LongType, nullable = false)))

  override def name(): String = ident
  override def schema(): StructType = fullSchema
  override def capabilities(): util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = fullSchema
      override def pruneColumns(r: StructType): Unit =
        required = if (r.fields.isEmpty) fullSchema else r
      override def build(): Scan = new GraftRlCdcScan(dir, dataSchema,
        required, options)
    }
}

private[sources] class GraftRlCdcScan(dir: Path,
    dataSchema: StructType, required: StructType,
    options: CaseInsensitiveStringMap) extends Scan {

  private val skipRewrites = options.getBoolean("skipRewrites", false)

  override def readSchema(): StructType = required
  override def description(): String = s"graft-rl-changes $dir"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = {
      val cur = GraftRl.currentVersion(dir)
      val from = math.max(1L, options.getLong("startingVersion", 1L))
      val to = math.min(cur, options.getLong("endingVersion", cur))
      (from to to).flatMap(v =>
        GraftRlCdc.slices(dir, v, skipRewrites)).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftRlCdcReaderFactory(dataSchema, required)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftRlCdcStream(dir, dataSchema, required, options)
}

/** Streaming half: version offsets, admission control, AvailableNow —
  * the [[GraftRlChangeStream]] discipline over CDC slices. */
private[sources] class GraftRlCdcStream(dir: Path,
    dataSchema: StructType, required: StructType,
    options: CaseInsensitiveStringMap)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming
    .SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private val maxVersions = options.getInt("maxVersionsPerBatch", 1)
  require(maxVersions > 0,
    "graft changes: maxVersionsPerBatch must be positive")
  private val skipRewrites = options.getBoolean("skipRewrites", false)
  private val startingVersion = options.getLong("startingVersion", 1L)

  private case class VOff(v: Long) extends Offset {
    override def json(): String = v.toString
  }

  @volatile private var availableNowEnd: Long = -1L

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = GraftRl.currentVersion(dir)

  override def initialOffset(): Offset =
    VOff(math.max(0L, startingVersion - 1L))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graft changes stream: latestOffset(Offset, ReadLimit) is the " +
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

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[VOff].v
    val to = end.asInstanceOf[VOff].v
    (from + 1 to to).flatMap(v =>
      GraftRlCdc.slices(dir, v, skipRewrites)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRlCdcReaderFactory(dataSchema, required)

  override def deserializeOffset(json: String): Offset =
    VOff(json.trim.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One CDC slice: one group file at one commit, served either as its
  * rows LIVE at the commit (`picked=false`, `dvNew` masks) — the
  * insert/post-image side — or as EXACTLY the positions newly dead at
  * the commit (`picked=true`, emit `dv(dvNew) \ dv(dvOld)`) — the
  * delete/pre-image side. */
private[sources] final case class GraftRlCdcSlice(path: String,
    width: Int, rows: Long, dvNew: String, dvOld: String,
    picked: Boolean, changeType: String, commitVersion: Long)
  extends InputPartition

private[sources] object GraftRlCdc {

  /** Plan version `v`'s change slices from the manifest diff. */
  def slices(dir: Path, v: Long,
      skipRewrites: Boolean): Seq[GraftRlCdcSlice] = {
    def manifestAt(mv: Long): Seq[GraftRl.GroupFile] =
      GraftRl.readManifest(dir, mv).getOrElse(
        throw new IllegalStateException(
          s"graft changes: manifest v$mv of $dir has been expired by " +
            "snapshot retention — change history older than retention " +
            "cannot be replayed"))
    val prev = manifestAt(v - 1).map(g => g.name -> g).toMap
    val cur = manifestAt(v)
    val curByName = cur.map(g => g.name -> g).toMap
    val removed = prev.keySet -- curByName.keySet
    if (removed.nonEmpty) {
      if (skipRewrites) return Seq.empty
      throw new IllegalStateException(
        s"graft changes: version $v of $dir REWRITES group(s) " +
          s"${removed.toSeq.sorted.mkString(",")} (a COW row-level " +
          "operation, OPTIMIZE, or TRUNCATE) — a manifest diff cannot " +
          "tell copied rows from changed rows, so the change feed " +
          "refuses; use merge-on-read modes for CDC tables, or set " +
          "skipRewrites=true to ignore rewrite commits wholesale")
    }
    val added = cur.filterNot(g => prev.contains(g.name))
    // DV delta on surviving files = the commit's removed rows
    val vectored = cur.flatMap { g =>
      prev.get(g.name) match {
        case Some(p) if g.dv.map(_._1) != p.dv.map(_._1) ||
            g.dv.map(_._2) != p.dv.map(_._2) =>
          Some((g, p.dv.map(_._1).getOrElse("")))
        case _ => None
      }
    }
    val (preType, postType) =
      if (vectored.nonEmpty && added.nonEmpty)
        ("update_preimage", "update_postimage")
      else ("delete", "insert")
    vectored.map { case (g, oldDv) =>
      GraftRlCdcSlice(dir.resolve(g.name).toString, g.width, g.rows,
        g.dv.map(d => dir.resolve(d._1).toString).getOrElse(""),
        if (oldDv.isEmpty) "" else dir.resolve(oldDv).toString,
        picked = true, preType, v)
    } ++ added.map { g =>
      GraftRlCdcSlice(dir.resolve(g.name).toString, g.width, g.rows,
        g.dv.map(d => dir.resolve(d._1).toString).getOrElse(""), "",
        picked = false, postType, v)
    }
  }
}

/** CDC read path: the projected-columns discipline of
  * [[GraftRlReaderFactory]] for a single file per slice, plus the two
  * appended change-metadata literals. Top-level (capture-free). */
private[sources] class GraftRlCdcReaderFactory(dataSchema: StructType,
    required: StructType) extends PartitionReaderFactory {

  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] = {
    val slice = p.asInstanceOf[GraftRlCdcSlice]
    // required field → data column index, -4 _change_type, -5 _commit_version
    val fieldIdx: Array[Int] = required.fields.map(f =>
      if (f.name == "_change_type") -4
      else if (f.name == "_commit_version") -5
      else dataSchema.fieldIndex(f.name))
    val present = scala.collection.mutable.ArrayBuffer.empty[StructField]
    // required position → projection position (-2 = null-fill)
    val slot: Array[Int] = fieldIdx.map { ti =>
      if (ti < 0) ti
      else if (ti < slice.width) {
        present += dataSchema.fields(ti); present.length - 1
      } else -2
    }
    val types = present.map(_.dataType).toArray
    val ctLit = UTF8String.fromString(slice.changeType)
    val cvLit = java.lang.Long.valueOf(slice.commitVersion)
    val dvNew = if (slice.dvNew.isEmpty) Array.emptyLongArray
      else GraftRl.readDv(Paths.get(slice.dvNew))
    val dvOld = if (slice.dvOld.isEmpty) Array.emptyLongArray
      else GraftRl.readDv(Paths.get(slice.dvOld))
    // picked mode: emit exactly dvNew \ dvOld (both sorted)
    val picked: Array[Long] =
      if (!slice.picked) Array.emptyLongArray
      else {
        val out = Array.newBuilder[Long]
        var i = 0; var j = 0
        while (i < dvNew.length) {
          while (j < dvOld.length && dvOld(j) < dvNew(i)) j += 1
          if (!(j < dvOld.length && dvOld(j) == dvNew(i)))
            out += dvNew(i)
          i += 1
        }
        out.result()
      }

    new PartitionReader[InternalRow] {
      private var reader: org.apache.parquet.hadoop
        .ParquetReader[org.apache.parquet.example.data.Group] =
        if (present.isEmpty) null
        else GraftRlCodec.openReader(slice.path,
          GraftRlCodec.messageType(present.toSeq))
      private var syntheticLeft: Long =
        if (present.nonEmpty) 0L
        else if (slice.picked) picked.length.toLong
        else slice.rows - dvNew.length
      private var ord = 0L
      private var maskIdx = 0
      private var pickIdx = 0
      private var current: InternalRow = _

      private def emit(o: Long): Boolean =
        if (slice.picked) {
          while (pickIdx < picked.length && picked(pickIdx) < o)
            pickIdx += 1
          pickIdx < picked.length && picked(pickIdx) == o
        } else {
          while (maskIdx < dvNew.length && dvNew(maskIdx) < o)
            maskIdx += 1
          !(maskIdx < dvNew.length && dvNew(maskIdx) == o)
        }

      private def toRow(
          g: org.apache.parquet.example.data.Group): InternalRow =
        InternalRow.fromSeq(slot.toIndexedSeq.map {
          case -4 => ctLit
          case -5 => cvLit
          case -2 => null
          case j => GraftRlCodec.groupValue(g, j, types(j))
        })

      override def next(): Boolean = {
        if (syntheticLeft > 0) { // no data column: count-only shape
          syntheticLeft -= 1
          current = InternalRow.fromSeq(slot.toIndexedSeq.map {
            case -4 => ctLit
            case -5 => cvLit
            case _ => null
          })
          return true
        }
        if (reader == null) return false
        var g = reader.read()
        while (g != null) {
          val o = ord; ord += 1
          if (emit(o)) { current = toRow(g); return true }
          g = reader.read()
        }
        reader.close(); reader = null
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = if (reader != null) reader.close()
    }
  }
}
