package graft.sources

import java.nio.file.Path

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Test seam (mirrors [[ReplaySourceTestHook]]): the Parquet group
  * codec, the typed stats grammar, and the metadata-delete proof
  * engine live on `private[sources]` objects;
  * [[graft.CodecPropertySpec]] property-tests them over hostile
  * inputs through these exports. */
object GraftCatalogTestHook {

  /** Write `rows` as one Parquet group file at `path`, returning the
    * manifest stats token the writer would record — the exact
    * write-side codec + stats path production uses. */
  def writeGroup(path: Path, schema: StructType,
      rows: Seq[InternalRow]): String = {
    val msg = GraftRlCodec.messageType(schema.fields.toSeq)
    val fac =
      new org.apache.parquet.example.data.simple.SimpleGroupFactory(msg)
    val w = GraftRlCodec.openWriter(path, msg)
    val stats = new GraftRlStats(schema)
    try rows.foreach { r =>
      w.write(GraftRlCodec.appendRow(fac, r, schema, 0))
      stats.update(r, 0)
    } finally w.close()
    stats.token
  }

  /** Read a group file back through the projected production read
    * path: `required` columns only, columns at index ≥ `width`
    * null-filled (schema-on-read). */
  def readGroup(path: Path, schema: StructType, required: StructType,
      width: Int): Seq[InternalRow] = {
    val present = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.types.StructField]
    val slot: Array[Int] = required.fields.map { f =>
      val ti = schema.fieldIndex(f.name)
      if (ti < width) { present += schema.fields(ti); present.length - 1 }
      else -2
    }
    val types = present.map(_.dataType).toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    if (present.isEmpty) return out.toSeq
    val reader = GraftRlCodec.openReader(path.toString,
      GraftRlCodec.messageType(present.toSeq))
    try {
      var g = reader.read()
      while (g != null) {
        out += InternalRow.fromSeq(slot.map {
          case -2 => null
          case j => GraftRlCodec.groupValue(g, j, types(j))
        }.toIndexedSeq)
        g = reader.read()
      }
    } finally reader.close()
    out.toSeq
  }

  /** Stats-token bound-string escaping (`% : , \t \n \r` + the bare
    * `_`/`?` sentinels). */
  def encodeBound(s: String): String = GraftRlStats.encodeBound(s)
  def decodeBound(s: String): String = GraftRlStats.decodeBound(s)
  def truncLower(s: String): String = GraftRlStats.truncLower(s)
  def truncUpper(s: String): Option[String] = GraftRlStats.truncUpper(s)

  /** Compute the stats token for rows WITHOUT writing a file (stats
    * grammar fuzzing). */
  def statsTokenFor(schema: StructType, rows: Seq[InternalRow]): String = {
    val st = new GraftRlStats(schema)
    rows.foreach(st.update(_, 0))
    st.token
  }

  def expireSnapshots(tableDir: Path, retainLast: Int,
      graceMs: Long = 0L): GraftCatalog.ExpireResult =
    GraftCatalog.expireSnapshots(tableDir, retainLast, graceMs)

  def optimizeTable(tableDir: Path,
      targetRows: Long): GraftCatalog.OptimizeResult =
    GraftCatalog.optimizeTable(tableDir, targetRows)

  /** Distributed OPTIMIZE — one Spark task per compaction bin;
    * `sortCol` switches on clustered (sorted) packing. */
  def optimizeTableDistributed(spark: org.apache.spark.sql.SparkSession,
      tableDir: Path, targetRows: Long,
      sortCol: Option[String] = None): GraftCatalog.OptimizeResult =
    GraftCatalog.optimizeTable(spark, tableDir, targetRows, sortCol)

  /** Clustered (sorted) serial OPTIMIZE. */
  def optimizeTableClustered(tableDir: Path, targetRows: Long,
      sortCol: String): GraftCatalog.OptimizeResult =
    GraftCatalog.optimizeTable(tableDir, targetRows, Some(sortCol))

  /** Multi-column Z-order OPTIMIZE (serial; `maxBinBytes` caps one
    * bin's in-memory sort — the spec seam for the split path). */
  def optimizeTableZordered(tableDir: Path, targetRows: Long,
      zorderCols: Seq[String],
      maxBinBytes: Long = GraftRlOptimize.DefaultMaxBinBytes)
      : GraftCatalog.OptimizeResult =
    GraftCatalog.optimizeTable(tableDir, targetRows, None, zorderCols,
      maxBinBytes)

  /** Distributed Z-order OPTIMIZE. */
  def optimizeTableZorderedDistributed(
      spark: org.apache.spark.sql.SparkSession, tableDir: Path,
      targetRows: Long, zorderCols: Seq[String])
      : GraftCatalog.OptimizeResult =
    GraftCatalog.optimizeTable(spark, tableDir, targetRows, None,
      zorderCols)

  /** 1-D clustered OPTIMIZE with an explicit bin-byte cap (spec seam
    * for the oversized-range split). */
  def optimizeTableClusteredCapped(tableDir: Path, targetRows: Long,
      sortCol: String, maxBinBytes: Long): GraftCatalog.OptimizeResult =
    GraftCatalog.optimizeTable(tableDir, targetRows, Some(sortCol), Nil,
      maxBinBytes)

  /** DESCRIBE HISTORY rows for a table. */
  def history(tableDir: Path): Seq[GraftCatalog.HistoryEntry] =
    GraftCatalog.history(tableDir)

  /** The explicit `#ts` commit instant of a version (mtime fallback
    * only for pre-header manifests). */
  def commitTimeMillis(tableDir: Path, version: Long): Long =
    GraftRl.commitTimeMillis(tableDir, version)

  /** Manifest header metadata of a version (`ts`, streaming `txn`). */
  def manifestMeta(tableDir: Path, version: Long): Map[String, String] =
    GraftRl.readManifestMeta(tableDir, version)

  /** Per-group occupancy of the CURRENT version: (file, rows,
    * liveRows) — the dead-row ledger behind the DV
    * read-amplification gate. */
  def groupOccupancy(tableDir: Path): Seq[(String, Long, Long)] =
    GraftRl.readManifest(tableDir, GraftRl.currentVersion(tableDir))
      .getOrElse(Seq.empty).map(g => (g.name, g.rows, g.liveRows))

  def tagSnapshot(tableDir: Path, name: String, version: Long): Unit =
    GraftCatalog.tagSnapshot(tableDir, name, version)

  def manifestMtimeMillis(tableDir: Path, version: Long): Long =
    java.nio.file.Files.getLastModifiedTime(
      GraftRl.manifestPath(tableDir, version)).toMillis

  /** Manifest introspection for group-geometry asserts: which
    * versions exist and which group files a version binds. */
  def manifestVersions(tableDir: Path): Seq[Long] =
    GraftRl.manifestVersions(tableDir)
  def manifestFiles(tableDir: Path, version: Long): Seq[String] =
    GraftRl.readManifest(tableDir, version).getOrElse(
      throw new IllegalArgumentException(s"no manifest v$version"))
      .map(_.name)
  def manifestStatsTokens(tableDir: Path,
      version: Long): Seq[(String, Long, String)] =
    GraftRl.readManifest(tableDir, version).getOrElse(
      throw new IllegalArgumentException(s"no manifest v$version"))
      .map(g => (g.name, g.rows, g.statsToken))

  /** Current schema version on disk (0 = never altered). */
  def schemaVersion(tableDir: Path): Long =
    GraftRl.currentSchemaVersion(tableDir)

  /** Publish a schema version directly (the "other ALTER" in
    * concurrency tests). Returns whether the publish won. */
  def publishSchemaAs(tableDir: Path, version: Long,
      json: String): Boolean =
    GraftRl.publishSchema(tableDir, version, json)

  /** Deterministic concurrent-writer fault injection: the callbacks
    * run on the driver immediately before a commit's first manifest
    * publish attempt (row-level replace / append respectively), so a
    * test can publish a competing version at exactly the racy
    * instant. Production leaves them as no-ops. */
  def setBeforeReplacePublish(f: () => Unit): Unit =
    GraftRlConcurrencyHook.beforeReplacePublish = f
  def setBeforeAppendPublish(f: () => Unit): Unit =
    GraftRlConcurrencyHook.beforeAppendPublish = f
  def setBeforeSchemaPublish(f: () => Unit): Unit =
    GraftRlConcurrencyHook.beforeSchemaPublish = f
  def setBeforeDeltaPublish(f: () => Unit): Unit =
    GraftRlConcurrencyHook.beforeDeltaPublish = f
  def setAfterTagPublish(f: () => Unit): Unit =
    GraftRlConcurrencyHook.afterTagPublish = f
  def setBeforeOptimizePublish(f: () => Unit): Unit =
    GraftRlConcurrencyHook.beforeOptimizePublish = f
  def setBeforeEpochPublish(f: () => Unit): Unit =
    GraftRlConcurrencyHook.beforeEpochPublish = f
  def clearPublishHooks(): Unit = {
    GraftRlConcurrencyHook.beforeReplacePublish = () => ()
    GraftRlConcurrencyHook.beforeAppendPublish = () => ()
    GraftRlConcurrencyHook.beforeSchemaPublish = () => ()
    GraftRlConcurrencyHook.beforeDeltaPublish = () => ()
    GraftRlConcurrencyHook.afterTagPublish = () => ()
    GraftRlConcurrencyHook.beforeOptimizePublish = () => ()
    GraftRlConcurrencyHook.beforeEpochPublish = () => ()
  }

  /** Streaming-txn high-water mark (manifest scan + retention
    * sidecar) and the raw sidecar contents. */
  def lastTxnEpoch(tableDir: Path, queryId: String): Option[Long] =
    GraftRl.lastTxnEpoch(tableDir, queryId)
  def readTxnSidecar(tableDir: Path): Map[String, Long] =
    GraftRl.readTxnSidecar(tableDir)

  /** Publish a manifest version with explicit header metadata (the
    * "zombie twin" in streaming-concurrency tests). */
  def republishWithMeta(tableDir: Path, fromVersion: Long,
      asVersion: Long, meta: Map[String, String]): Boolean = {
    val files = GraftRl.readManifest(tableDir, fromVersion).getOrElse(
      throw new IllegalArgumentException(s"no manifest v$fromVersion"))
    GraftRl.publish(tableDir, asVersion, GraftRl.render(files), meta)
  }

  /** Proof-engine seam: evaluate the metadata-delete coverage verdict
    * for a synthetic group file — [[graft.CodecPropertySpec]] fuzzes
    * it against brute-force row evaluation (a wrong AllRows verdict
    * would make a metadata DELETE silently drop live rows). */
  def deleteCoverage(rows: Long, statsToken: String, schema: StructType,
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : String =
    GraftRl.deleteCoverage(
      GraftRl.GroupFile("f", rows, statsToken), schema, p).toString

  /** Pruning seam: would the typed stats keep this file for the
    * pushed filter? */
  def mightMatch(rows: Long, statsToken: String, schema: StructType,
      f: org.apache.spark.sql.sources.Filter): Boolean =
    GraftRl.mightMatch(GraftRl.GroupFile("f", rows, statsToken), schema, f)

  /** Directly publish a manifest version (the "other writer" in
    * concurrency tests): content is the given version's manifest
    * re-published as `asVersion`. Returns whether the publish won. */
  def republishAs(tableDir: Path, fromVersion: Long,
      asVersion: Long): Boolean = {
    val files = GraftRl.readManifest(tableDir, fromVersion).getOrElse(
      throw new IllegalArgumentException(s"no manifest v$fromVersion"))
    GraftRl.publish(tableDir, asVersion, GraftRl.render(files))
  }
}
