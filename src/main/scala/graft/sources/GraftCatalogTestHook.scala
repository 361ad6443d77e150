package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Test seam (mirrors [[ReplaySourceTestHook]]): the TSV codec lives
  * on the `private[sources]` table object; [[graft.CodecPropertySpec]]
  * property-tests its round-trip identity over hostile inputs. */
object GraftCatalogTestHook {
  def escape(s: String): String = GraftRlTable.escape(s)
  def unescape(s: String): String = GraftRlTable.unescape(s)
  def rowToLine(r: InternalRow, schema: StructType): String =
    GraftRlTable.rowToLine(r, schema, off = 0)
  def lineToRow(line: String, schema: StructType): InternalRow =
    GraftRlTable.lineToRow(line, schema)
  def expireSnapshots(tableDir: java.nio.file.Path,
      retainLast: Int): GraftCatalog.ExpireResult =
    GraftCatalog.expireSnapshots(tableDir, retainLast)

  /** Manifest introspection for group-geometry asserts: which
    * versions exist and which group files a version binds. */
  def manifestVersions(tableDir: java.nio.file.Path): Seq[Long] =
    GraftRl.manifestVersions(tableDir)
  def manifestFiles(tableDir: java.nio.file.Path,
      version: Long): Seq[String] =
    GraftRl.readManifest(tableDir, version).getOrElse(
      throw new IllegalArgumentException(s"no manifest v$version"))
      .map(_.name)

  /** Deterministic concurrent-writer fault injection: the callbacks
    * run on the driver immediately before a commit's first manifest
    * publish attempt (row-level replace / append respectively), so a
    * test can publish a competing version at exactly the racy
    * instant. Production leaves them as no-ops. */
  def setBeforeReplacePublish(f: () => Unit): Unit =
    GraftRlConcurrencyHook.beforeReplacePublish = f
  def setBeforeAppendPublish(f: () => Unit): Unit =
    GraftRlConcurrencyHook.beforeAppendPublish = f
  def clearPublishHooks(): Unit = {
    GraftRlConcurrencyHook.beforeReplacePublish = () => ()
    GraftRlConcurrencyHook.beforeAppendPublish = () => ()
  }

  /** Proof-engine seam: evaluate the metadata-delete coverage verdict
    * for a synthetic group file — [[graft.CodecPropertySpec]] fuzzes
    * it against brute-force row evaluation (a wrong AllRows verdict
    * would make a metadata DELETE silently drop live rows). */
  def deleteCoverage(rows: Long, statsToken: String,
      longIdx: Map[String, Int],
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : String =
    GraftRl.deleteCoverage(
      GraftRl.GroupFile("f", rows, statsToken), longIdx, p).toString

  /** Directly publish a manifest version (the "other writer" in
    * concurrency tests): content is the given version's manifest
    * re-published as `asVersion`. Returns whether the publish won. */
  def republishAs(tableDir: java.nio.file.Path, fromVersion: Long,
      asVersion: Long): Boolean = {
    val files = GraftRl.readManifest(tableDir, fromVersion).getOrElse(
      throw new IllegalArgumentException(s"no manifest v$fromVersion"))
    GraftRl.publish(tableDir, asVersion, GraftRl.render(files))
  }
}
