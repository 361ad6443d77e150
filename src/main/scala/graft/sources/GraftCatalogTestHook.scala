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
}
