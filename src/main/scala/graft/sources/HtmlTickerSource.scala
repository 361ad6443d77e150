package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("graft-html")` — the hermetic DataSourceV2 shell
  * for the reference's LIVE constituents-page fetch
  * (`extract_tickers.py:22-42`; UA+certifi variant
  * `scripts/update_nasdaq100_tickers.py:13-46`), the one surface the
  * sandboxed repo had only as a parse-from-string.
  *
  * The FETCH function is injected, never hardwired: tests (and any
  * offline environment) register a fixture fetcher via
  * [[HtmlTickerSource.registerFetcher]] and select it with the
  * `fetcher` option; a production deployment registers one that does
  * the real HTTP GET (UA header + TLS, exactly the reference's two
  * scripts). Inline `html` and local `file` options cover the no-
  * network paths. Extraction and the ≥ 80-row guard are shared with
  * S1 (`Sources.tickerStringsFromHtml` — same first-qualifying-table
  * rule, same `extract_tickers.py:40-41` raise when nothing
  * qualifies), and normalization is E10's strip → upper → '.'→'-',
  * then distinct + sort, so the connector's output is byte-identical
  * to `Sources.tickersFromHtml`.
  *
  * Scale notes: one constituents page is driver-sized by definition —
  * the fetch+parse runs once at scan planning and the (≤ hundreds of)
  * tickers ship as ONE input partition; the downstream per-ticker
  * fan-out (S3 `fetchSnapshots`) is where parallelism starts. */
class HtmlTickerSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-html"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HtmlTickerSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HtmlTickerTable(new CaseInsensitiveStringMap(properties))
}

object HtmlTickerSource {
  val schema: StructType =
    StructType(Seq(StructField("ticker", StringType, nullable = false)))

  private val fetchers =
    new java.util.concurrent.ConcurrentHashMap[String, String => String]()

  /** Register a named fetch function (url → html). Tests install
    * fixture readers; production installs a real HTTP client. */
  def registerFetcher(name: String)(f: String => String): Unit =
    fetchers.put(name, f)

  private[sources] def resolveHtml(opts: CaseInsensitiveStringMap): String = {
    val inline = Option(opts.get("html"))
    val file = Option(opts.get("file"))
    val url = Option(opts.get("url"))
    inline.orElse(file.map { p =>
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
        java.nio.charset.StandardCharsets.UTF_8)
    }).orElse(url.map { u =>
      val name = Option(opts.get("fetcher")).getOrElse(
        throw new IllegalArgumentException(
          "graft-html: option 'url' needs a registered 'fetcher' " +
            "(this build is hermetic - no ambient HTTP client)"))
      val f = Option(fetchers.get(name)).getOrElse(
        throw new IllegalArgumentException(
          s"graft-html: no fetcher registered under '$name'"))
      f(u)
    }).getOrElse(throw new IllegalArgumentException(
      "graft-html: one of 'html', 'file', or 'url'+'fetcher' is required"))
  }

  /** Extraction + guard + E10 normalization (see class doc). The
    * strings from [[Sources.tickerStringsFromHtml]] arrive already
    * normalized (the ≥ minRows guard counts normalized non-empty
    * cells, reference ordering); only distinct + sort remain here. */
  private[sources] def tickers(opts: CaseInsensitiveStringMap): Array[String] = {
    val html = resolveHtml(opts)
    val normalized = Sources.tickerStringsFromHtml(html).getOrElse(
      throw new IllegalStateException(
        s"graft-html: no table with a ticker column and >= ${Sources.minRows} " +
          "normalized rows found (extract_tickers.py:40-41 semantics)"))
    normalized.toArray.distinct.sorted
  }
}

private[sources] class HtmlTickerTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft-html"
  override def schema(): StructType = HtmlTickerSource.schema
  override def capabilities(): util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
    // the table's creation options carry html/file/url; reader options
    // (passed at .load time) override
    val merged = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
    new HtmlTickerScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private[sources] class HtmlTickerScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {
  // fetch + parse ONCE at planning, on the driver (one page)
  private lazy val resolved: Array[String] = HtmlTickerSource.tickers(options)
  override def build(): Scan = this
  override def readSchema(): StructType = HtmlTickerSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(HtmlTickerPartition(resolved))
  override def createReaderFactory(): PartitionReaderFactory =
    new HtmlTickerReaderFactory
}

private[sources] final case class HtmlTickerPartition(tickers: Array[String])
    extends InputPartition

private[sources] class HtmlTickerReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val ts = partition.asInstanceOf[HtmlTickerPartition].tickers
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < ts.length }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(ts(i)))
      override def close(): Unit = ()
    }
  }
}
