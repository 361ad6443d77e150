package graft

import java.time.Clock
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** The reference's complete main (`/root/reference/one_one_one_rule/
  * pipeline_job.py:83-186`) as one orchestrated engine job:
  *
  *   1. derive as_of_date (configured tz) / run_ts_utc   (E11)
  *   2. EXTRACT  tickers: HTML page else CSV fallback    (S1/S2)
  *   3. TRANSFORM fetch → cleanse → valuation → output   (S3, §2.2–2.8)
  *   4. LOAD     latest CSV + optional dated copy        (S4)
  *
  * The Drive upload (S5) is deliberately dropped — external API sink,
  * not a relational operator (SURVEY.md §2.1).
  */
object Job {

  /** @param fetch     snapshot fetcher (ticker → Snapshot); injected so
    *                  runs are hermetic — the production impl calls the
    *                  market-data API per partition
    * @param html      pre-fetched constituents page, if any
    * @param csvPath   ticker CSV fallback path
    * @return the final ordered valuation DataFrame (also written to
    *         `settings.outputDir`)
    */
  def run(spark: SparkSession, settings: Settings, clock: Clock,
      fetch: String => Sources.Snapshot,
      html: Option[String], csvPath: String): DataFrame = {
    val asOf = Settings.businessDate(settings, clock)
    val ts = Settings.runTsUtc(clock)

    val tickers = Perf.timed("extract_tickers")(
      Sources.loadTickers(spark, html, csvPath))
    val fundamentals = Perf.timed("fetch_fundamentals")(
      Sources.fetchSnapshots(tickers, fetch))
    val out = Perf.timed("transform_valuation")(
      Pipeline.run(fundamentals, col("ticker"), settings.thresholds, asOf, ts)
        .orderBy("ticker"))

    Perf.timed("load_csv") {
      Sources.writeSingleCsv(out, s"${settings.outputDir}/${settings.latestName}")
      if (settings.writeDatedCopy)
        Sources.writeSingleCsv(out,
          s"${settings.outputDir}/${Settings.datedName(asOf)}")
    }
    out
  }
}
