package graft

import java.time.{Clock, Instant, ZoneId}
import graft.sources.Sources

/** End-to-end of the orchestrated main: extract (CSV fallback) →
  * hermetic fetch → valuation → latest + dated CSV.
  */
class JobSpec extends SparkSpec {

  test("full job writes latest + dated CSVs with identical content") {
    val dir = java.nio.file.Files.createTempDirectory("graft_job").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/tickers.csv"),
      "Symbol\nAAPL\nMSFT\nbrk.b\nAAPL\n")
    val settings = Settings(outputDir = s"$dir/out", timezone = "Asia/Bangkok")
    val clock = Clock.fixed(Instant.parse("2026-08-12T23:30:00Z"), ZoneId.of("UTC"))

    def fetch(t: String): Sources.Snapshot =
      Sources.Snapshot(t, s"$t Co", if (t == "MSFT") "Tech" else "Fin",
        Some(100.0 + t.length), Some(1e9), "USD", Some(20.0), Some(18.0),
        Some(4.0), Some(4.2), Some(0.12), None, Some(30.0), None)

    val out = Job.run(spark, settings, clock, fetch,
      html = None, csvPath = s"$dir/tickers.csv")

    // 3 distinct tickers (AAPL deduped, brk.b normalized)
    assert(out.count() == 3)
    assert(out.select("ticker").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("AAPL", "BRK-B", "MSFT"))
    // business date crossed midnight in Bangkok
    assert(out.select("as_of_date").first().getString(0) == "2026-08-13")

    val latest = java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"$dir/out/nasdaq100_valuations_latest.csv"))
    val dated = java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"$dir/out/nasdaq100_valuations_2026-08-13.csv"))
    assert(latest == dated && latest.linesIterator.size == 4)
    assert(latest.startsWith("as_of_date,run_ts_utc,ticker,"))
  }
}
