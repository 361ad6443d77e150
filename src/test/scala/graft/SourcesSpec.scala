package graft

import graft.sources.Sources

/** Extract-stage sources (S1 HTML / S2 CSV / S4 single-file sink). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def htmlPage(nTickers: Int, headerName: String = "Ticker"): String = {
    val rows = (1 to nTickers)
      .map(i => s"<tr><td> t.$i </td><td>Company $i</td></tr>").mkString
    s"""<html><body>
       |<table class="infobox"><tr><th>Irrelevant</th></tr><tr><td>x</td></tr></table>
       |<table id="constituents">
       |<tr><th> $headerName </th><th>Company</th></tr>$rows</table>
       |</body></html>""".stripMargin
  }

  test("S1: picks the table with a ticker column, normalizes, dedups, sorts") {
    val got = Sources.tickersFromHtml(spark, htmlPage(85)).get.collect()
      .map(_.getString(0))
    assert(got.length == 85)
    assert(got.head == "T-1" && got.sorted.toSeq == got.toSeq) // sorted, dots→dashes
  }

  test("S1: table below the 80-row guard is rejected") {
    assert(Sources.tickersFromHtml(spark, htmlPage(79)).isEmpty)
    assert(Sources.tickersFromHtml(spark, htmlPage(85, "NotATicker")).isEmpty)
  }

  test("S2 + fallback: CSV symbol column (case-insensitive), else first column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"),
      "SYMBOL,Name\naapl,Apple\nbrk.b,Berkshire\naapl,Dup\n")
    val got = Sources.loadTickers(spark, html = None, csvFallback = s"$dir/t.csv")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("AAPL", "BRK-B"))
  }

  test("S4: single-file ordered CSV sink writes one exact file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_out").toString
    val df = Seq((2, "b"), (1, "a")).toDF("k", "v").orderBy("k")
    Sources.writeSingleCsv(df, s"$dir/out.csv")
    val content = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/out.csv"))
    assert(content == "k,v\n1,a\n2,b\n")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/out.csv.tmpdir")))
  }
}
