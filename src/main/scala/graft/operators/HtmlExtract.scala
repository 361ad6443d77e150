package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Main-content extraction from raw HTML — the boilerplate-removal pass
  * every crawl-to-corpus pipeline (C4, RefinedWeb, FineWeb) runs first,
  * and the step the reference's HTML ingestion
  * (`/root/reference/extract_tickers.py:44-79`, table-shaped) implies
  * for free-text pages: turn a page into its article text, dropping
  * navigation, ads, and footers.
  *
  * Heuristic (the readability/jusText/boilerpipe core signal):
  *  1. `<script>`/`<style>`/comments are stripped wholly — their text
  *     is never content.
  *  2. The page splits into blocks at block-level tag boundaries
  *     (`p div nav footer header aside ul ol li h1..h6 table tr br`).
  *  3. Per block, count visible chars and chars inside `<a>` — the
  *     block's link density. Boilerplate is link-heavy (nav bars,
  *     "related links", footers); body text is link-light.
  *  4. Keep blocks with link density < [[HtmlExtract.MaxLinkDensity]];
  *     join survivors with single spaces, whitespace-normalized.
  *
  * Scale shape: one narrow `mapPartitions` pass, char-scanning each
  * page exactly once (no DOM build, no regex backtracking — O(bytes)
  * with a constant-size state machine). Raw HTML never shuffles; only
  * the extracted text and counters leave the operator. At 100 TB the
  * cost is the parquet scan + one codegen-friendly projection of
  * results; parallelism is per-row, so any shard layout works.
  */
object HtmlExtract {

  /** Blocks with ≥ this fraction of their visible chars inside links
    * are dropped as boilerplate. 0.33 is the jusText-family default
    * neighbourhood: nav/footer blocks sit near 1.0, article text near
    * 0.0, so the gate is insensitive to the exact value. */
  val MaxLinkDensity = 0.33

  private val BlockTags: Set[String] = Set(
    "p", "div", "nav", "footer", "header", "aside", "ul", "ol", "li",
    "h1", "h2", "h3", "h4", "h5", "h6", "table", "tr", "br", "section",
    "article", "main", "blockquote", "pre", "form",
    // structural boundaries: head/title text must never merge into body
    "html", "head", "body", "title")

  /** Raw-text elements whose content is skipped wholesale: script and
    * style are never visible; title is metadata, not main content (the
    * readability family drops it too). */
  private val RawSkipTags: Set[String] = Set("script", "style", "title")

  final case class Page(doc_id: Long, html: String)
  final case class Extracted(doc_id: Long, n_blocks: Long, n_kept: Long,
      extracted: String)

  private[graft] final case class Block(text: String, linked: Int) {
    def visible: Int = text.length
    def density: Double = if (visible == 0) 1.0 else linked.toDouble / visible
  }

  /** Single-pass block segmentation: tag boundaries close the current
    * block; text accumulates with an in-`<a>` flag feeding the linked
    * count. Entities are left as-is (the fixture corpus is plain
    * ASCII; a production build would decode the five XML entities
    * here, same single pass). Whitespace inside a block collapses to
    * single spaces at close. */
  private[graft] def segment(html: String): Vector[Block] = {
    val blocks = Vector.newBuilder[Block]
    val text = new StringBuilder
    var linked = 0
    var inA = false
    var pendingSpace = false

    def close(): Unit = {
      val t = text.result()
      if (t.nonEmpty) blocks += Block(t, linked)
      text.clear(); linked = 0; pendingSpace = false
    }
    def emit(c: Char): Unit = {
      if (c == ' ' || c == '\n' || c == '\t' || c == '\r') {
        if (text.nonEmpty) pendingSpace = true
      } else {
        if (pendingSpace) { text += ' '; if (inA) linked += 1 }
        pendingSpace = false
        text += c
        if (inA) linked += 1
      }
    }

    var i = 0
    val n = html.length
    // Case-insensitive substring scan without a lowercased copy: a full
    // toLowerCase is locale-sensitive (Turkish dotless-ı folds 'TITLE'
    // to 'tıtle') and can change string LENGTH (U+0130 lowercases to two
    // chars), misaligning indexOf positions. regionMatches(true, ...)
    // folds char-by-char with no locale and no allocation.
    def indexOfIgnoreCase(needle: String, from: Int): Int = {
      val m = needle.length
      var k = from
      val last = n - m
      while (k <= last) {
        if (html.regionMatches(true, k, needle, 0, m)) return k
        k += 1
      }
      -1
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) { // comment: skip to -->
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else {
          // quote-aware close scan: '>' inside a quoted attribute value
          // (href="a>b", onclick='x>y') does NOT close the tag — real
          // crawl HTML contains these and a naive indexOf('>') would
          // spill the attribute tail into the extracted text
          var e = -1
          var j = i + 1
          var quote = 0.toChar
          while (e < 0 && j < n) {
            val cj = html.charAt(j)
            if (quote != 0) { if (cj == quote) quote = 0 }
            else if (cj == '"' || cj == '\'') quote = cj
            else if (cj == '>') e = j
            j += 1
          }
          if (e < 0) { i = n } // unterminated tag: drop the tail
          else {
            val body = html.substring(i + 1, e)
            val closing = body.startsWith("/")
            val name = body.dropWhile(_ == '/')
              .takeWhile(ch => ch.isLetterOrDigit)
              .toLowerCase(java.util.Locale.ROOT)
            i = e + 1
            if (!closing && RawSkipTags.contains(name)) {
              // raw-text element: skip to its close tag wholesale
              val stop = s"</$name"
              val s2 = indexOfIgnoreCase(stop, i)
              i = if (s2 < 0) n else {
                val e2 = html.indexOf('>', s2)
                if (e2 < 0) n else e2 + 1
              }
            } else if (name == "a") {
              inA = !closing
            } else if (BlockTags.contains(name)) {
              close()
            }
          }
        }
      } else {
        emit(c)
        i += 1
      }
    }
    close()
    blocks.result()
  }

  /** Extract main text per page: segment → drop link-dense blocks →
    * join survivors with single spaces. Returns the block bookkeeping
    * alongside so curation funnels can audit the drop rate. */
  def extractMainText(pages: Dataset[Page]): Dataset[Extracted] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions { it =>
      it.map { p =>
        val blocks = segment(p.html)
        val kept = blocks.filter(_.density < MaxLinkDensity)
        Extracted(p.doc_id, blocks.size.toLong, kept.size.toLong,
          kept.map(_.text).mkString(" "))
      }
    }
  }

  /** Deterministic HTML fixture generator for the oracle-checked query:
    * wraps each document's text in a full page — head with script+style
    * (must strip), a pure-link nav (density 1.0 → drop), on even ids a
    * link-heavy promo div (→ drop), the text as 15-word `<p>` blocks
    * (density 0 → keep), and a link-heavy footer (→ drop). Because the
    * corpus text is single-spaced `[a-z ]`, rejoining the kept blocks
    * with single spaces must reproduce the document text EXACTLY —
    * any parser defect (missed tag, botched script skip, whitespace
    * mangling, wrong density arithmetic) breaks the compare. */
  def encodePages(documents: DataFrame): Dataset[Page] = {
    import documents.sparkSession.implicits._
    // balance the 1-row-group dev scan: HTML synth here and the parse
    // in extractMainText inherit the partitioning (guide §2.6)
    graft.QueryUtil.balanced(documents.select("doc_id", "text"))
      .as[(Long, String)].map {
      case (id, text) =>
        val paras = text.split(' ').grouped(15)
          .map(ws => s"<p>${ws.mkString(" ")}</p>").mkString("\n")
        val promo = if (id % 2 == 0)
          "<div class=\"promo\">visit <a href=\"/sponsor\">our sponsor page today</a></div>\n"
        else ""
        val html =
          s"""<html><head><title>doc $id</title>
<script>var t = $id; if (t < 0) { t = 0; }</script>
<style>p { margin: 0; } <!-- not a comment in css --></style></head>
<body>
<!-- page chrome -->
<nav><a href="/">home</a> <a href="/a">archive</a> <a href="/b">about</a></nav>
$promo$paras
<footer><a href="/terms">terms</a> <a href="/privacy">privacy</a> c</footer>
</body></html>"""
        Page(id, html)
    }
  }
}
