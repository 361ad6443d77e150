package graft

import graft.operators.HtmlExtract
import graft.operators.HtmlExtract.Page

/** Block segmentation + link-density boilerplate gate, including the
  * adversarial inputs a crawl actually contains (uppercase tags,
  * script bodies with `<`, comments, unterminated tags). */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): (Long, Long, String) = {
    val ds = Seq(Page(1L, html)).toDS()
    val r = HtmlExtract.extractMainText(ds).collect().head
    (r.n_blocks, r.n_kept, r.extracted)
  }

  test("fixture page round-trips the document text exactly") {
    val text = ("alpha beta " * 20).trim // 40 words → 3 paragraphs
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val out = HtmlExtract.extractMainText(HtmlExtract.encodePages(docs))
      .collect().head
    // odd id → no promo: nav + 3 paras + footer
    assert(out.n_blocks == 5 && out.n_kept == 3)
    assert(out.extracted == text)

    val even = Seq((8L, text)).toDF("doc_id", "text")
    val out2 = HtmlExtract.extractMainText(HtmlExtract.encodePages(even))
      .collect().head
    assert(out2.n_blocks == 6 && out2.n_kept == 3)
    assert(out2.extracted == text)
  }

  test("script/style/title bodies are stripped wholesale, even uppercase") {
    val (_, _, got) = extract(
      "<HTML><HEAD><TITLE>leak</TITLE><SCRIPT>if (1 < 2) { x(); }</SCRIPT>" +
        "<STYLE>p<{}</STYLE></HEAD><BODY><P>real content here</P></BODY></HTML>")
    assert(got == "real content here")
  }

  test("tag folding is locale-independent (Turkish dotless-i JVM)") {
    // under a tr-TR default locale, "TITLE".toLowerCase would be
    // "tıtle" and miss the raw-skip set — the fold must be Locale.ROOT
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
      val (_, _, got) = extract(
        "<TITLE>leak</TITLE><DIV>body words</DIV><SCRIPT>var x=1;</SCRIPT>" +
          "<LI>item text</LI>")
      assert(got == "body words item text")
      // U+0130 content lowercases to TWO chars — a full toLowerCase copy
      // would misalign close-tag offsets; the scan must stay aligned
      val (_, _, tr) = extract(
        "<p>İstanbul ili</p><script>skip();</script><p>more body</p>")
      assert(tr == "İstanbul ili more body")
    } finally java.util.Locale.setDefault(prev)
  }

  test("comments skipped; unterminated tag drops only the tail") {
    val (_, _, a) = extract("<p>keep</p><!-- <p>gone</p> --><p>also</p>")
    assert(a == "keep also")
    val (_, _, b) = extract("<p>kept text</p><p attr=\"dangling")
    assert(b == "kept text")
  }

  test("link density gates blocks; whitespace collapses inside blocks") {
    val html =
      "<nav><a href=\"/\">x</a> <a href=\"/y\">y</a></nav>" + // density 1.0
        "<p>one\n  two\t three</p>" + // collapses to single spaces
        "<div>read the <a href=\"/d\">docs</a> for details</div>" // low density
    val (blocks, kept, got) = extract(html)
    assert(blocks == 3 && kept == 2)
    assert(got == "one two three read the docs for details")
  }

  test("pure-link block with exactly threshold density is dropped") {
    // 5 linked of 11 visible = 0.45 > 0.33 → dropped; 2/11 kept
    val (_, k1, g1) = extract("<p>go <a href=\"/\">there</a> now</p>")
    assert(k1 == 0 && g1 == "")
    val (_, k2, g2) = extract("<p>stay right here my <a href=\"/\">no</a></p>")
    assert(k2 == 1 && g2 == "stay right here my no")
  }

  test("'>' inside quoted attribute values does not close the tag") {
    val (_, _, a) = extract("<p><a href=\"/a?x>y\">link text</a> and more words here</p>")
    assert(a == "link text and more words here")
    val (_, _, b) = extract("<div data-q='1>2'>kept body text</div>")
    assert(b == "kept body text")
    // unterminated quote inside a tag: the tail is dropped, not leaked
    val (_, _, c) = extract("<p>before</p><img alt=\"dangling>")
    assert(c == "before")
  }

  test("empty page and tag-only page yield zero blocks") {
    val (b1, k1, g1) = extract("")
    assert(b1 == 0 && k1 == 0 && g1 == "")
    val (b2, k2, g2) = extract("<html><body><div></div></body></html>")
    assert(b2 == 0 && k2 == 0 && g2 == "")
  }
}
