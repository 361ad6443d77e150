package graft

import org.apache.spark.sql.functions._
import graft.functions.{Text => T}
import graft.operators.Multimodal

/** Text-analysis + multimodal operator unit tests (edge inputs the
  * oracle-checked documents table doesn't contain). */
class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: blank → empty; multi-space collapses; count matches") {
    val df = Seq("", "   ", "a b", "  a   b  c ").toDF("t")
      .select(T.tokenCount($"t").as("n"))
    assert(col1(df, "n") == Seq(0, 0, 2, 3))
  }

  test("shingles: fewer tokens than n → empty; exact windows otherwise") {
    val df = Seq("a b", "a b c", "a b c d").toDF("t")
      .select(T.wordShingles(T.tokens($"t"), 3).as("s"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(Nil, List("a b c"), List("a b c", "b c d")))
  }

  test("langId: CJK wins; marker argmax with en-first ties; no evidence → und") {
    val df = Seq(
      "the cat is on the mat",   // en markers
      "der hund und die katze",  // de markers
      "le chat et la souris",    // fr markers
      "中文 text here",  // CJK → zh
      "xyzzy plugh"              // none → und
    ).toDF("t").select(T.langId($"t").as("l"))
    assert(col1(df, "l") == Seq("en", "de", "fr", "zh", "und"))
  }

  test("qualityScore stays in [0,1] incl. empty text") {
    val df = Seq("", "short", "a" * 500,
      "the " * 50, "!!!,,,;;;...???").toDF("t")
      .select(T.qualityScore($"t").as("q"))
    col1(df, "q").foreach { v =>
      val d = v.asInstanceOf[Double]
      assert(d >= 0.0 && d <= 1.0)
    }
  }

  test("qualityScore stopword matching is case-SENSITIVE — the engine/" +
      "oracle convention pin (capitalized markers must NOT count)") {
    // same length, same punct, same token count — the ONLY difference
    // is marker case, so the score gap is exactly the 0.3 stopword
    // weight (lower: ratio 1.0 → capped 1.0; upper: ratio 0 → 0).
    // The q20/q130 oracles match raw-case tokens with the same list;
    // if either side ever adds a lower(), this pins the divergence.
    val got = Seq(("the the the", "The The The")).toDF("lo", "up")
      .select(T.qualityScore($"lo").as("qlo"), T.qualityScore($"up").as("qup"))
      .collect().head
    assert(math.abs(got.getDouble(0) - got.getDouble(1) - 0.3) < 1e-12)
  }

  test("fingerprint is whitespace/case-insensitive; min-shingle needs ≥3 tokens") {
    val df = Seq(("Hello  World FOO", "hello world foo"))
      .toDF("a", "b")
      .select((T.fingerprint($"a") === T.fingerprint($"b")).as("same"),
        T.minShingleFingerprint($"a", 3).isNotNull.as("hasmsf"),
        T.minShingleFingerprint(lit("just two"), 3).isNull.as("short_null"))
    assert(rows(df).head.toSeq == Seq(true, true, true))
  }

  test("multimodal ingest → decode/frame stubs produce consistent shapes") {
    val docs = Seq((0L, "x" * 250, "en", "s", 250L), (1L, "y" * 90, "en", "s", 90L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.ingest(docs)
    val feats = Multimodal.decodeBrightness(media).collect()
    assert(feats.map(f => f.doc_id -> f.n_bytes).toMap == Map(0L -> 250L, 1L -> 90L))
    assert(feats.forall(f => f.brightness >= 0 && f.brightness < 256))
    // doc 0 is a "video" (doc_id % 3 == 0) with 250/100+1 = 3 frames
    val frames = Multimodal.frameSampleStub(media).collect()
    assert(frames.map(_.doc_id).distinct.toSeq == Seq(0L))
    assert(frames.length == 3 && frames.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    assert(frames.forall(f => f.frame_checksum == 'x'.toLong || f.frame_checksum == -1L))
  }

  test("PII redaction: emails, IPv4, phone shapes → typed placeholders") {
    import spark.implicits._
    val rows = Seq(
      "contact me at jane.doe+spam@example.co.uk or call 555-123-4567",
      "server at 192.168.1.254 responded; also (555) 123-4567 works",
      "intl +1 555 123 4567 and mail bob@corp.io",
      "no pii here, just text with numbers 1234 and a dot 1.5",
      "version 10.2.3.4 of the firmware" // conservative: IP-shaped → scrub
    ).toDF("text")
    val got = rows.select(T.redactPii(col("text")).as("t"),
      T.piiCount(col("text")).cast("long").as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got(0) == ("contact me at <EMAIL> or call <PHONE>", 2L))
    assert(got(1) == ("server at <IP> responded; also <PHONE> works", 2L))
    assert(got(2) == ("intl <PHONE> and mail <EMAIL>", 2L))
    assert(got(3) == ("no pii here, just text with numbers 1234 and a dot 1.5", 0L))
    assert(got(4) == ("version <IP> of the firmware", 1L))
  }

  test("URL extracts: host, tld, path depth, query — and non-URL edges") {
    import spark.implicits._
    val rows = Seq(
      "https://web3.example-src1.com/en/doc-5?ref=rss",
      "http://host.org/",
      "https://host.io",
      "ftp://a.b.c/x/y/z",
      "https://nodots/x",
      "not a url at all").toDF("u")
    val got = rows.select(T.urlHost(col("u")).as("h"), T.urlTld(col("u")).as("t"),
        T.urlPathDepth(col("u")).as("d"), T.urlHasQuery(col("u")).as("q"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getBoolean(3)))
    assert(got(0) == (("web3.example-src1.com", "com", 2, true)))
    assert(got(1) == (("host.org", "org", 0, false))) // root path
    assert(got(2) == (("host.io", "io", 0, false)))   // no path
    assert(got(3) == (("a.b.c", "c", 3, false)))
    assert(got(4) == (("nodots", "", 1, false)))      // tld absent
    assert(got(5) == (("", "", 0, false)))            // non-URL
  }

  test("stripMarkdown: headings, fences, links, emphasis, bullets, edges") {
    val cases = Seq(
      "## title\nbody" -> "title body",
      "```scala\nval x = 1\n```" -> "val x = 1",
      "see [the docs](http://x/y?z=1) now" -> "see the docs now",
      "**bold** and `code` text" -> "bold and code text",
      "- one\n- two\nplain" -> "one two plain",
      "[empty]() [](http://u)" -> "empty",      // empty anchor/URL
      "a - not a bullet" -> "a - not a bullet", // mid-line dash survives
      "####### seven" -> "####### seven",       // >6 hashes: not a heading
      "" -> "")
    val df = cases.map(_._1).toDF("md").select(T.stripMarkdown($"md"))
    assert(df.collect().map(_.getString(0)).toSeq == cases.map(_._2))
  }

  test("codeLangId: syntax signatures, match order, prose fallback") {
    val cases = Seq(
      "def parse_row(line):\n    return line" -> "python",
      "from os.path import join" -> "python",
      "val answer = 42" -> "scala",
      "object Main { def run() = () }" -> "scala",
      "SELECT a, b\nFROM t WHERE x > 0" -> "sql",
      "{\"name\": \"doc\", \"n\": 3}" -> "json",
      "  { \"padded\": true }  " -> "json",
      // start-anchored SQL pattern: prose containing select..from stays text
      "plain prose about select topics from here" -> "text",
      "just words" -> "text",
      "" -> "text")
    val got = cases.map(_._1).toDF("c")
      .select(T.codeLangId($"c")).collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
  }

  test("markdownStats counts structures on raw markdown") {
    val md = "# h\n\n```\nx\n```\n\n[a](http://b) [c](http://d)\n\n- i\n- j\n- k"
    val (h, f, l, i) = T.markdownStats(lit(md))
    val r = spark.range(1).select(h, f, l, i).collect().head
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) == ((1, 1, 2, 3)))
  }
}
