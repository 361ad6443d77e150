package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the large-scale training-data
  * pipeline extensions (BASELINE.json north star): tokenization, shingle
  * generation, language-ID heuristic, quality scoring, fingerprinting.
  *
  * Everything is built from codegen'd built-in functions (split,
  * regexp_*, higher-order array functions, md5) — no UDFs — so the whole
  * per-document feature extraction stays inside one WholeStageCodegen
  * span and scales linearly with no shuffle.
  *
  * Cross-engine determinism: every hash is `md5` (identical in Spark and
  * DuckDB) so the DuckDB oracle can recompute signatures exactly.
  */
object Text {

  /** Whitespace tokens of trimmed text; empty/blank text → empty array. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish sub-token pieces: letter runs, digit runs, single
    * punctuation marks (the shape a byte-pair pre-tokenizer emits). */
  def bpePieces(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def bpeCount(c: Column): Column = size(bpePieces(c))

  /** Binds `expr` to a lambda variable so `f` can reference it many
    * times at the cost of ONE evaluation per row. Higher-order array
    * functions are interpreted (not codegen'd) and re-evaluate any
    * non-lambda subexpression on every element — referencing a
    * tokenization inside a per-shingle lambda costs O(elements) regex
    * re-runs per row without this (measured 20×+ on q20).
    */
  def bound(expr: Column)(f: Column => Column): Column =
    element_at(transform(array(expr), x => f(x)), 1)

  /** Contiguous word n-gram shingles over the token array (n ≥ 1).
    * size < n → empty array. The token array is bound once per row;
    * the per-position slice references the bound value, not the
    * expression tree. */
  def wordShingles(toks: Column, n: Int): Column =
    bound(toks) { ts =>
      when(size(ts) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(ts) - (n - 1)),
          i => concat_ws(" ", slice(ts, i, lit(n)))))
    }

  /** Stopword-marker token count for a language profile. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(x => x: Any): _*)))

  val enMarkers = Seq("the", "a", "of", "and", "is")
  val deMarkers = Seq("der", "die", "das", "und", "ist")
  val frMarkers = Seq("le", "la", "et", "est", "les")

  /** Language-ID heuristic: CJK characters → zh; else argmax of
    * stopword-marker counts with a fixed tie order (en > de > fr); no
    * evidence → "und". A real system swaps in a fastText-style model;
    * the *plumbing* (pure column expression, no shuffle) is the point.
    */
  def langId(text: Column): Column = bound(tokens(lower(text))) { toks =>
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val en = markerCount(toks, enMarkers)
    val de = markerCount(toks, deMarkers)
    val fr = markerCount(toks, frMarkers)
    when(cjk > 0, lit("zh"))
      .when(en >= de && en >= fr && en > 0, lit("en"))
      .when(de >= fr && de > 0, lit("de"))
      .when(fr > 0, lit("fr"))
      .otherwise(lit("und"))
  }

  /** Programming-language heuristic over a text column — the
    * code/prose separation a Stack-style corpus runs before routing
    * documents to code vs natural-language pipelines. First-match-wins
    * over syntax signatures (python def/import, Scala val/def=, SQL
    * select-from, JSON object shape); no signal → "text". Pure
    * codegen'd expressions, same regexes replayed by the oracle. */
  def codeLangId(c: Column): Column =
    when(c.rlike("(?m)^(def [a-z_]+\\(.*\\):|import [a-z_.]+$|from [a-z_.]+ import )"),
      lit("python"))
      .when(c.rlike("(?m)^(val |var |def [a-zA-Z]+.*= *\\{|object |class )"),
        lit("scala"))
      .when(c.rlike("(?is)^\\s*select\\s.+\\sfrom\\s"), lit("sql"))
      .when(c.rlike("(?s)^\\s*\\{.*\\}\\s*$"), lit("json"))
      .otherwise(lit("text"))

  /** Punctuation-character count (explicit class, same regex both
    * engines). */
  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[.,;:!?'\"()\\-]"), lit(0)))

  /** Document quality score in [0,1]: length saturation + low
    * punctuation density + stopword evidence. Deterministic, mirrored in
    * the DuckDB oracle; weights are illustrative.
    */
  def qualityScore(text: Column): Column = bound(tokens(text)) { toks =>
    val nChars = length(text).cast("double")
    val nToks = size(toks).cast("double")
    val lenScore = least(lit(1.0), nChars / 400.0)
    val punctRatio = when(nChars > 0, punctCount(text).cast("double") / nChars)
      .otherwise(lit(0.0))
    val stopRatio = when(nToks > 0,
      markerCount(toks, enMarkers).cast("double") / nToks).otherwise(lit(0.0))
    lit(0.4) * lenScore +
      lit(0.3) * (lit(1.0) - least(lit(1.0), punctRatio * 10.0)) +
      lit(0.3) * least(lit(1.0), stopRatio * 5.0)
  }

  /** PII patterns — RE2-compatible (no lookaround), so the DuckDB
    * oracle applies the literal same regexes. Deliberately
    * conservative/recall-oriented, like production scrubbers: a few
    * false positives beat leaked addresses in a training set. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val phoneRe =
    "(\\+[0-9]{1,2}[-. ])?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** PII redaction: emails → `<EMAIL>`, IPv4 → `<IP>`, phone-shaped
    * numbers → `<PHONE>`, applied in that order (emails first so
    * digit runs inside addresses never half-match as phones). Pure
    * codegen'd regexp_replace chain — the scrub runs inside the scan
    * projection, no extra pass. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Redaction count, staged like [[redactPii]] (each pattern counts
    * on the previous stage's output, so nothing double-counts). */
  def piiCount(c: Column): Column = {
    val e1 = regexp_replace(c, emailRe, "<EMAIL>")
    val e2 = regexp_replace(e1, ipv4Re, "<IP>")
    size(regexp_extract_all(c, lit(emailRe), lit(0))) +
      size(regexp_extract_all(e1, lit(ipv4Re), lit(0))) +
      size(regexp_extract_all(e2, lit(phoneRe), lit(0)))
  }

  // ---- URL functions (crawl metadata: the per-domain signals that
  // domain blocklists, per-host quotas, and provenance audits key on).
  // Same-regex-both-engines discipline as the PII patterns: plain
  // RE2-compatible extracts, so the DuckDB oracle applies the literal
  // same expressions — no parse_url engine-semantics drift. ----

  /** Authority (host) of a URL; '' for non-URLs. */
  def urlHost(c: Column): Column =
    regexp_extract(c, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)

  /** Last dotted label of the host ("com", "org"); '' if none. */
  def urlTld(c: Column): Column =
    regexp_extract(urlHost(c), "\\.([a-z0-9-]+)$", 1)

  /** Path segment count: 0 for no/empty path, else segments between
    * slashes ("/a/b" → 2). */
  def urlPathDepth(c: Column): Column = {
    val path = regexp_extract(c, "^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)?", 1)
    when(path === "" || path === "/", lit(0))
      .otherwise(size(split(path, "/")) - 1)
  }

  /** Whether the URL carries a query string. */
  def urlHasQuery(c: Column): Column = c.contains("?")

  /** Crawl-frontier URL canonicalization — the rule that decides two
    * discovered links are the SAME page so a frontier fetches it once:
    * scheme and host lowercase, default port stripped (`:80` for http,
    * `:443` for https), empty path → `/`, one trailing slash stripped
    * from deeper paths, `utm_*` tracking params dropped (remaining
    * params keep their order — reordering changes semantics for some
    * endpoints), fragment dropped. Pure codegen'd regexp/array
    * expressions plus one interpreted param-filter HOF (bound once per
    * row); a DuckDB oracle replays every step with the same regexes. */
  def urlCanonicalize(c: Column): Column = bound(c) { u =>
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport =
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val rawPath =
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val path0 = when(rawPath === "", lit("/")).otherwise(rawPath)
    val path = when(path0 =!= "/", regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val kept = array_join(
      filter(split(query, "&"), p => !p.startsWith("utm_") && p =!= ""), "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Multi-label public suffixes recognized by
    * [[urlRegisteredDomain]]. A deliberately small embedded subset of
    * the public-suffix list (the full Mozilla PSL is ~9k rules and
    * would ship as a broadcast lookup in production); covers the
    * country-code second-level domains crawl corpora actually hit.
    * Kept sorted so the oracle SQL can mirror it as a literal IN list. */
  val MultiPartSuffixes: Seq[String] = Seq(
    "ac.uk", "co.in", "co.jp", "co.uk", "com.au", "com.br", "com.cn",
    "org.uk")

  /** Registered (pay-level) domain of a host column: the public-suffix
    * plus one label — the key per-domain quotas, domain blocklists,
    * and provenance dedup group on ("www.news.co.uk" → "news.co.uk",
    * "a.b.example.com" → "example.com"). Same split/element
    * arithmetic the DuckDB oracle replays; hosts with one label (or
    * empty) pass through unchanged. */
  def urlRegisteredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    when(n >= 3 && last2.isin(MultiPartSuffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** Normalized text: lower-cased, whitespace collapsed to single
    * spaces, trimmed — the canonical form for exact-dup hashing. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  // ---- Markdown (the format README/docs/code corpora ship in).
  // Pure regexp_replace chains — codegen'd column expressions, no UDF,
  // and the DuckDB oracle can replay the same automaton semantics. ----

  /** Markdown → plain text: drop code-fence lines (keep fenced
    * content), heading markers, emphasis/backtick markers, list
    * bullets; inline links keep their anchor text and drop the URL;
    * then whitespace collapses to single spaces. Stage order matters
    * (fences before bullets: a fence line is not a list item) and each
    * stage feeds the next, so nothing double-strips. */
  def stripMarkdown(c: Column): Column = {
    val noFence = regexp_replace(c, "(?m)^```[a-z]*$", "")
    val noHead = regexp_replace(noFence, "(?m)^#{1,6} ", "")
    val noLink = regexp_replace(noHead, "\\[([^\\]]*)\\]\\([^)]*\\)", "$1")
    val noEmph = regexp_replace(noLink, "(\\*\\*|`)", "")
    val noBullet = regexp_replace(noEmph, "(?m)^- ", "")
    trim(regexp_replace(noBullet, "\\s+", " "))
  }

  /** Markdown structural counts (headings / fenced blocks / inline
    * links / list items) — the doc-corpus quality signals (a README
    * that is all link-list is navigation, not prose). Counted on the
    * RAW markdown, before any stripping. */
  def markdownStats(c: Column): (Column, Column, Column, Column) = (
    size(regexp_extract_all(c, lit("(?m)^#{1,6} "), lit(0))),
    (size(regexp_extract_all(c, lit("(?m)^```[a-z]*$"), lit(0))) / lit(2))
      .cast("int"),
    size(regexp_extract_all(c, lit("\\[[^\\]]*\\]\\([^)]*\\)"), lit(0))),
    size(regexp_extract_all(c, lit("(?m)^- "), lit(0))))

  /** Unicode robustness preprocessing: NFC canonical normalization +
    * supplementary-plane (non-BMP) strip, via the codegen'd
    * [[org.apache.spark.sql.graftvec.NfcNormalize]]. Apply to a text
    * column BEFORE any exact-span / fingerprint / edit-distance
    * operator when the corpus mixes encodings or carries emoji: NFC
    * makes composed and decomposed spellings hash identically, and
    * dropping astral code points removes the one class of characters
    * whose LENGTH UNIT engines disagree on (UTF-8 bytes vs UTF-16
    * units vs code points), which is what narrows the cross-engine
    * parity caveat from "ASCII only" to "non-normalized input only".
    * Deliberately NOT part of [[normalizeText]]: byte-identical
    * corpora must keep hashing byte-identically. */
  def unicodeClean(c: Column): Column =
    org.apache.spark.sql.graftvec.VectorExpressions.nfcNormalize(c)

  /** Whole-document fingerprint: md5 of the normalized text. */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** Rolling-window document fingerprint: the lexicographic min of the
    * md5 of each word `n`-shingle (a 1-permutation MinHash — robust to
    * local edits, unlike [[fingerprint]]). Empty shingle set → null.
    */
  def minShingleFingerprint(c: Column, n: Int = 3): Column =
    array_min(transform(wordShingles(tokens(normalizeText(c)), n), s => md5(s)))
}
