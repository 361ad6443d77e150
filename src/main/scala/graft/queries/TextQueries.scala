package graft.queries

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}
import graft.functions.{Text => T}
import graft.operators.HtmlExtract

/** Text-analysis query inventory over the `documents` table: token
  * counting, language-ID, quality scoring, fingerprinting, token
  * frequencies. All per-document features are narrow codegen'd
  * projections — the only shuffle in the family is q21's token-count
  * aggregation (map-side partial agg first).
  */
object TextQueries {

  /** Shared DuckDB token expression, mirroring Text.tokens. */
  private[queries] val sqlToks =
    "CASE WHEN length(trim(text)) = 0 THEN [] ELSE string_split_regex(trim(text), '\\s+') END"

  /** Shared DuckDB quality-score expression (unrounded), mirroring
    * Text.qualityScore — same IEEE op order as the Spark column. */
  private[queries] val sqlQuality = raw"""0.4 * least(1.0, CAST(length(text) AS DOUBLE) / 400.0)
      + 0.3 * (1.0 - least(1.0,
          CASE WHEN length(text) > 0
               THEN CAST(len(regexp_extract_all(text, '[.,;:!?''"()\-]')) AS DOUBLE)
                    / length(text) ELSE 0.0 END * 10.0))
      + 0.3 * least(1.0,
          CASE WHEN len($sqlToks) > 0
               THEN CAST(len(list_filter($sqlToks, x -> x IN ('the','a','of','and','is'))) AS DOUBLE)
                    / len($sqlToks) ELSE 0.0 END * 5.0)"""

  /** q18 — per-document token/char/punct statistics (whitespace and
    * BPE-ish tokenizations). */
  val q18 = QuerySpec("q18_text_stats",
    (s, dir) => Tables(s, dir, "documents")
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        T.tokenCount(col("text")).cast("long").as("n_tokens"),
        T.bpeCount(col("text")).cast("long").as("n_bpe"),
        T.punctCount(col("text")).cast("long").as("n_punct"))
      .orderBy("doc_id"),
    Some(raw"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len($sqlToks) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe,
  CAST(len(regexp_extract_all(text, '[.,;:!?''"()\-]')) AS BIGINT) AS n_punct
FROM documents ORDER BY doc_id
"""))

  /** q19 — language-ID heuristic per document plus its agreement with
    * the generator's label. */
  val q19 = QuerySpec("q19_lang_id",
    (s, dir) => Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        T.langId(col("text")).as("lang_pred"))
      .withColumn("agree", (col("lang") === col("lang_pred")).cast("boolean"))
      .orderBy("doc_id"),
    Some("""
WITH scored AS (
  SELECT doc_id, lang,
    len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS cjk,
    len(list_filter(CASE WHEN length(trim(lower(text))) = 0 THEN []
          ELSE string_split_regex(trim(lower(text)), '\s+') END,
        t -> t IN ('the','a','of','and','is'))) AS en,
    len(list_filter(CASE WHEN length(trim(lower(text))) = 0 THEN []
          ELSE string_split_regex(trim(lower(text)), '\s+') END,
        t -> t IN ('der','die','das','und','ist'))) AS de,
    len(list_filter(CASE WHEN length(trim(lower(text))) = 0 THEN []
          ELSE string_split_regex(trim(lower(text)), '\s+') END,
        t -> t IN ('le','la','et','est','les'))) AS fr
  FROM documents
)
SELECT doc_id, lang,
  CASE WHEN cjk > 0 THEN 'zh'
       WHEN en >= de AND en >= fr AND en > 0 THEN 'en'
       WHEN de >= fr AND de > 0 THEN 'de'
       WHEN fr > 0 THEN 'fr'
       ELSE 'und' END AS lang_pred,
  (lang = CASE WHEN cjk > 0 THEN 'zh'
       WHEN en >= de AND en >= fr AND en > 0 THEN 'en'
       WHEN de >= fr AND de > 0 THEN 'de'
       WHEN fr > 0 THEN 'fr'
       ELSE 'und' END) AS agree
FROM scored ORDER BY doc_id
"""))

  /** q20 — quality score + whole-doc and min-shingle fingerprints. */
  val q20 = QuerySpec("q20_quality_fingerprint",
    (s, dir) => Tables(s, dir, "documents")
      .select(col("doc_id"),
        round(T.qualityScore(col("text")), 6).as("quality"),
        T.fingerprint(col("text")).as("fp"),
        T.minShingleFingerprint(col("text"), 3).as("min_shingle_fp"))
      .orderBy("doc_id"),
    Some("""
WITH base AS (
  SELECT doc_id, text,
    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
    CASE WHEN length(trim(text)) = 0 THEN []
         ELSE string_split_regex(trim(text), '\s+') END AS toks,
    CAST(length(text) AS DOUBLE) AS n_chars,
    CAST(len(regexp_extract_all(text, '[.,;:!?''"()\-]')) AS DOUBLE) AS n_punct
  FROM documents
), feat AS (
  SELECT doc_id, norm,
    least(1.0, n_chars / 400.0) AS len_score,
    CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio,
    CASE WHEN len(toks) > 0 THEN
      CAST(len(list_filter(toks,
        t -> t IN ('the','a','of','and','is'))) AS DOUBLE) / len(toks)
      ELSE 0.0 END AS stop_ratio
  FROM base
), shingled AS (
  SELECT doc_id,
    CASE WHEN length(norm) = 0 THEN []
         ELSE string_split_regex(norm, '\s+') END AS ntoks
  FROM base
)
SELECT f.doc_id,
  round(0.4 * len_score + 0.3 * (1.0 - least(1.0, punct_ratio * 10.0))
      + 0.3 * least(1.0, stop_ratio * 5.0), 6) AS quality,
  md5(b.norm) AS fp,
  CASE WHEN len(s.ntoks) < 3 THEN NULL ELSE
    list_min([md5(array_to_string(s.ntoks[i:i+2], ' '))
              FOR i IN range(1, len(s.ntoks) - 1)])
  END AS min_shingle_fp
FROM feat f
JOIN base b USING (doc_id)
JOIN shingled s ON s.doc_id = f.doc_id
ORDER BY f.doc_id
"""))

  /** q21 — global token frequencies (explode + aggregate): top 20 by
    * count. Map-side partial aggregation keeps the shuffle tiny: only
    * (token, partial_count) pairs move. */
  val q21 = QuerySpec("q21_token_freq",
    (s, dir) => Tables(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism) // input balancing
      .select(explode(T.tokens(lower(col("text")))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
      .limit(20),
    Some("""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT unnest(CASE WHEN length(trim(lower(text))) = 0 THEN []
    ELSE string_split_regex(trim(lower(text)), '\s+') END) AS token
  FROM documents
)
GROUP BY token ORDER BY n DESC, token LIMIT 20
"""))

  /** q85 — approximate heavy hitters: `freqItems` (the Karp/lossy-
    * counting family — the 100 TB substitute for an exact global token
    * sort when only the heavy tail matters). The sketch's CONTENT is
    * partition-order-dependent, but its GUARANTEE is not: every item
    * with relative frequency > support is always returned. The
    * projection therefore checks containment of the exact top-10
    * (each ~3.4% ≫ the 1% support here) — a deterministic boolean,
    * TRUE in the oracle — alongside the exact counts, which DuckDB
    * verifies outright. Exact counterpart: q21.
    */
  val q85 = QuerySpec("q85_freq_items",
    (s, dir) => {
      val toks = Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(explode(T.tokens(lower(col("text")))).as("token"))
      val exactTop = toks.groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("token")).limit(10)
      val sketch = toks.stat.freqItems(Array("token"), 0.01) // one row
      exactTop.crossJoin(broadcast(sketch))
        .select(col("token"), col("n"),
          array_contains(col("token_freqItems"), col("token")).as("in_sketch"))
        .orderBy(desc("n"), asc("token"))
    },
    Some("""
SELECT token, CAST(count(*) AS BIGINT) AS n, TRUE AS in_sketch
FROM (
  SELECT unnest(CASE WHEN length(trim(lower(text))) = 0 THEN []
    ELSE string_split_regex(trim(lower(text)), '\s+') END) AS token
  FROM documents
)
GROUP BY token ORDER BY n DESC, token LIMIT 10
"""))

  /** q86 — deterministic stratified sampling (`operators.Sampling`):
    * the data-mixing primitive. Inclusion is a pure function of
    * md5(doc_id) — no RNG, no partition sensitivity — so the DuckDB
    * oracle recomputes the EXACT member set and bucket values: the
    * strongest possible check for a sampler (a seeded `df.sample`
    * could only ever be rows-only). Mix: en 50%, de 25%, rest 10%.
    */
  val q86 = QuerySpec("q86_stratified_sample",
    (s, dir) => {
      import graft.operators.Sampling
      Sampling.sampleStratified(Tables(s, dir, "documents"),
          col("doc_id"), col("lang"),
          Map("en" -> 0.5, "de" -> 0.25), defaultFraction = 0.1)
        .select(col("doc_id"), col("lang"),
          Sampling.hashBucket(col("doc_id")).as("bucket"))
        .orderBy("doc_id")
    },
    Some("""
SELECT doc_id, lang,
  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
    % 1000000 AS bucket
FROM documents
WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
    % 1000000
  < CASE WHEN lang = 'en' THEN 500000
         WHEN lang = 'de' THEN 250000 ELSE 100000 END
ORDER BY doc_id
"""))

  /** q87 — sequence packing (`operators.Packing`): the corpus token
    * stream chunked into 512-token training windows in doc_id order —
    * every window exactly full except the last (zero padding waste).
    * The running count is a two-phase distributed prefix sum (no
    * single-partition window); all arithmetic is integer-exact, so
    * the oracle recomputes the identical packing.
    */
  val q87 = QuerySpec("q87_sequence_pack",
    (s, dir) => graft.operators.Packing.packSequences(
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          T.tokenCount(col("text")).cast("long").as("n")),
      "doc_id", "n", capacity = 512,
      partitions = s.sparkContext.defaultParallelism),
    Some(raw"""
WITH t AS (
  SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n FROM documents
), c AS (
  SELECT doc_id, n,
    CAST(sum(n) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM t WHERE n > 0
), s AS (
  SELECT doc_id, n, cum - n AS "start", cum,
    unnest(generate_series((cum - n) // 512, (cum - 1) // 512)) AS seq
  FROM c
)
SELECT seq, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(LEAST(cum, (seq + 1) * 512) - GREATEST("start", seq * 512))
    AS BIGINT) AS n_tokens,
  min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM s GROUP BY seq ORDER BY seq
"""))

  /** q88 — repetition quality signals (the Gopher-rule family): per
    * document, type-token ratio and the fraction of bigrams taken by
    * the single most repeated bigram, plus the keep verdict at
    * Gopher-ish thresholds. Repetitious machine-generated text scores
    * high top-bigram mass and low TTR — the cheap filter that runs
    * before any model-based scoring. One doc-keyed shuffle; verdicts
    * computed from the ROUNDED projections in both engines so the
    * boolean can't straddle a float boundary.
    */
  val q88 = QuerySpec("q88_repetition",
    (s, dir) => {
      val base = Tables(s, dir, "documents")
        .select(col("doc_id"), T.tokens(T.normalizeText(col("text"))).as("toks"))
      val stats = base.select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
      val big = base
        .select(col("doc_id"), explode(T.wordShingles(col("toks"), 2)).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("top_c"), sum("c").as("n_bg"))
      stats.join(big, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          when(col("n_tokens") > 0,
            round(col("n_distinct").cast("double") / col("n_tokens"), 6))
            .otherwise(lit(0.0)).as("ttr"),
          coalesce(round(col("top_c").cast("double") / col("n_bg"), 6),
            lit(0.0)).as("top_bigram_frac"))
        .withColumn("keep",
          col("ttr") >= 0.2 && col("top_bigram_frac") <= 0.18)
        .orderBy("doc_id")
    },
    Some(raw"""
WITH t AS (
  SELECT doc_id,
    CASE WHEN length(norm) = 0 THEN []
         ELSE string_split_regex(norm, '\s+') END AS toks
  FROM (SELECT doc_id,
      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
    FROM documents)
), s AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
    CASE WHEN len(toks) < 2 THEN []
         ELSE [array_to_string(toks[i:i+1], ' ')
               FOR i IN range(1, len(toks))] END AS bgs
  FROM t
), b AS (
  SELECT doc_id, bg, count(*) AS c
  FROM (SELECT doc_id, unnest(bgs) AS bg FROM s) GROUP BY 1, 2
), m AS (
  SELECT doc_id, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS n_bg
  FROM b GROUP BY 1
), proj AS (
  SELECT s.doc_id, n_tokens,
    CASE WHEN n_tokens > 0 THEN round(n_distinct * 1.0 / n_tokens, 6)
         ELSE 0.0 END AS ttr,
    coalesce(round(top_c * 1.0 / n_bg, 6), 0.0) AS top_bigram_frac
  FROM s LEFT JOIN m ON s.doc_id = m.doc_id
)
SELECT doc_id, n_tokens, ttr, top_bigram_frac,
  ttr >= 0.2 AND top_bigram_frac <= 0.18 AS keep
FROM proj ORDER BY doc_id
"""))

  /** q90 — PII scrubbing (emails / IPv4 / phone shapes → typed
    * placeholders): the compliance pass every served training set
    * runs. RE2-compatible patterns so the oracle applies the LITERAL
    * same regexes — redacted text and staged counts compare exactly
    * (this corpus is synthetic word-soup, so counts are typically 0
    * and the text round-trips; TextSpec drives the same expressions
    * over crafted strings with real emails/IPs/phones). */
  val q90 = QuerySpec("q90_pii_redact",
    (s, dir) => Tables(s, dir, "documents")
      .select(col("doc_id"),
        T.redactPii(col("text")).as("clean_text"),
        T.piiCount(col("text")).cast("long").as("n_pii"))
      .orderBy("doc_id"),
    Some(raw"""
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
    '(\+[0-9]{1,2}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b',
    '<PHONE>', 'g') AS clean_text,
  CAST(
    len(regexp_extract_all(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
    + len(regexp_extract_all(regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b'))
    + len(regexp_extract_all(regexp_replace(regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        '(\+[0-9]{1,2}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b'))
    AS BIGINT) AS n_pii
FROM documents ORDER BY doc_id
"""))

  /** q78 — the composed corpus-prep pipeline a training-data user runs
    * end-to-end: language-ID filter (en) → quality floor → exact dedup
    * (keep-min-id per normalized-content fingerprint). One declarative
    * plan: two narrow codegen'd projections and a single fingerprint
    * groupBy shuffle — the operators compose without materialization
    * barriers, which is the whole point of building them as Column
    * expressions rather than stages.
    */
  val q78 = QuerySpec("q78_corpus_prep",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      val doubled = d.unionByName(
        d.withColumn("doc_id", col("doc_id") + 100000))
      doubled
        .withColumn("lang_pred", T.langId(col("text")))
        .withColumn("quality", round(T.qualityScore(col("text")), 6))
        .where(col("lang_pred") === "en" && col("quality") >= 0.4)
        .groupBy(T.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keeper"),
          count(lit(1)).as("n_copies"),
          round(min(col("quality")), 6).as("quality"))
        .select(col("fp"), col("keeper"),
          col("n_copies").cast("long").as("n_copies"), col("quality"))
        .orderBy("fp")
    },
    Some("""
WITH doubled AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
), toks AS (
  SELECT doc_id, text,
    CASE WHEN length(trim(lower(text))) = 0 THEN []
         ELSE string_split_regex(trim(lower(text)), '\s+') END AS lt,
    CASE WHEN length(trim(text)) = 0 THEN []
         ELSE string_split_regex(trim(text), '\s+') END AS t
  FROM doubled
), scored AS (
  SELECT doc_id, text,
    CASE WHEN len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) > 0 THEN 'zh'
         WHEN len(list_filter(lt, x -> x IN ('the','a','of','and','is'))) >=
              len(list_filter(lt, x -> x IN ('der','die','das','und','ist')))
          AND len(list_filter(lt, x -> x IN ('the','a','of','and','is'))) >=
              len(list_filter(lt, x -> x IN ('le','la','et','est','les')))
          AND len(list_filter(lt, x -> x IN ('the','a','of','and','is'))) > 0 THEN 'en'
         WHEN len(list_filter(lt, x -> x IN ('der','die','das','und','ist'))) >=
              len(list_filter(lt, x -> x IN ('le','la','et','est','les')))
          AND len(list_filter(lt, x -> x IN ('der','die','das','und','ist'))) > 0 THEN 'de'
         WHEN len(list_filter(lt, x -> x IN ('le','la','et','est','les'))) > 0 THEN 'fr'
         ELSE 'und' END AS lang_pred,
    round(0.4 * least(1.0, CAST(length(text) AS DOUBLE) / 400.0)
      + 0.3 * (1.0 - least(1.0,
          CASE WHEN length(text) > 0
               THEN CAST(len(regexp_extract_all(text, '[.,;:!?''"()\-]')) AS DOUBLE)
                    / length(text) ELSE 0.0 END * 10.0))
      + 0.3 * least(1.0,
          CASE WHEN len(t) > 0
               THEN CAST(len(list_filter(t, x -> x IN ('the','a','of','and','is'))) AS DOUBLE)
                    / len(t) ELSE 0.0 END * 5.0), 6) AS quality
  FROM toks
)
SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
  min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n_copies,
  round(min(quality), 6) AS quality
FROM scored
WHERE lang_pred = 'en' AND quality >= 0.4
GROUP BY 1 ORDER BY fp
"""))

  /** q83 — LEARNED-BPE encoding (trained merge table, broadcast-join
    * application — `operators.Bpe`): trains on the corpus itself, then
    * encodes every document. Piece SEQUENCES are a function of the
    * trained merges (not reasonably re-derivable in the oracle), so —
    * like q62 — the projection carries the encoder's CONTRACTS as
    * booleans (TRUE literals in the oracle): pieces reassemble the
    * normalized tokens exactly (losslessness), and the piece count
    * lies in [token count, non-space char count] (BpeSpec pins the
    * merge algebra itself).
    */
  val q83 = QuerySpec("q83_bpe_encode",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val trained = graft.operators.Bpe.train(docs, "text",
        numMerges = 64, maxWords = 5000)
      graft.operators.Bpe
        .encode(docs, "doc_id", "text", graft.operators.Bpe.vocabDf(s, trained))
        .select(col("doc_id"),
          T.tokenCount(col("text")).cast("long").as("n_tokens"),
          (concat_ws("", col("bpe_pieces")) ===
            concat_ws("", T.tokens(T.normalizeText(col("text")))))
            .as("roundtrip_ok"),
          size(col("bpe_pieces")).cast("long")
            .between(T.tokenCount(col("text")),
              length(regexp_replace(T.normalizeText(col("text")), " ", "")))
            .as("bounds_ok"))
        .orderBy("doc_id")
    },
    Some(raw"""
SELECT doc_id,
  CAST(len($sqlToks) AS BIGINT) AS n_tokens,
  TRUE AS roundtrip_ok, TRUE AS bounds_ok
FROM documents ORDER BY doc_id
"""))

  /** q94 — per-source quality quota (data mixing): each source keeps
    * its top ⌈20%⌉ documents by quality score (doc_id tie-break) — the
    * quota-curation step that balances a mixture before training.
    * One exchange keyed by source serves both windows (rank + size);
    * the quota is integer arithmetic (⌈n/5⌉) so both engines agree
    * exactly. At 100 TB source counts are modest and per-source
    * partitions large — the same pass would run with
    * WindowGroupLimit pruning when only kept rows are projected.
    */
  val q94 = QuerySpec("q94_source_quota",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bySrc = Window.partitionBy("source")
      val w = bySrc.orderBy(desc("quality"), asc("doc_id"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          round(T.qualityScore(col("text")), 6).as("quality"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n_src", count(lit(1)).over(bySrc))
        .withColumn("keep", col("rk") <= expr("(n_src + 4) div 5"))
        .select("doc_id", "source", "quality", "rk", "keep")
        .orderBy("doc_id")
    },
    Some(raw"""
WITH q AS (
  SELECT doc_id, source, round($sqlQuality, 6) AS quality
  FROM documents
), r AS (
  SELECT doc_id, source, quality,
    row_number() OVER (PARTITION BY source
                       ORDER BY quality DESC, doc_id) AS rk,
    count(*) OVER (PARTITION BY source) AS n_src
  FROM q
)
SELECT doc_id, source, quality, CAST(rk AS BIGINT) AS rk,
  rk <= (n_src + 4) // 5 AS keep
FROM r ORDER BY doc_id
"""))

  /** q95 — weighted systematic sampling by token budget: each doc's
    * mass = n_tokens × source weight; docs are laid out on a
    * deterministically-shuffled line (md5(doc_id) order) and one pick
    * lands at every S-token-mass boundary — length- and
    * weight-proportional selection with an exact integer pick count
    * (mass > S docs get multiple picks), the way an epoch mixture is
    * drawn against a token budget. The cumulative mass reuses q87's
    * two-phase prefix sum (local windows + driver-prefixed partition
    * totals) — no single-partition global window at any scale.
    */
  val q95 = QuerySpec("q95_weighted_sample",
    (s, dir) => {
      val step = 2000
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          T.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("w",
          expr("CAST(regexp_extract(source, '[0-9]+', 0) AS BIGINT) % 3 + 1"))
        .withColumn("mass", col("n_tokens") * col("w"))
        .where(col("mass") > 0)
        .withColumn("okey", md5(col("doc_id").cast("string")))
      graft.operators.Packing.withCumulativeSum(docs, "okey", "mass", 32)
        .withColumn("n_picks",
          expr(s"cum div $step - (cum - mass) div $step"))
        .select(col("doc_id"), col("source"), col("mass"), col("n_picks"),
          (col("n_picks") > 0).as("keep"))
        .orderBy("doc_id")
    },
    Some(raw"""
WITH t AS (
  SELECT doc_id, source,
    CAST(len($sqlToks) AS BIGINT) AS n_tokens,
    CAST(regexp_extract(source, '[0-9]+', 0) AS BIGINT) % 3 + 1 AS w
  FROM documents
), m AS (
  SELECT doc_id, source, n_tokens * w AS mass,
    md5(CAST(doc_id AS VARCHAR)) AS okey
  FROM t WHERE n_tokens * w > 0
), c AS (
  SELECT doc_id, source, mass,
    CAST(sum(mass) OVER (ORDER BY okey
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM m
)
SELECT doc_id, source, mass,
  cum // 2000 - (cum - mass) // 2000 AS n_picks,
  (cum // 2000 - (cum - mass) // 2000) > 0 AS keep
FROM c ORDER BY doc_id
"""))

  /** q41 — document chunking (`Chunking.chunk`): 32-token windows
    * with 8-token overlap, stable (doc_id, chunk_idx) provenance, a
    * trailing window contained in its predecessor dropped. The window
    * split every training / RAG pipeline runs between cleaning and
    * tokenization — pure narrow transform, zero shuffles.
    */
  val q41 = QuerySpec("q41_chunking",
    (s, dir) => graft.operators.Chunking.chunk(
        Tables(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 32, overlap = 8)
      .orderBy("doc_id", "chunk_idx"),
    Some(raw"""
WITH t AS (
  SELECT doc_id,
    CASE WHEN length(norm) = 0 THEN []
         ELSE string_split_regex(norm, '\s+') END AS toks
  FROM (SELECT doc_id,
      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
    FROM documents)
), s AS (
  SELECT doc_id, toks, len(toks) AS n,
    unnest(range(0, len(toks), 24)) AS start
  FROM t WHERE len(toks) > 0
)
SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_idx,
  CAST(start AS BIGINT) AS start,
  CAST(LEAST(32, n - start) AS BIGINT) AS n_chunk_tokens,
  array_to_string(toks[start + 1 : start + 32], ' ') AS chunk_text
FROM s WHERE start = 0 OR n > start + 8
ORDER BY doc_id, chunk_idx
"""))

  /** q42 — domain-mixture reweighting (`Sampling.mixToTarget`): keep
    * a corpus whose token mass matches target shares 50/30/20 over
    * three sources (the rest drop), the binding source kept whole.
    * One tiny per-source agg + a broadcast of |sources| fractions
    * back onto the corpus; membership is the engine-standard md5
    * hash — the oracle recomputes the exact kept set.
    */
  val q42 = QuerySpec("q42_mix_to_target",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          T.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.operators.Sampling.mixToTarget(docs, "doc_id", "source", "n_tokens",
          Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), salt = "mix")
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("share"), round(col("frac"), 6).as("frac"), col("keep"))
        .orderBy("doc_id")
    },
    Some(raw"""
WITH d AS (
  SELECT doc_id, source, CAST(len($sqlToks) AS BIGINT) AS n_tokens
  FROM documents
), m AS (
  SELECT source, CAST(sum(n_tokens) AS DOUBLE) AS m,
    CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3
                WHEN 'src2' THEN 0.2 ELSE 0.0 END AS share
  FROM d GROUP BY source
), tt AS (
  SELECT min(m / share) AS t FROM m WHERE share > 0 AND m > 0
), f AS (
  SELECT source, share,
    CASE WHEN share > 0 AND m > 0 THEN LEAST(1.0, share * tt.t / m)
         ELSE 0.0 END AS frac
  FROM m, tt
)
SELECT d.doc_id, d.source, d.n_tokens, f.share,
  round(f.frac, 6) AS frac,
  CAST(concat('0x', substr(md5(concat(CAST(d.doc_id AS VARCHAR), 'mix')), 1, 8))
    AS BIGINT) % 1000000 < floor(f.frac * 1000000) AS keep
FROM d JOIN f USING (source)
ORDER BY doc_id
"""))

  /** q131 — temperature-scaled source mixing
    * (`Sampling.temperatureMix`, T = 0.5): target shares come from
    * the DATA (mₛ^T / Σ mₜ^T over observed token masses — the
    * GPT-3 / The Pile / mT5 sampling rule; T < 1 upweights small
    * sources), not a driver map as in q42. Everything stays
    * distributed: two |sources|-row aggs + one broadcast of fractions
    * back onto the corpus; the binding source after temperature is
    * kept whole (frac pinned to the literal 1.0 in BOTH engines via
    * the m/share = min comparison, not a float round-trip);
    * membership is the engine-standard md5 bucket. The oracle replays
    * mass → power → normalizer → binding scale → fraction → the exact
    * kept set (pow over integer-valued masses — both engines' IEEE
    * pow agree, pinned by the hash compare).
    */
  val q131 = QuerySpec("q131_temperature_mix",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          T.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.operators.Sampling.temperatureMix(docs, "doc_id", "source",
          "n_tokens", temperature = 0.5, salt = "temp")
        .select(col("doc_id"), col("source"), col("n_tokens"),
          round(col("share"), 6).as("share"),
          round(col("frac"), 6).as("frac"), col("keep"))
        .orderBy("doc_id")
    },
    Some(raw"""
WITH d AS (
  SELECT doc_id, source, CAST(len($sqlToks) AS BIGINT) AS n_tokens
  FROM documents
), m AS (
  SELECT source, CAST(sum(n_tokens) AS DOUBLE) AS m,
    CASE WHEN sum(n_tokens) > 0
         THEN pow(CAST(sum(n_tokens) AS DOUBLE), 0.5) ELSE 0.0 END AS w
  FROM d GROUP BY source
), zz AS (
  SELECT sum(w) AS z FROM m
), sh AS (
  SELECT source, m, CASE WHEN zz.z > 0 THEN w / zz.z ELSE 0.0 END AS share
  FROM m, zz
), tt AS (
  SELECT min(m / share) AS t FROM sh WHERE share > 0 AND m > 0
), f AS (
  SELECT source, share,
    CASE WHEN share > 0 AND m > 0 AND m / share = tt.t THEN 1.0
         WHEN share > 0 AND m > 0 THEN LEAST(1.0, share * tt.t / m)
         ELSE 0.0 END AS frac
  FROM sh, tt
)
SELECT d.doc_id, d.source, d.n_tokens,
  round(f.share, 6) AS share,
  round(f.frac, 6) AS frac,
  CAST(concat('0x', substr(md5(concat(CAST(d.doc_id AS VARCHAR), 'temp')), 1, 8))
    AS BIGINT) % 1000000 < floor(f.frac * 1000000) AS keep
FROM d JOIN f USING (source)
ORDER BY doc_id
"""))

  /** q47 — model-based quality filtering: hashed bag-of-words linear
    * classifier (fastText-style), weights on a broadcast, scorer a
    * single narrow codegen'd projection. The oracle recomputes every
    * bucket (same md5 fold) and every weight (same index formula) and
    * sums in the same token order — bit-identical logits.
    */
  val q47 = QuerySpec("q47_quality_classifier",
    (s, dir) => graft.operators.QualityClassifier.score(
        Tables(s, dir, "documents"), "doc_id", "text",
        graft.operators.QualityClassifier.demoWeights(1024))
      .orderBy("doc_id"),
    Some(raw"""
WITH t AS (
  SELECT doc_id,
    CASE WHEN length(norm) = 0 THEN []
         ELSE string_split_regex(norm, '\s+') END AS toks
  FROM (SELECT doc_id,
      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
    FROM documents)
), sc AS (
  SELECT doc_id, len(toks) AS n,
    coalesce(list_sum([
      ((CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 1024)
        * 2654435761 % 2001 - 1000) / 1000.0
      FOR tok IN toks]), 0.0) AS raw
  FROM t
), p AS (
  SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
    round(1.0 / (1.0 + exp(-(raw / greatest(CAST(n AS DOUBLE), 1.0)))), 6)
      AS prob
  FROM sc
)
SELECT doc_id, n_tokens, prob, prob >= 0.5 AS keep FROM p ORDER BY doc_id
"""))

  /** q23 — LM perplexity scoring (the CCNet fluency filter): bigram
    * add-one LM trained on the deterministic reference subset
    * (doc_id % 10 = 0), every document scored by mean bigram log-prob
    * and ppl = exp(−mean). The per-doc sum folds (position, logp)
    * pairs in position order on both engines, so the doubles agree
    * bit-for-bit before rounding.
    */
  val q23 = QuerySpec("q23_lm_perplexity",
    (s, dir) => graft.operators.LmScore.perplexity(
        Tables(s, dir, "documents"), "doc_id", "text",
        col("doc_id") % 10 === 0)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id"),
    Some(raw"""
WITH t AS (
  SELECT doc_id,
    CASE WHEN length(norm) = 0 THEN []
         ELSE string_split_regex(norm, '\s+') END AS toks,
    doc_id % 10 = 0 AS is_ref
  FROM (SELECT doc_id,
      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
    FROM documents)
), uni AS (
  SELECT w1, count(*) AS c1
  FROM (SELECT unnest(toks) AS w1 FROM t WHERE is_ref) GROUP BY w1
), v AS (SELECT count(*) AS v FROM uni),
bi AS (
  SELECT g, count(*) AS c2
  FROM (SELECT toks[i] || ' ' || toks[i+1] AS g
        FROM (SELECT toks, unnest(range(1, len(toks))) AS i
              FROM t WHERE is_ref))
  GROUP BY g
), s AS (
  SELECT doc_id, i, toks[i] AS w1, toks[i] || ' ' || toks[i+1] AS g
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t)
), j AS (
  SELECT s.doc_id, s.i,
    ln(CAST(coalesce(bi.c2, 0) + 1 AS DOUBLE) / (coalesce(uni.c1, 0) + v.v))
      AS lp
  FROM s LEFT JOIN bi ON s.g = bi.g LEFT JOIN uni ON s.w1 = uni.w1, v
), p AS (
  SELECT doc_id, count(*) AS n, list_sum(list(lp ORDER BY i)) AS sm
  FROM j GROUP BY doc_id
)
SELECT t.doc_id,
  coalesce(p.n, 0) AS n_bigrams,
  round(coalesce(p.sm / p.n, 0.0), 6) AS avg_logp,
  round(exp(-coalesce(p.sm / p.n, 0.0)), 6) AS ppl
FROM t LEFT JOIN p ON t.doc_id = p.doc_id
ORDER BY t.doc_id
"""))

  /** q28 — blocklist phrase filtering (the CCNet/Gopher word-filter
    * stage): every occurrence of every blocklist term counted in ONE
    * broadcast Aho–Corasick pass per document — O(text) however many
    * thousand terms the list holds, vs the O(text × terms) of
    * per-term scanning. The oracle brute-forces each term's start
    * positions (including overlaps — the same semantics the automaton
    * reports), generated from the SAME Scala list so the two can
    * never drift. */
  private val blocklist =
    Seq("slow scan", "big table", "fast merge", "spark", "customer query")

  val q28 = QuerySpec("q28_blocklist_filter",
    (s, dir) => {
      import org.apache.spark.sql.graftvec.{AcAutomaton, AcRef, VectorExpressions}
      val ref = new AcRef(s.sparkContext.broadcast(new AcAutomaton(blocklist)))
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          VectorExpressions.acHitCount(T.normalizeText(col("text")), ref)
            .cast("long").as("n_hits"))
        .withColumn("flagged", col("n_hits") > 0)
        .withColumn("keep", !col("flagged"))
        .orderBy("doc_id")
    },
    Some {
      val terms = blocklist.map(p =>
        s"len([i FOR i IN range(1, length(t) - ${p.length} + 2) " +
          s"IF t[i:i+${p.length - 1}] = '$p'])").mkString(" + ")
      raw"""
WITH n AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents
)
SELECT doc_id, n_hits, n_hits > 0 AS flagged, n_hits = 0 AS keep
FROM (SELECT doc_id, CAST($terms AS BIGINT) AS n_hits FROM n)
ORDER BY doc_id
"""
    })

  /** q26 — the composed modern-curation funnel as ONE lazy plan:
    * language filter (q19's heuristic) → model-based quality floor
    * (q47's broadcast-weights classifier, inlined as a column) →
    * exact-dedup canonicalization AMONG survivors (min-candidate per
    * fingerprint via one window — dedup semantics depend on the
    * upstream filters, as in a real pipeline) → benchmark
    * decontamination (q92's broadcast-gram overlap). Output keeps the
    * whole per-document funnel (each stage's verdict), which is what
    * a production curation run reports; `keep` is the conjunction.
    * Catalyst fuses the three scoring stages into the scan projection
    * — composability is the point: no materialization between stages.
    */
  val q26 = QuerySpec("q26_curation_pipeline",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val corpus = docs.where(col("doc_id") % 97 =!= 0)
      val bench = docs.where(col("doc_id") % 97 === 0)
      val w = graft.operators.QualityClassifier.demoWeights(1024)
      val staged = corpus.select(col("doc_id"),
          T.langId(col("text")).as("lang_pred"),
          graft.operators.QualityClassifier.probCol(s, col("text"), w)
            .as("prob"),
          T.fingerprint(col("text")).as("fp"))
        .withColumn("pass_lang", col("lang_pred") === "en")
        .withColumn("pass_quality", col("prob") >= 0.5)
        .withColumn("cand", col("pass_lang") && col("pass_quality"))
        .withColumn("min_cand", min(when(col("cand"), col("doc_id")))
          .over(Window.partitionBy("fp")))
        .withColumn("is_canonical",
          col("cand") && col("doc_id") === col("min_cand"))
      val hits = graft.operators.Dedup.decontaminate(corpus, bench,
          "doc_id", "text", shingleN = 4)
        .select(col("id").as("doc_id"), col("n_hit"))
      staged.join(hits, Seq("doc_id"))
        .select(col("doc_id"), col("lang_pred"), col("prob"),
          col("pass_lang"), col("pass_quality"), col("is_canonical"),
          col("n_hit"),
          (col("is_canonical") && col("n_hit") === 0).as("keep"))
        .orderBy("doc_id")
    },
    Some(raw"""
WITH base AS (
  SELECT doc_id, text,
    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents WHERE doc_id % 97 <> 0
), lang AS (
  SELECT doc_id,
    CASE WHEN cjk > 0 THEN 'zh'
         WHEN en >= de AND en >= fr AND en > 0 THEN 'en'
         WHEN de >= fr AND de > 0 THEN 'de'
         WHEN fr > 0 THEN 'fr' ELSE 'und' END AS lang_pred
  FROM (SELECT doc_id,
      len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS cjk,
      len(list_filter(CASE WHEN length(trim(lower(text))) = 0 THEN []
            ELSE string_split_regex(trim(lower(text)), '\s+') END,
          t -> t IN ('the','a','of','and','is'))) AS en,
      len(list_filter(CASE WHEN length(trim(lower(text))) = 0 THEN []
            ELSE string_split_regex(trim(lower(text)), '\s+') END,
          t -> t IN ('der','die','das','und','ist'))) AS de,
      len(list_filter(CASE WHEN length(trim(lower(text))) = 0 THEN []
            ELSE string_split_regex(trim(lower(text)), '\s+') END,
          t -> t IN ('le','la','et','est','les'))) AS fr
    FROM base)
), prob AS (
  SELECT doc_id,
    round(1.0 / (1.0 + exp(-(raw / greatest(CAST(n AS DOUBLE), 1.0)))), 6)
      AS prob
  FROM (SELECT doc_id, len(toks) AS n,
      coalesce(list_sum([
        ((CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 1024)
          * 2654435761 % 2001 - 1000) / 1000.0
        FOR tok IN toks]), 0.0) AS raw
    FROM (SELECT doc_id, CASE WHEN length(norm) = 0 THEN []
            ELSE string_split_regex(norm, '\s+') END AS toks FROM base))
), st AS (
  SELECT b.doc_id, l.lang_pred, p.prob, md5(b.norm) AS fp,
    l.lang_pred = 'en' AS pass_lang, p.prob >= 0.5 AS pass_quality
  FROM base b JOIN lang l USING (doc_id) JOIN prob p USING (doc_id)
), canon AS (
  SELECT *, min(CASE WHEN pass_lang AND pass_quality THEN doc_id END)
      OVER (PARTITION BY fp) AS min_cand
  FROM st
), norm2 AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
  FROM documents
), tok2 AS (
  SELECT doc_id, string_split(t, ' ') AS toks FROM norm2 WHERE t <> ''
), sh AS (
  SELECT DISTINCT doc_id, md5(array_to_string(toks[i:i+3], ' ')) AS h
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 2)) AS i
        FROM tok2 WHERE len(toks) >= 4)
), bench AS (
  SELECT DISTINCT h FROM sh WHERE doc_id % 97 = 0
), hits AS (
  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hit
  FROM sh s JOIN bench USING (h) WHERE s.doc_id % 97 <> 0 GROUP BY 1
)
SELECT c.doc_id, c.lang_pred, c.prob, c.pass_lang, c.pass_quality,
  (c.pass_lang AND c.pass_quality AND c.doc_id = c.min_cand) AS is_canonical,
  coalesce(h.n_hit, 0) AS n_hit,
  (c.pass_lang AND c.pass_quality AND c.doc_id = c.min_cand
    AND coalesce(h.n_hit, 0) = 0) AS keep
FROM canon c LEFT JOIN hits h ON c.doc_id = h.doc_id
ORDER BY c.doc_id
"""))

  /** q105 — within-document repetition signals (the Gopher quality
    * filters, Rae et al. 2021): the most frequent word bigram with its
    * token fraction (tie → lexicographically smallest, deterministic
    * both engines) and the fraction of token positions covered by a
    * trigram repeated WITHIN the same document. Per-doc statistics
    * with no corpus state, so the engine computes them in ONE narrow
    * mapPartitions pass — no explode, no (doc, gram) shuffle; the
    * oracle necessarily rebuilds them relationally (explode + group +
    * window), which is exactly the plan shape the operator avoids. */
  val q105 = QuerySpec("q105_repetition_stats",
    (s, dir) => graft.operators.Repetition
      .stats(Tables(s, dir, "documents"), "doc_id", "text")
      .toDF()
      .select(col("id"), col("n_tokens"), col("top_bigram"),
        col("top_bigram_n"),
        round(col("top_bigram_frac"), 6).as("top_bigram_frac"),
        round(col("dup_trigram_frac"), 6).as("dup_trigram_frac"))
      .orderBy("id"),
    Some(raw"""
WITH t AS (
  SELECT doc_id, CASE WHEN length(norm) = 0 THEN []
         ELSE string_split_regex(norm, '\s+') END AS toks
  FROM (SELECT doc_id,
      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
    FROM documents)
), bg AS (
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM t WHERE len(toks) >= 2)
), bgc AS (
  SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g
), top AS (
  SELECT doc_id, g, c FROM (
    SELECT doc_id, g, c,
      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
    FROM bgc) WHERE rn = 1
), tg AS (
  SELECT doc_id, i - 1 AS p,
    toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS g
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
        FROM t WHERE len(toks) >= 3)
), tgd AS (
  SELECT doc_id, g FROM tg GROUP BY doc_id, g HAVING count(*) > 1
), cov AS (
  SELECT DISTINCT doc_id, cp FROM (
    SELECT tg.doc_id, tg.p + unnest(range(0, 3)) AS cp
    FROM tg JOIN tgd USING (doc_id, g))
), covc AS (
  SELECT doc_id, count(*) AS nc FROM cov GROUP BY doc_id
)
SELECT t.doc_id AS id, CAST(len(toks) AS BIGINT) AS n_tokens,
  coalesce(top.g, '') AS top_bigram,
  CAST(coalesce(top.c, 0) AS BIGINT) AS top_bigram_n,
  round(CASE WHEN len(toks) >= 2
        THEN 2.0 * coalesce(top.c, 0) / len(toks) ELSE 0.0 END, 6)
    AS top_bigram_frac,
  round(coalesce(nc, 0) * 1.0 /
        CASE WHEN len(toks) = 0 THEN 1 ELSE len(toks) END, 6)
    AS dup_trigram_frac
FROM t LEFT JOIN top ON t.doc_id = top.doc_id
LEFT JOIN covc ON t.doc_id = covc.doc_id
ORDER BY id
"""))

  /** q106 — BM25 retrieval-scored selection against a fixed 5-term
    * "target domain" query (`operators.Bm25`): the domain-targeted
    * corpus-selection shape, where only the query's terms matter so
    * the whole pass is one tiny stats aggregate + a narrow scoring
    * projection — no inverted index, no (doc, term) shuffle. The
    * oracle recomputes N/avgdl/df and the Lucene-variant formula in
    * the identical operation order, so the rounded scores hash-match
    * bit-for-bit (same IEEE fold, same ln). */
  val q106 = QuerySpec("q106_bm25_select",
    (s, dir) => graft.operators.Bm25.score(
        Tables(s, dir, "documents"), "doc_id", "text",
        Seq("table", "spark", "fast", "query", "vector"))
      .orderBy("id"),
    Some(raw"""
WITH t AS (
  SELECT doc_id, CASE WHEN length(norm) = 0 THEN []
         ELSE string_split_regex(norm, '\s+') END AS toks
  FROM (SELECT doc_id,
      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
    FROM documents)
), s AS (
  SELECT count(*) AS n, avg(len(toks)) AS avgdl,
    sum(CASE WHEN list_contains(toks, 'table')  THEN 1 ELSE 0 END) AS df0,
    sum(CASE WHEN list_contains(toks, 'spark')  THEN 1 ELSE 0 END) AS df1,
    sum(CASE WHEN list_contains(toks, 'fast')   THEN 1 ELSE 0 END) AS df2,
    sum(CASE WHEN list_contains(toks, 'query')  THEN 1 ELSE 0 END) AS df3,
    sum(CASE WHEN list_contains(toks, 'vector') THEN 1 ELSE 0 END) AS df4
  FROM t
), f AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, len(toks) AS n_toks,
    CAST(len(list_filter(toks, x -> x = 'table'))  AS DOUBLE) AS tf0,
    CAST(len(list_filter(toks, x -> x = 'spark'))  AS DOUBLE) AS tf1,
    CAST(len(list_filter(toks, x -> x = 'fast'))   AS DOUBLE) AS tf2,
    CAST(len(list_filter(toks, x -> x = 'query'))  AS DOUBLE) AS tf3,
    CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS tf4
  FROM t
)
SELECT doc_id AS id, CAST(n_toks AS BIGINT) AS n_tokens,
  round(
    ln((CAST(n AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5) + 1.0)
      * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + ln((CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5) + 1.0)
      * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + ln((CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5) + 1.0)
      * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + ln((CAST(n AS DOUBLE) - CAST(df3 AS DOUBLE) + 0.5) / (CAST(df3 AS DOUBLE) + 0.5) + 1.0)
      * (tf3 * 2.2) / (tf3 + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + ln((CAST(n AS DOUBLE) - CAST(df4 AS DOUBLE) + 0.5) / (CAST(df4 AS DOUBLE) + 0.5) + 1.0)
      * (tf4 * 2.2) / (tf4 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS bm25
FROM f, s ORDER BY id
"""))

  /** q107 — DSIR importance resampling weights (`operators.Dsir`):
    * hashed-bucket unigram models for the target subset (lang = 'en')
    * and the whole corpus, add-one smoothed; every doc scored by the
    * mean log-ratio of its buckets through the broadcast WeightSum
    * path. The oracle retrains both models in SQL from the same md5
    * buckets and folds each doc's log-ratios in position order (the
    * q23/q47 idiom), so the per-doc doubles agree before rounding. */
  val q107 = QuerySpec("q107_dsir_weights",
    (s, dir) => graft.operators.Dsir.importanceWeights(
        Tables(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", dim = 256)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id"),
    Some(raw"""
WITH t AS (
  SELECT doc_id, lang, CASE WHEN length(norm) = 0 THEN []
         ELSE string_split_regex(norm, '\s+') END AS toks
  FROM (SELECT doc_id, lang,
      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
    FROM documents)
), pos AS (
  SELECT doc_id, i - 1 AS pos, lang,
    CAST(concat('0x', substr(md5(toks[i]), 1, 8)) AS BIGINT) % 256 AS b
  FROM (SELECT doc_id, lang, toks, unnest(range(1, len(toks) + 1)) AS i
        FROM t)
), c AS (
  SELECT b, count(*) AS cc,
    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
  FROM pos GROUP BY b
), tot AS (
  SELECT sum(cc) AS nc, sum(ct) AS nt FROM c
), j AS (
  SELECT pos.doc_id, pos.pos,
    ln((ct + 1.0) / (nt + 256)) - ln((cc + 1.0) / (nc + 256)) AS lr
  FROM pos JOIN c USING (b), tot
), perdoc AS (
  SELECT doc_id, list_sum(list(lr ORDER BY pos)) AS raw
  FROM j GROUP BY doc_id
), o AS (
  SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
    round(coalesce(raw, 0.0) /
      greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS log_weight
  FROM t LEFT JOIN perdoc USING (doc_id)
)
SELECT doc_id, n_tokens, log_weight, log_weight > 0 AS keep
FROM o ORDER BY doc_id
"""))

  /** q109 — curation funnel v2, composing the round-7 signal family:
    * Gopher repetition gate (top-bigram ≤ 0.12, dup-trigram ≤ 0.05) →
    * BM25 target-domain floor (≥ 1.0) → EXACT span removal among the
    * survivors (duplications with rejected docs deliberately don't
    * count, as in q26's dedup-among-survivors). Per-doc stage verdicts
    * for every input row; n_removed + md5 of the reconstructed clean
    * text for the kept rows. The oracle replays all three stages —
    * repetition raw fractions, the BM25 formula, and the exact-span
    * machinery re-run on the kept SUBSET — so a drift in any stage,
    * or in the subset the removal sees, breaks the compare. */
  val q109 = QuerySpec("q109_curation_v2",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val rep = graft.operators.Repetition.stats(docs, "doc_id", "text")
        .toDF()
        .select(col("id"), col("n_tokens"),
          (col("top_bigram_frac") <= 0.12 &&
            col("dup_trigram_frac") <= 0.05).as("rep_ok"))
      val bm = graft.operators.Bm25.score(docs, "doc_id", "text",
          Seq("table", "spark", "fast", "query", "vector"))
        .select(col("id"), (col("bm25") >= 1.0).as("bm25_ok"))
      val gates = rep.join(bm, "id")
        .withColumn("keep", col("rep_ok") && col("bm25_ok"))
      val kept = docs.join(
        gates.where(col("keep")).select(col("id").as("doc_id")), "doc_id")
      val cleaned = graft.operators.Dedup.exactRemoveDupSpans(
          kept, "doc_id", "text", minLen = 8, cap = 32)
        .select(col("id"), col("n_removed"),
          md5(col("clean_text")).as("clean_fp"))
      gates.join(cleaned, Seq("id"), "left")
        .select(col("id").as("doc_id"), col("n_tokens"),
          col("rep_ok"), col("bm25_ok"), col("keep"),
          col("n_removed"), col("clean_fp"))
        .orderBy("doc_id")
    },
    Some(raw"""
WITH t AS (
  SELECT doc_id, CASE WHEN length(norm) = 0 THEN []
         ELSE string_split_regex(norm, '\s+') END AS toks
  FROM (SELECT doc_id,
      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
    FROM documents)
), bg AS (
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
        FROM t WHERE len(toks) >= 2)
), bgc AS (
  SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g
), top AS (
  SELECT doc_id, c FROM (
    SELECT doc_id, c,
      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
    FROM bgc) WHERE rn = 1
), tg AS (
  SELECT doc_id, i - 1 AS p,
    toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS g
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
        FROM t WHERE len(toks) >= 3)
), tgd AS (
  SELECT doc_id, g FROM tg GROUP BY doc_id, g HAVING count(*) > 1
), covr AS (
  SELECT DISTINCT doc_id, cp FROM (
    SELECT tg.doc_id, tg.p + unnest(range(0, 3)) AS cp
    FROM tg JOIN tgd USING (doc_id, g))
), covc AS (
  SELECT doc_id, count(*) AS nc FROM covr GROUP BY doc_id
), rep AS (
  SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
    (CASE WHEN len(toks) >= 2
          THEN 2.0 * coalesce(top.c, 0) / len(toks) ELSE 0.0 END) <= 0.12
    AND (coalesce(nc, 0) * 1.0 /
         CASE WHEN len(toks) = 0 THEN 1 ELSE len(toks) END) <= 0.05
    AS rep_ok
  FROM t LEFT JOIN top ON t.doc_id = top.doc_id
  LEFT JOIN covc ON t.doc_id = covc.doc_id
), bs AS (
  SELECT count(*) AS n, avg(len(toks)) AS avgdl,
    sum(CASE WHEN list_contains(toks, 'table')  THEN 1 ELSE 0 END) AS df0,
    sum(CASE WHEN list_contains(toks, 'spark')  THEN 1 ELSE 0 END) AS df1,
    sum(CASE WHEN list_contains(toks, 'fast')   THEN 1 ELSE 0 END) AS df2,
    sum(CASE WHEN list_contains(toks, 'query')  THEN 1 ELSE 0 END) AS df3,
    sum(CASE WHEN list_contains(toks, 'vector') THEN 1 ELSE 0 END) AS df4
  FROM t
), bf AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
    CAST(len(list_filter(toks, x -> x = 'table'))  AS DOUBLE) AS tf0,
    CAST(len(list_filter(toks, x -> x = 'spark'))  AS DOUBLE) AS tf1,
    CAST(len(list_filter(toks, x -> x = 'fast'))   AS DOUBLE) AS tf2,
    CAST(len(list_filter(toks, x -> x = 'query'))  AS DOUBLE) AS tf3,
    CAST(len(list_filter(toks, x -> x = 'vector')) AS DOUBLE) AS tf4
  FROM t
), bm AS (
  SELECT doc_id, round(
    ln((CAST(n AS DOUBLE) - CAST(df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5) + 1.0)
      * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + ln((CAST(n AS DOUBLE) - CAST(df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5) + 1.0)
      * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + ln((CAST(n AS DOUBLE) - CAST(df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5) + 1.0)
      * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + ln((CAST(n AS DOUBLE) - CAST(df3 AS DOUBLE) + 0.5) / (CAST(df3 AS DOUBLE) + 0.5) + 1.0)
      * (tf3 * 2.2) / (tf3 + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + ln((CAST(n AS DOUBLE) - CAST(df4 AS DOUBLE) + 0.5) / (CAST(df4 AS DOUBLE) + 0.5) + 1.0)
      * (tf4 * 2.2) / (tf4 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) >= 1.0 AS bm25_ok
  FROM bf, bs
), gates AS (
  SELECT rep.doc_id, n_tokens, rep_ok, bm25_ok,
    rep_ok AND bm25_ok AS keep
  FROM rep JOIN bm USING (doc_id)
), t2 AS (
  SELECT t.doc_id, toks FROM t JOIN gates USING (doc_id) WHERE keep
), suf AS (
  SELECT doc_id, i - 1 AS p,
    md5(array_to_string(toks[i:i+7], ' ')) AS h,
    toks[i+8:i+31] AS ext,
    array_to_string(toks[i+8:i+31], ' ') AS ext_key
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 6)) AS i
        FROM t2 WHERE len(toks) >= 8)
), dup AS (
  SELECT s.doc_id, s.p, s.h, s.ext, s.ext_key
  FROM suf s JOIN (SELECT h FROM suf GROUP BY h HAVING count(*) > 1) c
    USING (h)
), nbw AS (
  SELECT doc_id, p, ext,
    lag(ext)  OVER w AS pext,
    lead(ext) OVER w AS next_ext
  FROM dup
  WINDOW w AS (PARTITION BY h ORDER BY ext_key, doc_id, p)
), zipped AS (
  SELECT doc_id, p,
    list_transform(list_zip(ext, pext),
      x -> coalesce(struct_extract(x, 1) = struct_extract(x, 2), false)) AS pz,
    list_transform(list_zip(ext, next_ext),
      x -> coalesce(struct_extract(x, 1) = struct_extract(x, 2), false)) AS nz
  FROM nbw
), dd AS (
  SELECT doc_id, p, 8 + greatest(
      coalesce(CASE WHEN list_position(pz, false) = 0 THEN len(pz)
               ELSE list_position(pz, false) - 1 END, 0),
      coalesce(CASE WHEN list_position(nz, false) = 0 THEN len(nz)
               ELSE list_position(nz, false) - 1 END, 0)) AS d
  FROM zipped
), cov AS (
  SELECT DISTINCT doc_id, cp FROM (
    SELECT doc_id, p + unnest(range(0, d)) AS cp FROM dd)
), cl AS (
  SELECT doc_id, list_sort(list(cp)) AS covered FROM cov GROUP BY doc_id
), clean AS (
  SELECT t2.doc_id,
    CAST(len(coalesce(covered, [])) AS BIGINT) AS n_removed,
    md5(coalesce(array_to_string(
      [toks[i + 1] FOR i IN range(0, len(toks))
       IF NOT list_contains(coalesce(covered, []), i)],
      ' '), '')) AS clean_fp
  FROM t2 LEFT JOIN cl USING (doc_id)
)
SELECT gates.doc_id, n_tokens, rep_ok, bm25_ok, keep,
  clean.n_removed, clean.clean_fp
FROM gates LEFT JOIN clean USING (doc_id)
ORDER BY gates.doc_id
"""))

  /** q116 — HTML main-content extraction (boilerplate removal): each
    * document is wrapped in a full deterministic page — head with
    * script/style/title (must be stripped wholesale), a pure-link nav
    * (link density 1.0), on even ids a link-heavy promo div, the text
    * as 15-word `<p>` blocks (density 0), and a link-heavy footer —
    * then [[graft.operators.HtmlExtract.extractMainText]] re-derives
    * the article text by block segmentation + link-density gating.
    * Because the corpus text is single-spaced ASCII, the extracted
    * text must equal the original EXACTLY, so any defect in tag
    * scanning, raw-text skipping, whitespace normalization, or the
    * density arithmetic breaks the compare; the block counters are
    * recomputed by the oracle from the page grammar. */
  val q116 = QuerySpec("q116_html_extract",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      HtmlExtract.extractMainText(HtmlExtract.encodePages(docs))
        .toDF()
        .orderBy("doc_id")
    },
    Some(raw"""
WITH k AS (
  SELECT doc_id, text,
    -- empty/whitespace-only text yields ZERO kept blocks (the engine's
    -- close() drops empty blocks), not the 1 that DuckDB's
    -- string_split('') = [''] would imply
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE CAST(ceil(len(string_split(text, ' ')) / 15.0) AS BIGINT)
    END AS n_kept
  FROM documents)
SELECT doc_id,
  CAST(2 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END + n_kept
     AS BIGINT) AS n_blocks,
  n_kept,
  CASE WHEN n_kept = 0 THEN '' ELSE text END AS extracted
FROM k ORDER BY doc_id
"""))

  /** q119 — markdown → plain text (the README/docs/code-corpus analog
    * of q116): each document is wrapped in deterministic markdown — a
    * heading whose level varies by id, a code fence, its first word as
    * a bold inline link, and 1–3 list items — then
    * [[graft.functions.Text.stripMarkdown]] (pure codegen'd
    * regexp_replace chain, no UDF) must recover heading text, fenced
    * content, anchor text, the document text EXACTLY, and the item
    * texts, with [[graft.functions.Text.markdownStats]] counting the
    * structures on the raw markdown. The synthesis itself is pure
    * column concat, so the whole query is one whole-stage-codegen
    * projection. */
  val q119 = QuerySpec("q119_markdown_strip",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val id = col("doc_id").cast("string")
      val nItems = (col("n_chars") % 3 + 1).cast("int")
      val w1 = element_at(split(col("text"), " "), 1)
      val rest = col("text").substr(length(w1) + 1, length(col("text")))
      val items = array_join(
        transform(sequence(lit(1), nItems),
          j => concat(lit("- item "), j.cast("string"))), "\n")
      val md = concat(
        expr("repeat('#', CAST(doc_id % 3 + 1 AS INT))"), lit(" doc "), id,
        lit("\n\n```\ncode "), id, lit("\n```\n\n[**"), w1,
        lit("**](http://e/"), id, lit(")"), rest, lit("\n\n"), items)
      val (nHead, nFence, nLink, nItem) = T.markdownStats(md)
      docs.select(col("doc_id"),
          T.stripMarkdown(md).as("stripped"),
          nHead.as("n_headings"), nFence.as("n_fences"),
          nLink.as("n_links"), nItem.as("n_items"))
        .orderBy("doc_id")
    },
    Some(raw"""
SELECT doc_id,
  'doc ' || CAST(doc_id AS VARCHAR) || ' code ' || CAST(doc_id AS VARCHAR)
    || ' ' || text || ' ' ||
    CASE CAST(n_chars % 3 + 1 AS INT)
      WHEN 1 THEN 'item 1'
      WHEN 2 THEN 'item 1 item 2'
      ELSE 'item 1 item 2 item 3' END AS stripped,
  CAST(1 AS INT) AS n_headings,
  CAST(1 AS INT) AS n_fences,
  CAST(1 AS INT) AS n_links,
  CAST(n_chars % 3 + 1 AS INT) AS n_items
FROM documents ORDER BY doc_id
"""))

  /** q121 — code/prose routing ([[graft.functions.Text.codeLangId]]):
    * each document is wrapped in a language template by id (python
    * def, scala val, SQL select, JSON object, or left as prose) and
    * the classifier must recover the language FROM THE SYNTAX — the
    * oracle replays the same regexes over the same synthesized code in
    * DuckDB (RE2 semantics on both engines), so a drifted pattern or
    * wrong match order breaks the compare, not just a wrong modulus. */
  val q121 = QuerySpec("q121_code_lang_id",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val id = col("doc_id").cast("string")
      val code = when(col("doc_id") % 5 === 0,
          concat(lit("def fn(x):\n    return x  # "), col("text")))
        .when(col("doc_id") % 5 === 1,
          concat(lit("val x"), id, lit(" = \""), col("text"), lit("\"")))
        .when(col("doc_id") % 5 === 2,
          concat(lit("SELECT col FROM t WHERE id = "), id, lit(" -- "),
            col("text")))
        .when(col("doc_id") % 5 === 3,
          concat(lit("{\"k\": \""), col("text"), lit("\"}")))
        .otherwise(col("text"))
      docs.select(col("doc_id"), T.codeLangId(code).as("code_lang"))
        .withColumn("is_code", col("code_lang") =!= "text")
        .orderBy("doc_id")
    },
    Some(raw"""
WITH c AS (
  SELECT doc_id,
    CASE CAST(doc_id % 5 AS INT)
      WHEN 0 THEN 'def fn(x):' || chr(10) || '    return x  # ' || text
      WHEN 1 THEN 'val x' || CAST(doc_id AS VARCHAR) || ' = "' || text || '"'
      WHEN 2 THEN 'SELECT col FROM t WHERE id = ' || CAST(doc_id AS VARCHAR)
        || ' -- ' || text
      WHEN 3 THEN '{"k": "' || text || '"}'
      ELSE text END AS code
  FROM documents
), l AS (
  SELECT doc_id,
    CASE
      WHEN regexp_matches(code,
        '(?m)^(def [a-z_]+\(.*\):|import [a-z_.]+$$|from [a-z_.]+ import )')
        THEN 'python'
      WHEN regexp_matches(code,
        '(?m)^(val |var |def [a-zA-Z]+.*= *\{|object |class )') THEN 'scala'
      WHEN regexp_matches(code, '(?is)^\s*select\s.+\sfrom\s') THEN 'sql'
      WHEN regexp_matches(code, '(?s)^\s*\{.*\}\s*$$') THEN 'json'
      ELSE 'text' END AS code_lang
  FROM c
)
SELECT doc_id, code_lang, code_lang <> 'text' AS is_code
FROM l ORDER BY doc_id
"""))

  /** q136 — token-budget truncation: the "take the first N tokens"
    * cut every training run makes when a corpus exceeds its compute
    * budget. Documents are admitted in deterministic id order until
    * the cumulative token count reaches the budget (here ⌊total/3⌋ so
    * the query is scale-invariant); the boundary document is admitted
    * PARTIALLY (`tokens_kept` < `n_tokens`) — the budget is hit
    * exactly, zero waste, matching how a packed sequence stream is
    * actually cut (q87's windows just stop mid-document).
    *
    * Scale shape: one |corpus|-row aggregate for the budget, then the
    * same two-phase prefix sum as q87 ([[Packing.withCumulativeSum]]
    * — per-range-partition local windows + a driver prefix over one
    * row per partition, broadcast back). No single-partition global
    * window at any size; the cut itself is a narrow projection over
    * the cumulative column. The oracle replays budget, prefix sum,
    * and the boundary-document arithmetic exactly. */
  val q136 = QuerySpec("q136_token_budget",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"),
          T.tokenCount(col("text")).cast("long").as("n_tokens"))
      val total = docs.agg(sum("n_tokens")).head.getLong(0)
      val budget = total / 3
      graft.operators.Packing.withCumulativeSum(
          docs.where(col("n_tokens") > 0), "doc_id", "n_tokens",
          s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("n_tokens"), col("cum"),
          (col("cum") - col("n_tokens") < budget).as("keep"),
          when(col("cum") - col("n_tokens") < budget,
            least(col("n_tokens"), lit(budget) - (col("cum") - col("n_tokens"))))
            .otherwise(lit(0L)).as("tokens_kept"))
        .orderBy("doc_id")
    },
    Some(raw"""
WITH t AS (
  SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n_tokens FROM documents
), b AS (
  SELECT CAST(sum(n_tokens) // 3 AS BIGINT) AS budget FROM t
), c AS (
  SELECT doc_id, n_tokens,
    CAST(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM t WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, cum,
  cum - n_tokens < b.budget AS keep,
  CASE WHEN cum - n_tokens < b.budget
       THEN least(n_tokens, b.budget - (cum - n_tokens))
       ELSE CAST(0 AS BIGINT) END AS tokens_kept
FROM c, b ORDER BY doc_id
"""))

  /** q141 — per-document TF-IDF keyword extraction: the top-3 terms
    * of every document by term frequency × inverse document frequency
    * — the tagging/routing signal curation dashboards and topic
    * bucketing run over a corpus. Ranking is deliberately
    * INTEGER-ONLY (tf desc, df asc, token asc): it orders by the same
    * two monotone factors as tf·idf but cannot be split by a last-ulp
    * `ln` disagreement between engines — the float score is REPORTED
    * (rounded) but never ordered on. Plan: one explode + two
    * hash-aggregates (doc,term) → (term), a term-keyed join of
    * df onto tf (broadcastable while the vocabulary is small,
    * shuffle-on-term at corpus scale), and a per-doc top-k window.
    * The oracle replays tf, df, the smoothed idf, and the integer
    * rank. */
  val q141 = QuerySpec("q141_tfidf_keywords",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val n = docs.count()
      val toks = docs
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(T.tokens(T.normalizeText(col("text")))).as("tok"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(desc("tf"), asc("df"), asc("tok"))
      tf.join(dfreq, "tok")
        .withColumn("score",
          round(col("tf") * log(lit(n + 1.0) / (col("df") + lit(1L))), 6))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select("doc_id", "rnk", "tok", "tf", "df", "score")
        .orderBy("doc_id", "rnk")
    },
    Some(raw"""
WITH t AS (
  SELECT doc_id, unnest(CASE WHEN length(norm) = 0 THEN []
      ELSE string_split_regex(norm, '\s+') END) AS tok
  FROM (SELECT doc_id,
      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
    FROM documents)
), tf AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2
), dfq AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), nn AS (
  SELECT count(*) AS n FROM documents
), s AS (
  SELECT doc_id, tok, tf, df,
    round(tf * ln((nn.n + 1.0) / (df + 1)), 6) AS score,
    row_number() OVER (PARTITION BY doc_id
      ORDER BY tf DESC, df ASC, tok ASC) AS rnk
  FROM tf JOIN dfq USING (tok), nn
)
SELECT doc_id, rnk, tok, tf, df, score
FROM s WHERE rnk <= 3 ORDER BY doc_id, rnk
"""))

  /** q144 — per-source corpus datasheet: the one-screen report a
    * dataset release ships (a "datasheets for datasets" rollup) —
    * per source: doc count, token mass, empty-doc count, English
    * fraction numerator, distinct-fingerprint count (exact-dup
    * pressure), and mean quality. The mean is computed over INTEGER
    * micro-units (round(quality,6)·10⁶ as a long) so the sum is exact
    * and partition-order-independent — summing raw doubles would make
    * the report nondeterministic across runs at scale (IEEE addition
    * is not associative; the one float op left is a single division,
    * deterministic). Distinct fingerprints use the two-step
    * distinct + count (no countDistinct Expand, the q62 lesson). */
  val q144 = QuerySpec("q144_corpus_datasheet",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("source"),
        T.tokenCount(col("text")).cast("long").as("n_tokens"),
        (length(trim(col("text"))) === 0).cast("long").as("is_empty"),
        (col("lang") === "en").cast("long").as("is_en"),
        round(round(T.qualityScore(col("text")), 6) * 1e6, 0)
          .cast("long").as("q_micro"),
        T.fingerprint(col("text")).as("fp"))
      val agg = base.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("is_empty").as("n_empty"),
        sum("is_en").as("n_en"),
        sum("q_micro").as("qm"))
      val fps = base.select("source", "fp").distinct()
        .groupBy("source").agg(count(lit(1)).as("n_distinct_fp"))
      agg.join(fps, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_empty"), col("n_en"), col("n_distinct_fp"),
          round(col("qm") / (col("n_docs") * lit(1e6)), 6).as("avg_quality"))
        .orderBy("source")
    },
    Some(raw"""
WITH base AS (
  SELECT source,
    CAST(len($sqlToks) AS BIGINT) AS n_tokens,
    CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END AS is_empty,
    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
    CAST(round(round($sqlQuality, 6) * 1e6, 0) AS BIGINT) AS q_micro,
    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
  FROM documents
), agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
    CAST(sum(is_empty) AS BIGINT) AS n_empty,
    CAST(sum(is_en) AS BIGINT) AS n_en,
    CAST(sum(q_micro) AS BIGINT) AS qm
  FROM base GROUP BY source
), fps AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_distinct_fp
  FROM (SELECT DISTINCT source, fp FROM base) GROUP BY source
)
SELECT agg.source, n_docs, n_tokens, n_empty, n_en, n_distinct_fp,
  round(qm / (n_docs * 1e6), 6) AS avg_quality
FROM agg JOIN fps ON agg.source = fps.source
ORDER BY agg.source
"""))

  /** q145 — mixed-language segmentation: documents cut into aligned
    * 15-token blocks, each block language-ID'd with the q19 heuristic,
    * adjacent same-language blocks merged into RUNS (gaps-and-islands)
    * — the "document-level language is a lie" operator: real crawl
    * pages interleave languages (quoted passages, boilerplate in the
    * site language, code-switched forums), and a run-level map is
    * what lets a pipeline route SEGMENTS instead of dropping whole
    * mixed documents. Per-doc windows partition on doc_id (bounded
    * partitions); the run merge is one lag + one running sum on the
    * same window, no extra exchange. The oracle replays block
    * arithmetic, the per-block language formula, and the island
    * numbering. */
  val q145 = QuerySpec("q145_language_runs",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val blocksCol = T.bound(T.tokens(T.normalizeText(col("text")))) { ts =>
        val nb = floor((size(ts) + 14) / lit(15.0)).cast("int")
        when(size(ts) === 0, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), nb),
            i => concat_ws(" ", slice(ts, (i - 1) * 15 + 1, lit(15)))))
      }
      val blocks = docs.select(col("doc_id"),
          posexplode(blocksCol).as(Seq("bpos", "btext")))
        .withColumn("blang", T.langId(col("btext")))
      val w = Window.partitionBy("doc_id").orderBy("bpos")
      val runs = blocks
        .withColumn("new_run",
          when(lag("blang", 1).over(w).isNull ||
            lag("blang", 1).over(w) =!= col("blang"), 1L).otherwise(0L))
        .withColumn("run_idx", sum("new_run").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      runs.groupBy("doc_id", "run_idx", "blang")
        .agg(count(lit(1)).as("n_blocks"), min("bpos").as("first_block"))
        .select(col("doc_id"), col("run_idx"), col("blang").as("lang"),
          col("n_blocks"), col("first_block"))
        .orderBy("doc_id", "run_idx")
    },
    Some(raw"""
WITH t AS (
  SELECT doc_id, CASE WHEN length(norm) = 0 THEN []
       ELSE string_split_regex(norm, '\s+') END AS tt
  FROM (SELECT doc_id,
      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
    FROM documents)
), b AS (
  SELECT doc_id, i - 1 AS bpos,
    array_to_string(tt[(i-1)*15+1:(i-1)*15+15], ' ') AS btext
  FROM (SELECT doc_id, tt, unnest(range(1, (len(tt)+14)//15 + 1)) AS i FROM t)
), lng AS (
  SELECT doc_id, bpos,
    CASE WHEN cjk > 0 THEN 'zh'
         WHEN en >= de AND en >= fr AND en > 0 THEN 'en'
         WHEN de >= fr AND de > 0 THEN 'de'
         WHEN fr > 0 THEN 'fr' ELSE 'und' END AS blang
  FROM (
    SELECT doc_id, bpos,
      len(regexp_extract_all(btext, '[\x{4e00}-\x{9fff}]')) AS cjk,
      len(list_filter(string_split(btext, ' '),
        x -> x IN ('the','a','of','and','is'))) AS en,
      len(list_filter(string_split(btext, ' '),
        x -> x IN ('der','die','das','und','ist'))) AS de,
      len(list_filter(string_split(btext, ' '),
        x -> x IN ('le','la','et','est','les'))) AS fr
    FROM b)
), runs AS (
  SELECT doc_id, bpos, blang,
    CAST(sum(nr) OVER (PARTITION BY doc_id ORDER BY bpos
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_idx
  FROM (
    SELECT doc_id, bpos, blang,
      CASE WHEN lag(blang) OVER (PARTITION BY doc_id ORDER BY bpos)
             IS DISTINCT FROM blang THEN 1 ELSE 0 END AS nr
    FROM lng)
)
SELECT doc_id, run_idx, blang AS lang,
  CAST(count(*) AS BIGINT) AS n_blocks,
  min(bpos) AS first_block
FROM runs GROUP BY doc_id, run_idx, blang
ORDER BY doc_id, run_idx
"""))

  /** q147 — SFT chat-template rendering with loss-mask boundary: each
    * document becomes a (prompt = first 20 tokens, completion = rest)
    * training example rendered through a fixed chat template, plus the
    * TOKEN INDEX where the loss mask turns on (everything before the
    * completion is context, not target — the off-by-one here silently
    * trains on the prompt, the classic SFT-data bug this projection
    * makes auditable). All boundary arithmetic is integer
    * (mask_start = min(n, 20) + role-marker count), the rendering is
    * one codegen'd concat, and the oracle replays both exactly.
    * Documents with ≤ 20 tokens yield an empty completion and are
    * flagged unusable (`usable = false`) rather than dropped — the
    * audit-ledger convention. */
  val q147 = QuerySpec("q147_sft_render",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val out = T.bound(T.tokens(T.normalizeText(col("text")))) { ts =>
        val n = size(ts)
        val k = least(n, lit(20))
        val prompt = concat_ws(" ", slice(ts, lit(1), k))
        val completion = when(n > 20,
          concat_ws(" ", slice(ts, lit(21), n - 20))).otherwise(lit(""))
        val rendered = concat(lit("<|user|> "), prompt,
          lit(" <|assistant|> "), completion)
        struct(
          rendered.as("rendered"),
          (k + lit(2)).cast("long").as("mask_start"),
          (n + lit(2)).cast("long").as("n_tokens"),
          (n > 20).as("usable"))
      }
      docs.select(col("doc_id"), out.as("o"))
        .select(col("doc_id"), col("o.rendered").as("rendered"),
          col("o.mask_start").as("mask_start"),
          col("o.n_tokens").as("n_tokens"), col("o.usable").as("usable"))
        .orderBy("doc_id")
    },
    Some(raw"""
WITH t AS (
  SELECT doc_id, CASE WHEN length(norm) = 0 THEN []
       ELSE string_split_regex(norm, '\s+') END AS tt
  FROM (SELECT doc_id,
      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
    FROM documents)
)
SELECT doc_id,
  '<|user|> ' || coalesce(array_to_string(tt[1:least(len(tt), 20)], ' '), '')
    || ' <|assistant|> '
    || CASE WHEN len(tt) > 20
         THEN coalesce(array_to_string(tt[21:len(tt)], ' '), '')
         ELSE '' END AS rendered,
  CAST(least(len(tt), 20) + 2 AS BIGINT) AS mask_start,
  CAST(len(tt) + 2 AS BIGINT) AS n_tokens,
  len(tt) > 20 AS usable
FROM t ORDER BY doc_id
"""))

  /** q148 — length-bucketed batching: documents grouped into
    * power-of-two token-length buckets (bucket = bit length of the
    * token count — INTEGER-exact via `bin()` string length in both
    * engines, never `log2` whose ulp at exact powers of two differs
    * across libm builds), with per-bucket padded cost (docs ×
    * 2^bits) and padding-waste fraction — the batching-efficiency
    * report that decides bucket boundaries for training/inference
    * serving. Zero-token docs are excluded (they occupy no batch
    * slot, the q87 convention). */
  val q148 = QuerySpec("q148_length_buckets",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      docs.select(T.tokenCount(col("text")).cast("long").as("n"))
        .where(col("n") > 0)
        .withColumn("bits", length(bin(col("n"))).cast("int"))
        .groupBy("bits")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))
        .withColumn("padded",
          col("n_docs") * expr("shiftleft(1L, bits)").cast("long"))
        .withColumn("waste_pct",
          round((col("padded") - col("n_tokens")) / col("padded").cast("double"), 6))
        .select("bits", "n_docs", "n_tokens", "padded", "waste_pct")
        .orderBy("bits")
    },
    Some(raw"""
WITH t AS (
  SELECT CAST(len($sqlToks) AS BIGINT) AS n FROM documents
), b AS (
  SELECT n, CAST(length(bin(n)) AS INT) AS bits FROM t WHERE n > 0
)
SELECT bits, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n) AS BIGINT) AS n_tokens,
  CAST(count(*) * (CAST(1 AS BIGINT) << bits) AS BIGINT) AS padded,
  round((count(*) * (CAST(1 AS BIGINT) << bits) - sum(n))
    / CAST(count(*) * (CAST(1 AS BIGINT) << bits) AS DOUBLE), 6) AS waste_pct
FROM b GROUP BY bits ORDER BY bits
"""))

  /** q151 — deterministic train/val/test split: the engine-standard
    * md5 bucket routes every document to train (90%), val (5%), or
    * test (5%) — content-keyed, so the assignment is stable across
    * runs, partitionings, and corpus growth (a doc never migrates
    * between splits when new data arrives — the property a
    * row_number-based split lacks). The rollup reports per-source ×
    * split counts and token masses so stratification skew is visible
    * at a glance; the oracle replays the bucket arithmetic and the
    * rollup. One narrow projection + one small aggregate. */
  val q151 = QuerySpec("q151_train_val_test",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val bucket = graft.operators.Sampling.hashBucket(col("doc_id"), "split")
      docs.select(col("source"),
          T.tokenCount(col("text")).cast("long").as("n_tokens"),
          when(bucket < 900000L, lit("train"))
            .when(bucket < 950000L, lit("val"))
            .otherwise(lit("test")).as("split"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
        .orderBy("source", "split")
    },
    Some(raw"""
WITH t AS (
  SELECT source,
    CAST(len($sqlToks) AS BIGINT) AS n_tokens,
    CASE WHEN b < 900000 THEN 'train'
         WHEN b < 950000 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT source, text,
      CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), 'split')), 1, 8))
        AS BIGINT) % 1000000 AS b
    FROM documents)
)
SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM t GROUP BY source, split ORDER BY source, split
"""))

  /** q153 — length/quality correlation per source: Pearson r between
    * token count and quality, computed ENTIRELY from integer sums —
    * quality in micro-units (round(q,6)·10⁶ as a long), so Σx, Σy,
    * Σxy, Σx², Σy² are exact longs (partition-order-independent,
    * unlike a raw double corr() whose accumulation order varies run to
    * run), and the only float arithmetic is the one closed-form
    * expression at the end: r = (nΣxy − ΣxΣy) /
    * √((nΣx²−(Σx)²)(nΣy²−(Σy)²)). The report answers the curation
    * question "is my quality score just a length proxy here?" —
    * r → 1 means the two filters are redundant. The SUMS stay exact
    * longs (Σy² ≈ 2·10¹⁶ at sf10, comfortably inside 2⁶³); the
    * closed form itself runs in doubles because the variance PRODUCT
    * n²·Σx²·Σy² exceeds any integer width — both engines convert the
    * same exact longs to the same doubles, so determinism holds. At
    * corpus scales where Σy² itself would overflow, pre-aggregate per
    * shard and combine — the sums are trivially combinable. */
  val q153 = QuerySpec("q153_quality_length_corr",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("source"),
        T.tokenCount(col("text")).cast("long").as("x"),
        round(round(T.qualityScore(col("text")), 6) * 1e6, 0)
          .cast("long").as("y"))
      base.groupBy("source").agg(
          count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("r", {
          // the closed form runs in DOUBLES (identical op structure in
          // the oracle): long arithmetic overflows in the variance
          // product at n·Σy² ≈ 5·10²⁰; the SUMS stay exact longs —
          // that is the determinism claim — and both engines convert
          // the same long to the same double
          val nd = col("n").cast("double")
          val sxd = col("sx").cast("double"); val syd = col("sy").cast("double")
          val sxyd = col("sxy").cast("double")
          val sxxd = col("sxx").cast("double"); val syyd = col("syy").cast("double")
          round((nd * sxyd - sxd * syd) /
            sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)), 6)
        })
        .select("source", "n", "sx", "sy", "r")
        .orderBy("source")
    },
    Some(raw"""
WITH base AS (
  SELECT source,
    CAST(len($sqlToks) AS BIGINT) AS x,
    CAST(round(round($sqlQuality, 6) * 1e6, 0) AS BIGINT) AS y
  FROM documents
), a AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * y) AS BIGINT) AS sxy,
    CAST(sum(x * x) AS BIGINT) AS sxx,
    CAST(sum(y * y) AS BIGINT) AS syy
  FROM base GROUP BY source
)
SELECT source, n, sx, sy,
  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r
FROM a ORDER BY source
"""))

  /** q154 — tokenizer fertility report: per language, characters per
    * BPE-ish piece and pieces per whitespace word — THE metric for
    * how well a tokenizer fits a language (high fertility = more
    * pieces per word = more compute per byte of training signal; the
    * reason multilingual models report per-language fertility tables).
    * All numerators/denominators accumulate as exact integer sums;
    * the two ratios are single float divisions at the end — the q144
    * determinism recipe. CJK text shows the effect in-fixture:
    * whitespace words are long multi-char runs, so pieces-per-word
    * diverges from the Latin sources. */
  val q154 = QuerySpec("q154_tokenizer_fertility",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      docs.select(col("lang"),
          length(col("text")).cast("long").as("n_chars"),
          T.tokenCount(col("text")).cast("long").as("n_words"),
          T.bpeCount(col("text")).cast("long").as("n_pieces"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("n_chars"),
          sum("n_words").as("n_words"),
          sum("n_pieces").as("n_pieces"))
        .withColumn("chars_per_piece",
          round(col("n_chars").cast("double") / col("n_pieces"), 6))
        .withColumn("pieces_per_word",
          round(col("n_pieces").cast("double") / col("n_words"), 6))
        .orderBy("lang")
    },
    Some(raw"""
WITH base AS (
  SELECT lang,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(len($sqlToks) AS BIGINT) AS n_words,
    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
      AS BIGINT) AS n_pieces
  FROM documents
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS n_chars,
  CAST(sum(n_words) AS BIGINT) AS n_words,
  CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
  round(CAST(sum(n_chars) AS DOUBLE) / sum(n_pieces), 6) AS chars_per_piece,
  round(CAST(sum(n_pieces) AS DOUBLE) / sum(n_words), 6) AS pieces_per_word
FROM base GROUP BY lang ORDER BY lang
"""))

  /** q180 — packed-sequence loss-mask span layout: the table an
    * attention-masking kernel actually consumes — for every
    * (sequence, document) incidence of the q87 packing, the
    * document's token span CLIPPED to the sequence window
    * ([span_start, span_end) in sequence-local offsets), plus flags
    * for the two boundary cases a mask must treat specially (the doc
    * continues from the previous sequence / into the next one). Same
    * two-phase prefix sum as q87 — one range shuffle, one explode
    * over each doc's overlapped windows, no per-sequence regroup
    * needed because the span rows ARE the output. The oracle replays
    * the prefix sum, the window overlap, and the clip arithmetic.
    */
  val q180 = QuerySpec("q180_loss_mask_spans",
    (s, dir) => {
      val cap = 512
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), T.tokenCount(col("text")).cast("long").as("n"))
      val cum = graft.operators.Packing.withCumulativeSum(
          docs.where(col("n") > 0), "doc_id", "n", 32)
        .withColumn("start", col("cum") - col("n"))
      cum.select(col("doc_id"), col("start"), col("cum"),
          explode(sequence(expr(s"start div $cap"),
            expr(s"(cum - 1) div $cap"))).as("seq"))
        .select(col("seq"), col("doc_id"),
          (greatest(col("start"), col("seq") * cap) - col("seq") * cap)
            .as("span_start"),
          (least(col("cum"), (col("seq") + 1) * cap) - col("seq") * cap)
            .as("span_end"),
          (col("start") < col("seq") * cap).as("continues_prev"),
          (col("cum") > (col("seq") + 1) * cap).as("continues_next"))
        .orderBy("seq", "span_start", "doc_id")
    },
    Some(raw"""
WITH t AS (
  SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n FROM documents
), c AS (
  SELECT doc_id, n,
    sum(n) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t WHERE n > 0
), w AS (
  SELECT doc_id, cum - n AS start, cum,
    unnest(range(CAST((cum - n) // 512 AS BIGINT),
      CAST((cum - 1) // 512 + 1 AS BIGINT))) AS seq
  FROM c
)
SELECT seq, doc_id,
  CAST(greatest(start, seq * 512) - seq * 512 AS BIGINT) AS span_start,
  CAST(least(cum, (seq + 1) * 512) - seq * 512 AS BIGINT) AS span_end,
  start < seq * 512 AS continues_prev,
  cum > (seq + 1) * 512 AS continues_next
FROM w ORDER BY seq, span_start, doc_id
"""))

  /** q284 — exact PHRASE search on a POSITIONAL inverted index: the
    * retrieval capability q164's inverted index lacks (positions).
    * Tokenize once (posexplode), keep postings ONLY for the phrase
    * vocabulary (the filter sits under the shuffle, so the index
    * frame is |phrase-term postings|, not the corpus), then each
    * 3-word phrase is two self-equi-joins on (doc_id, pos+offset) —
    * adjacency as join keys, the standard positional-index plan.
    * Counts include overlapping occurrences (a substring scan can't
    * see those; the oracle replays the same positional algebra with
    * DuckDB's indexed list_transform). Output per phrase: matched
    * docs + total occurrences. At 100 TB: postings shuffle on
    * (doc_id) once per phrase word, every join equi-keyed, no
    * windows, no regex over the corpus. */
  val q284 = QuerySpec("q284_phrase_search",
    (s, dir) => {
      val phrases = Seq(
        ("slow hash batch", "slow", "hash", "batch"),
        ("part filter scan", "part", "filter", "scan"),
        ("row column sort", "row", "column", "sort"))
      val vocab = phrases.flatMap(p => Seq(p._2, p._3, p._4)).distinct
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
        .where(col("term").isin(vocab: _*))
      val p = graft.CacheRegistry.persistTracked(toks)
      val perPhrase = phrases.map { case (name, w0, w1, w2) =>
        p.as("t0").where(col("t0.term") === w0)
          .join(p.as("t1"),
            col("t1.doc_id") === col("t0.doc_id") &&
              col("t1.pos") === col("t0.pos") + 1 &&
              col("t1.term") === w1)
          .join(p.as("t2"),
            col("t2.doc_id") === col("t0.doc_id") &&
              col("t2.pos") === col("t0.pos") + 2 &&
              col("t2.term") === w2)
          .agg(lit(name).as("phrase"),
            countDistinct(col("t0.doc_id")).as("n_docs"),
            count(lit(1)).as("n_occ"))
          .select("phrase", "n_docs", "n_occ")
      }
      // a phrase with ZERO corpus occurrences has no result row — the
      // oracle's inner joins drop it, but a global agg emits a 0-count
      // row; at sf0.001 one probe phrase is genuinely absent and the
      // two sides diverged (inherited red, found+fixed this round)
      perPhrase.reduce(_.unionByName(_))
        .where(col("n_occ") > 0).orderBy("phrase")
    },
    Some(raw"""
WITH toks AS (
  SELECT doc_id, u.term AS term, u.pos AS pos
  FROM (SELECT doc_id, unnest(list_transform(string_split(text, ' '),
      (w, i) -> struct_pack(term := w, pos := i))) AS u
    FROM documents)
), ph AS (
  SELECT * FROM (VALUES ('slow hash batch', 'slow', 'hash', 'batch'),
    ('part filter scan', 'part', 'filter', 'scan'),
    ('row column sort', 'row', 'column', 'sort')) AS t(phrase, w0, w1, w2)
), occ AS (
  SELECT ph.phrase, t0.doc_id
  FROM ph
  JOIN toks t0 ON t0.term = ph.w0
  JOIN toks t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
    AND t1.term = ph.w1
  JOIN toks t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2
    AND t2.term = ph.w2
)
SELECT phrase, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_occ
FROM occ GROUP BY phrase ORDER BY phrase
"""))

  val all: Seq[QuerySpec] =
    Seq(q18, q19, q20, q21, q23, q26, q28, q41, q42, q47, q78, q83, q85,
      q86, q87, q88, q90, q94, q95, q105, q106, q107, q109, q116, q119,
      q121, q131, q136, q141, q144, q145, q147, q148, q151, q153, q154,
      q180, q284)
}
