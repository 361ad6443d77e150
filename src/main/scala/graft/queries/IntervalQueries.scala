package graft.queries

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}

/** Round-14 interval/layout tier: temporal-interval analytics and two
  * physical-layout audits a 100 TB store runs against itself —
  *
  *  - q252: the sweep-line over interval endpoints (max concurrency,
  *    union-of-intervals coverage, utilization) — capacity planning's
  *    core query, built on the two-phase prefix-sum machinery so no
  *    single-task window ever sees the endpoint stream;
  *  - q253: a bitmap-index audit — predicate bitmaps packed into
  *    62-bit words via `bit_or` aggregation, AND/OR cardinalities from
  *    `bit_count` word joins, validated against exact conditional
  *    counts in the same result row;
  *  - q254: the Gorilla timestamp-compression cost model
  *    (delta-of-delta bit classes) per event type — the "should this
  *    series be delta-encoded" advisor next to q245's PLAIN/RLE/DICT
  *    models.
  *
  * Integer-exact everywhere; every oracle aggregate is CAST to BIGINT.
  */
object IntervalQueries {

  /** Engine-shared day index (same derivation as StatsQueries). */
  private val dayIdxSql = "CAST(floor(epoch(ts)) AS BIGINT) // 86400"

  /** q252 — interval sweep-line: events become half-open usage
    * intervals [ts, ts + dur) (dur derives deterministically from the
    * payload: cents mod 3600 + 60 seconds); the classic sweep then
    * computes, per event_type: peak concurrency, the earliest time the
    * peak is reached, union-of-intervals covered time, and utilization
    * of the type's active span — the capacity-planning query.
    *
    * Scale shape: the endpoint stream (2 rows per event) goes through
    * ONE two-phase prefix-sum pass (Packing.withCumulativeSum) over a
    * single packed LONG key (tid·2⁵² + t·2 + pri — primitive-compare
    * sorting; the string-key form measured 58× at 100× rows). Ends
    * sort before starts at equal timestamps (half-open semantics), so
    * within a tied block each same-sign run is monotone and every
    * statistic the aggregates consume is order-independent. Covered
    * time needs NO adjacency join: it is Σ t(closings) − Σ t(openings)
    * over the sweep (see the inline derivation). Prior types net to
    * zero in the global running sum (every +1 has its −1), so
    * per-type concurrency needs no offset correction at all. */
  val q252 = QuerySpec("q252_interval_sweep",
    (s, dir) => {
      val iv = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "events")
          .select(col("event_type"), col("event_id"),
            expr("unix_micros(ts)").as("st"),
            expr("unix_micros(ts) + (cast(round(value * 100) as bigint)" +
              " % 3600 + 60) * 1000000").as("en")))
      // dense type ids so the sort key packs into ONE long (tid·2⁵² +
      // t·2 + pri — epoch-µs fits 51 bits through 2041, 1024 type
      // headroom): long keys keep the two-phase sort in primitive
      // comparisons — the string-key formulation measured 58× at 100×
      // rows purely on key building + byte-wise sorting. The window
      // below ranks the |types|-row distinct frame, a domain-bounded
      // constant. Ties in (t, pri) need no id tiebreak: equal-key
      // rows carry the same timestamp and same delta sign, so every
      // aggregate this query outputs is invariant to their order (the
      // Scaladoc argument above), and the persisted sweep freezes one
      // concrete ranking for the adjacency join.
      val tids = iv.select("event_type").distinct()
        .withColumn("tid", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("event_type"))
          .cast("long"))
      val endpoints = iv.select(col("event_type"), col("st").as("t"),
          lit(1L).as("pri"), lit(1L).as("delta"))
        .unionByName(iv.select(col("event_type"), col("en").as("t"),
          lit(0L).as("pri"), lit(-1L).as("delta")))
        .join(broadcast(tids), "event_type")
        .withColumn("k",
          expr("shiftleft(tid, 52) + shiftleft(t, 1) + pri"))
      // the cum pass ships ONLY (k, delta) through the sort shuffle
      // (the primitive fast path — no Row boxing); tid/time/delta
      // decode back out of the packed key afterwards and the
      // event_type string rejoins from the broadcast tid dim
      val swept = graft.CacheRegistry.persistTracked(
        graft.operators.Packing
          .withCumulativeSumPacked(
            endpoints.select("k", "delta"), "k", "delta", 32)
          .withColumnRenamed("cum", "conc")
          .withColumn("tid", expr("shiftright(k, 52)"))
          .withColumn("t", expr("shiftright(k, 1) & 2251799813685247"))
          .withColumn("delta", col("n"))
          .join(broadcast(tids), "tid")
          .select("event_type", "t", "delta", "conc"))
      // union-of-intervals coverage WITHOUT an adjacency join: the
      // covered regions are maximal [opening, closing] intervals, and
      // a row is an opening iff (delta = +1 ∧ conc = 1), a closing iff
      // (delta = −1 ∧ conc = 0) — so covered = Σ t(closings) −
      // Σ t(openings), one aggregate over the sweep (the rank+1
      // self-join formulation measured 3× slower at 100× rows). Ties
      // cannot break it: a 1→0→1 bounce inside a tied block adds a
      // closing and an opening at the SAME t — net zero. The partial
      // sums of raw epoch-µs exceed long at ~10⁴ intervals, so they
      // accumulate in decimal (Spark) / HUGEINT (DuckDB) and only the
      // difference — bounded by span·concurrency — casts back to
      // bigint.
      val segs = swept.groupBy("event_type")
        .agg(expr(
          "cast(sum(case " +
            "when delta = -1 and conc = 0 then cast(t as decimal(28,0)) " +
            "when delta = 1 and conc = 1 then -cast(t as decimal(28,0)) " +
            "else cast(0 as decimal(28,0)) end) as bigint)")
          .as("covered_us"))
      val maxc = swept.groupBy("event_type")
        .agg(max("conc").as("max_conc"))
      val peak = swept.join(maxc, "event_type")
        .where(col("conc") === col("max_conc"))
        .groupBy("event_type").agg(min("t").as("peak_t_us"))
      val span = iv.groupBy("event_type")
        .agg(count(lit(1)).as("n_intervals"),
          (max("en") - min("st")).as("span_us"))
      span.join(maxc, "event_type").join(peak, "event_type")
        .join(segs, "event_type")
        .withColumn("util_ppm", expr("(covered_us * 1000000) div span_us"))
        .select("event_type", "n_intervals", "max_conc", "peak_t_us",
          "covered_us", "span_us", "util_ppm")
        .orderBy("event_type")
    },
    Some(raw"""
WITH iv AS (
  SELECT event_type, event_id, epoch_us(ts) AS st,
    epoch_us(ts) + (CAST(round(value * 100) AS BIGINT) % 3600 + 60)
      * 1000000 AS en
  FROM events
), d AS (
  SELECT event_type, st AS t, 1 AS pri, 1 AS delta, event_id FROM iv
  UNION ALL
  SELECT event_type, en, 0, -1, event_id FROM iv
), c AS (
  SELECT event_type, t, delta,
    CAST(sum(delta) OVER (PARTITION BY event_type
      ORDER BY t, pri, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS conc,
    lead(t) OVER (PARTITION BY event_type ORDER BY t, pri, event_id)
      AS t_next
  FROM d
), cov AS (
  SELECT event_type,
    CAST(sum(CASE WHEN conc > 0 AND t_next IS NOT NULL
      THEN t_next - t ELSE 0 END) AS BIGINT) AS covered_us,
    CAST(max(conc) AS BIGINT) AS max_conc
  FROM c GROUP BY 1
), peak AS (
  SELECT c.event_type, CAST(min(c.t) AS BIGINT) AS peak_t_us
  FROM c JOIN cov ON c.event_type = cov.event_type
    AND c.conc = cov.max_conc
  GROUP BY 1
), span AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals,
    CAST(max(en) - min(st) AS BIGINT) AS span_us
  FROM iv GROUP BY 1
)
SELECT s.event_type, s.n_intervals, cov.max_conc, p.peak_t_us,
  cov.covered_us, s.span_us,
  CAST((cov.covered_us * 1000000) // s.span_us AS BIGINT) AS util_ppm
FROM span s JOIN cov ON s.event_type = cov.event_type
JOIN peak p ON s.event_type = p.event_type
ORDER BY s.event_type
"""))

  /** q253 — bitmap-index audit: two predicate bitmaps (event_type =
    * 'click'; payload ≥ 200.00) packed into 62-bit words keyed by
    * (zone, word) via `bit_or` aggregation, then AND/OR cardinalities
    * per 4096-row arrival zone from `bit_count` over the word join —
    * the layout experiment that decides whether a bitmap index would
    * answer combined predicates without row access. Exact conditional
    * counts computed directly from the rows ride along in the same
    * output row, so the driver hash itself certifies that the bitmap
    * algebra reproduces the truth (62 bits per word keeps the sign
    * bit and bit 62 out of play — no engine disagreement about
    * negative-value bit semantics can arise). Everything is
    * map-side-combining aggregates and one (zone, word) equi-join;
    * bitmap words are 1/62nd of the row count. */
  val q253 = QuerySpec("q253_bitmap_index",
    (s, dir) => {
      val base = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            expr("cast(round(value * 100) as bigint)").as("cents"))
          .withColumn("zone", expr("event_id div 4096"))
          .withColumn("word", expr("(event_id % 4096) div 62"))
          .withColumn("m", expr(
            "shiftleft(cast(1 as bigint), cast((event_id % 4096) % 62 as int))"))
          .withColumn("pa", (col("event_type") === "click").cast("long"))
          .withColumn("pb", (col("cents") >= 20000L).cast("long")))
      val wa = base.where(col("pa") === 1L).groupBy("zone", "word")
        .agg(expr("bit_or(m)").as("wa"))
      val wb = base.where(col("pb") === 1L).groupBy("zone", "word")
        .agg(expr("bit_or(m)").as("wb"))
      val words = wa.join(wb, Seq("zone", "word"), "full_outer")
        .select(col("zone"), col("word"),
          coalesce(col("wa"), lit(0L)).as("wa"),
          coalesce(col("wb"), lit(0L)).as("wb"))
      val fromBits = words.groupBy("zone")
        .agg(count(lit(1)).as("n_words"),
          sum(expr("cast(bit_count(wa) as bigint)")).as("n_a"),
          sum(expr("cast(bit_count(wb) as bigint)")).as("n_b"),
          sum(expr("cast(bit_count(wa & wb) as bigint)")).as("n_and"),
          sum(expr("cast(bit_count(wa | wb) as bigint)")).as("n_or"))
      val exact = base.groupBy("zone")
        .agg(sum("pa").as("exact_a"), sum("pb").as("exact_b"),
          sum(col("pa") * col("pb")).as("exact_and"),
          sum(greatest(col("pa"), col("pb"))).as("exact_or"))
      fromBits.join(exact, "zone")
        .select("zone", "n_words", "n_a", "n_b", "n_and", "n_or",
          "exact_a", "exact_b", "exact_and", "exact_or")
        .orderBy("zone")
    },
    Some(raw"""
WITH base AS (
  SELECT event_id // 4096 AS zone, (event_id % 4096) // 62 AS word,
    CAST(1 AS BIGINT) << CAST((event_id % 4096) % 62 AS INTEGER) AS m,
    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS pa,
    CASE WHEN CAST(round(value * 100) AS BIGINT) >= 20000 THEN 1
      ELSE 0 END AS pb
  FROM events
), wa AS (
  SELECT zone, word, CAST(bit_or(m) AS BIGINT) AS wa FROM base
  WHERE pa = 1 GROUP BY 1, 2
), wb AS (
  SELECT zone, word, CAST(bit_or(m) AS BIGINT) AS wb FROM base
  WHERE pb = 1 GROUP BY 1, 2
), words AS (
  SELECT coalesce(wa.zone, wb.zone) AS zone,
    coalesce(wa.wa, 0) AS wa, coalesce(wb.wb, 0) AS wb
  FROM wa FULL OUTER JOIN wb
    ON wa.zone = wb.zone AND wa.word = wb.word
), bits AS (
  SELECT zone, CAST(count(*) AS BIGINT) AS n_words,
    CAST(sum(bit_count(wa)) AS BIGINT) AS n_a,
    CAST(sum(bit_count(wb)) AS BIGINT) AS n_b,
    CAST(sum(bit_count(wa & wb)) AS BIGINT) AS n_and,
    CAST(sum(bit_count(wa | wb)) AS BIGINT) AS n_or
  FROM words GROUP BY 1
), exact AS (
  SELECT zone, CAST(sum(pa) AS BIGINT) AS exact_a,
    CAST(sum(pb) AS BIGINT) AS exact_b,
    CAST(sum(pa * pb) AS BIGINT) AS exact_and,
    CAST(sum(greatest(pa, pb)) AS BIGINT) AS exact_or
  FROM base GROUP BY 1
)
SELECT b.zone, b.n_words, b.n_a, b.n_b, b.n_and, b.n_or,
  e.exact_a, e.exact_b, e.exact_and, e.exact_or
FROM bits b JOIN exact e ON b.zone = e.zone
ORDER BY b.zone
"""))

  /** q254 — Gorilla timestamp-compression cost model: per-user event
    * streams are what a metrics store delta-encodes; this query prices
    * each event's SECOND-resolution timestamp under the Gorilla
    * delta-of-delta scheme (first point 64 bits raw; then dod = 0 →
    * 1 bit, [−63,64] → 2+7, [−255,256] → 3+9, [−2047,2048] → 4+12,
    * else 5+32 bits; a stream's second point prices its first delta
    * against an implicit prior delta of 0) and reports, per
    * event_type, the modeled bits against 64-bit-plain — the
    * delta-encoding advisor beside q245's PLAIN/RLE/DICT models.
    * Lags run per-user (the natural series key: bounded partitions,
    * the q59 sessionize shape); the pricing CASE is pure integer
    * arithmetic replayed identically by both engines. */
  val q254 = QuerySpec("q254_gorilla_cost",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("t", "event_id")
      val priced = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          expr("cast(floor(cast(ts as long)) as bigint)").as("t"))
        .withColumn("delta", col("t") - lag("t", 1).over(w))
        .withColumn("dod",
          when(col("delta").isNull, lit(null))
            .otherwise(col("delta") -
              coalesce(lag("delta", 1).over(w), lit(0L))))
        .withColumn("bits",
          when(col("delta").isNull, lit(64L))
            .when(col("dod") === 0L, lit(1L))
            .when(col("dod") >= -63L && col("dod") <= 64L, lit(9L))
            .when(col("dod") >= -255L && col("dod") <= 256L, lit(12L))
            .when(col("dod") >= -2047L && col("dod") <= 2048L, lit(16L))
            .otherwise(lit(37L)))
      priced.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          (count(lit(1)) * 64L).as("plain_bits"),
          sum("bits").as("gorilla_bits"),
          sum(when(col("bits") === 37L, 1L).otherwise(0L))
            .as("n_overflow"))
        .withColumn("ratio_ppm",
          expr("(gorilla_bits * 1000000) div plain_bits"))
        .select("event_type", "n_events", "plain_bits", "gorilla_bits",
          "n_overflow", "ratio_ppm")
        .orderBy("event_type")
    },
    Some(raw"""
WITH t AS (
  SELECT user_id, event_type, event_id,
    CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events
), deltas AS (
  SELECT user_id, event_type, event_id, t,
    t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
      AS delta
  FROM t
), d AS (
  SELECT event_type, delta,
    delta - coalesce(lag(delta) OVER (PARTITION BY user_id
      ORDER BY t, event_id), 0) AS dod
  FROM deltas
), priced AS (
  SELECT event_type,
    CASE WHEN delta IS NULL THEN 64
      WHEN dod = 0 THEN 1
      WHEN dod BETWEEN -63 AND 64 THEN 9
      WHEN dod BETWEEN -255 AND 256 THEN 12
      WHEN dod BETWEEN -2047 AND 2048 THEN 16
      ELSE 37 END AS bits
  FROM d
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(*) * 64 AS BIGINT) AS plain_bits,
  CAST(sum(bits) AS BIGINT) AS gorilla_bits,
  CAST(sum(CASE WHEN bits = 37 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_overflow,
  CAST((sum(bits) * 1000000) // (count(*) * 64) AS BIGINT)
    AS ratio_ppm
FROM priced GROUP BY 1 ORDER BY event_type
"""))

  /** q264 — service-backlog simulation per event_type at daily
    * granularity: arrivals are the daily event counts, capacity is
    * the floored mean daily count (one truncation, both engines), and
    * the backlog recurrence b_n = max(0, b_{n−1} + a_n − c) — NOT a
    * plain window — resolves exactly through the classic identity
    * b_n = S_n − min(0, min_{k≤n} S_k) over the net series
    * S = Σ(a − c): one running sum + one running min, both over the
    * calendar-bounded daily frame (≤ |days| rows per type — windows
    * here are the bounded-frame kind the registry allows). Output per
    * type: peak backlog, the day it peaks (earliest), days with
    * backlog, final backlog — the capacity-planning companion to
    * q252's concurrency sweep. */
  val q264 = QuerySpec("q264_backlog_sim",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"),
          expr("cast(floor(cast(ts as long) / 86400) as bigint)")
            .as("day_idx"))
        .agg(count(lit(1)).as("a"))
      val cap = daily.groupBy("event_type")
        .agg(expr("sum(a) div count(1)").as("c"))
      val w = Window.partitionBy("event_type").orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val series = graft.CacheRegistry.persistTracked(
        daily.join(cap, "event_type")
          .withColumn("net", col("a") - col("c"))
          .withColumn("s_run", sum("net").over(w))
          .withColumn("m_run", least(lit(0L), min("s_run").over(w)))
          .withColumn("backlog", col("s_run") - col("m_run"))
          .select("event_type", "day_idx", "backlog"))
      val mx = series.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          max("backlog").as("peak_backlog"),
          sum(when(col("backlog") > 0L, 1L).otherwise(0L))
            .as("days_backlogged"),
          expr("max_by(backlog, day_idx)").as("final_backlog"))
      val peakDay = series
        .join(mx.select("event_type", "peak_backlog"), "event_type")
        .where(col("backlog") === col("peak_backlog"))
        .groupBy("event_type").agg(min("day_idx").as("peak_day"))
      mx.join(peakDay, "event_type")
        .select("event_type", "n_days", "peak_backlog", "peak_day",
          "days_backlogged", "final_backlog")
        .orderBy("event_type")
    },
    Some(raw"""
WITH daily AS (
  SELECT event_type, $dayIdxSql AS day_idx,
    CAST(count(*) AS BIGINT) AS a
  FROM events GROUP BY 1, 2
), cap AS (
  SELECT event_type, CAST(sum(a) // count(*) AS BIGINT) AS c
  FROM daily GROUP BY 1
), series AS (
  SELECT d.event_type, d.day_idx,
    sum(d.a - cap.c) OVER (PARTITION BY d.event_type
      ORDER BY d.day_idx ROWS UNBOUNDED PRECEDING) AS s_run
  FROM daily d JOIN cap ON d.event_type = cap.event_type
), b AS (
  SELECT event_type, day_idx,
    s_run - least(0, min(s_run) OVER (PARTITION BY event_type
      ORDER BY day_idx ROWS UNBOUNDED PRECEDING)) AS backlog
  FROM series
), mx AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
    CAST(max(backlog) AS BIGINT) AS peak_backlog,
    CAST(sum(CASE WHEN backlog > 0 THEN 1 ELSE 0 END) AS BIGINT)
      AS days_backlogged,
    CAST(arg_max(backlog, day_idx) AS BIGINT) AS final_backlog
  FROM b GROUP BY 1
)
SELECT m.event_type, m.n_days, m.peak_backlog,
  CAST(min(b.day_idx) AS BIGINT) AS peak_day,
  m.days_backlogged, m.final_backlog
FROM mx m JOIN b ON m.event_type = b.event_type
  AND b.backlog = m.peak_backlog
GROUP BY 1, 2, 3, 5, 6
ORDER BY m.event_type
"""))

  /** q265 — DAU / trailing-7-day WAU / stickiness per day: the
    * product-analytics staple. The sliding distinct-count NEVER runs
    * a sliding window over raw events: the corpus reduces to the
    * distinct (user, day) frame once, each user-day then fans out to
    * the ≤7 target days it is visible in (a constant multiplier, the
    * q261 hopping idiom), and WAU is one distinct aggregate per
    * target day. Stickiness = DAU·10⁶ div WAU, exact ppm. Days
    * without a full 7-day history are reported (the leading edge) —
    * consumers filter on n_hist if they need complete windows. */
  val q265 = QuerySpec("q265_dau_wau",
    (s, dir) => {
      val userDay = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "events")
          .select(col("user_id"),
            expr("cast(floor(cast(ts as long) / 86400) as bigint)")
              .as("day_idx"))
          .distinct())
      val dau = userDay.groupBy("day_idx")
        .agg(count(lit(1)).as("dau"))
      val spanned = userDay
        .join(broadcast(s.range(0, 7).select(col("id").as("off"))))
        .select(col("user_id"), (col("day_idx") + col("off"))
          .as("target_day"), col("day_idx"))
      val calendar = userDay.select("day_idx").distinct()
      val wau = spanned
        .join(calendar.select(col("day_idx").as("target_day")),
          "target_day")
        .groupBy("target_day")
        .agg(countDistinct("user_id").as("wau"),
          countDistinct("day_idx").as("n_hist"))
      dau.join(wau, dau("day_idx") === wau("target_day"))
        .withColumn("stickiness_ppm", expr("(dau * 1000000) div wau"))
        .select(col("day_idx"), col("dau"), col("wau"), col("n_hist"),
          col("stickiness_ppm"))
        .orderBy("day_idx")
    },
    Some(raw"""
WITH ud AS (
  SELECT DISTINCT user_id, $dayIdxSql AS day_idx FROM events
), dau AS (
  SELECT day_idx, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1
), cal AS (SELECT DISTINCT day_idx FROM ud),
sp AS (
  SELECT ud.user_id, ud.day_idx + t.off AS target_day, ud.day_idx
  FROM ud CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5), (6)) t(off)
), wau AS (
  SELECT sp.target_day,
    CAST(count(DISTINCT sp.user_id) AS BIGINT) AS wau,
    CAST(count(DISTINCT sp.day_idx) AS BIGINT) AS n_hist
  FROM sp JOIN cal ON sp.target_day = cal.day_idx
  GROUP BY 1
)
SELECT d.day_idx, d.dau, w.wau, w.n_hist,
  CAST((d.dau * 1000000) // w.wau AS BIGINT) AS stickiness_ppm
FROM dau d JOIN wau w ON d.day_idx = w.target_day
ORDER BY d.day_idx
"""))

  /** q268 — velocity (burst) flags: an event is flagged when it is
    * the 3rd event from its user inside 6 hours (ts − lag(ts, 2) ≤
    * 6h) — the rate-limit / fraud-velocity rule every event pipeline
    * screens with. One lag window per user (the natural bounded
    * series key), then a per-type aggregate: flags, distinct flagged
    * users, earliest flag, and flags-per-million-events — all exact.
    */
  val q268 = QuerySpec("q268_velocity_flags",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("t", "event_id")
      val flagged = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts)").as("t"))
        .withColumn("span", col("t") - lag("t", 2).over(w))
        .withColumn("flag",
          (col("span").isNotNull && col("span") <= 21600000000L)
            .cast("long"))
      flagged.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum("flag").as("n_flags"),
          countDistinct(when(col("flag") === 1L, col("user_id")))
            .as("n_users_flagged"),
          min(when(col("flag") === 1L, col("t"))).as("first_flag_us"))
        .withColumn("flag_ppm", expr("(n_flags * 1000000) div n_events"))
        .select("event_type", "n_events", "n_flags", "n_users_flagged",
          "first_flag_us", "flag_ppm")
        .orderBy("event_type")
    },
    Some(raw"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events
), w AS (
  SELECT event_type, user_id, t,
    t - lag(t, 2) OVER (PARTITION BY user_id ORDER BY t, event_id)
      AS span
  FROM e
), f AS (
  SELECT event_type, user_id, t,
    CASE WHEN span IS NOT NULL AND span <= 21600000000 THEN 1
      ELSE 0 END AS flag
  FROM w
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(flag) AS BIGINT) AS n_flags,
  CAST(count(DISTINCT CASE WHEN flag = 1 THEN user_id END) AS BIGINT)
    AS n_users_flagged,
  CAST(min(CASE WHEN flag = 1 THEN t END) AS BIGINT) AS first_flag_us,
  CAST((sum(flag) * 1000000) // count(*) AS BIGINT) AS flag_ppm
FROM f GROUP BY 1 ORDER BY event_type
"""))

  /** q269 — watermark-delay audit: for each event_type, the lateness
    * distribution an out-of-order stream would exhibit — lateness of
    * an event = (max event-time seen so far in arrival order) − its
    * own event time — and therefore the watermark delay that would
    * have admitted 50/95/99/100% of events. THE number a streaming
    * deployment needs before setting `withWatermark`, computed from
    * history (arrival order proxied by event_id).
    *
    * Scale shape: the running max never runs as a per-type window
    * over raw events — it is ONE packed-long two-phase prefix-MAX
    * pass (Packing.withCumulativeMaxPacked). Cross-type isolation
    * inside a single global scan comes from VALUE packing: the
    * accumulated value is tid·2⁵² + ts, so an earlier type's maximum
    * can never exceed any current-type value and the masked low bits
    * are exactly the within-type running max (ts < 2⁵² µs holds to
    * year 2112). Percentiles then run on the bounded lateness-minute
    * histogram (the q266 idiom). */
  val q269 = QuerySpec("q269_watermark_audit",
    (s, dir) => {
      import org.apache.spark.sql.expressions.{Window => W}
      val ev = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "events")
          .select(col("event_type"), col("event_id"),
            expr("unix_micros(ts)").as("t")))
      val tids = ev.select("event_type").distinct()
        .withColumn("tid", row_number().over(W.orderBy("event_type"))
          .cast("long"))
      val packed = ev.join(broadcast(tids), "event_type")
        .withColumn("k", expr("shiftleft(tid, 52) + event_id"))
        .withColumn("v", expr("shiftleft(tid, 52) + t"))
      val late = graft.CacheRegistry.persistTracked(
        graft.operators.Packing
          .withCumulativeMaxPacked(packed.select("k", "v"), "k", "v", 32)
          .withColumn("tid", expr("shiftright(k, 52)"))
          .withColumn("late_min", expr(
            "((cummax & 4503599627370495) - (n & 4503599627370495)) " +
              "div 60000000"))
          .join(broadcast(tids), "tid")
          .select("event_type", "late_min"))
      val w = W.partitionBy("event_type").orderBy("late_min")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val wAll = W.partitionBy("event_type")
      late.groupBy("event_type", "late_min")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(w))
        .withColumn("n", sum("cnt").over(wAll))
        .groupBy("event_type")
        .agg(max("n").as("n_events"),
          min(when(col("cum") * 2L >= col("n"), col("late_min")))
            .as("p50_min"),
          min(when(col("cum") * 20L >= col("n") * 19L, col("late_min")))
            .as("p95_min"),
          min(when(col("cum") * 100L >= col("n") * 99L, col("late_min")))
            .as("p99_min"),
          max("late_min").as("max_min"),
          sum(when(col("late_min") === 0L, col("cnt")).otherwise(0L))
            .as("n_on_time"))
        .withColumn("on_time_ppm",
          expr("(n_on_time * 1000000) div n_events"))
        .select("event_type", "n_events", "p50_min", "p95_min",
          "p99_min", "max_min", "on_time_ppm")
        .orderBy("event_type")
    },
    Some(raw"""
WITH e AS (
  SELECT event_type, event_id, epoch_us(ts) AS t FROM events
), lateness AS (
  SELECT event_type,
    (max(t) OVER (PARTITION BY event_type ORDER BY event_id
      ROWS UNBOUNDED PRECEDING) - t) // 60000000 AS late_min
  FROM e
), h AS (
  SELECT event_type, late_min, CAST(count(*) AS BIGINT) AS cnt
  FROM lateness GROUP BY 1, 2
), c AS (
  SELECT event_type, late_min, cnt,
    sum(cnt) OVER (PARTITION BY event_type ORDER BY late_min
      ROWS UNBOUNDED PRECEDING) AS cum,
    sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM h
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
  CAST(min(late_min) FILTER (WHERE cum * 2 >= n) AS BIGINT) AS p50_min,
  CAST(min(late_min) FILTER (WHERE cum * 20 >= n * 19) AS BIGINT)
    AS p95_min,
  CAST(min(late_min) FILTER (WHERE cum * 100 >= n * 99) AS BIGINT)
    AS p99_min,
  CAST(max(late_min) AS BIGINT) AS max_min,
  CAST((sum(CASE WHEN late_min = 0 THEN cnt ELSE 0 END) * 1000000)
    // max(n) AS BIGINT) AS on_time_ppm
FROM c GROUP BY 1 ORDER BY event_type
"""))

  def all: Seq[QuerySpec] = Seq(q252, q253, q254, q264, q265, q268,
    q269)
}
