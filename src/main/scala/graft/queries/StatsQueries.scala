package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}

/** Round-14 statistics tier: the remaining classical time-series /
  * categorical / concentration statistics a metrics warehouse runs
  * that the registry did not yet cover — autocorrelation (ACF),
  * ordinary-least-squares trend with R², the chi-squared independence
  * test, and revenue-concentration indices (Gini, HHI, CR-k).
  *
  * Determinism rules as everywhere in the registry (see
  * AnalyticsQueries): exact integer arithmetic with identical
  * truncation sequences in both engines; the one float expression
  * (q249's R²) is a pinned-order IEEE double sequence shared as
  * identical text, floored to ppm before output. The standard
  * envelope applies: ·10⁶ ppm numerators stay inside long up to ~10⁹
  * daily-aggregate magnitudes — same bound every ppm figure in this
  * registry carries.
  *
  * Scale shapes: every query here reduces the corpus with one
  * map-side-combining daily/cell aggregate first; the statistics then
  * run on calendar- or domain-bounded frames (≤ |types|·|days| or
  * |types|·7 rows — constants at any corpus size). q251's ranks come
  * from the two-phase prefix-sum core (Packing.withCumulativeSum), not
  * a per-nation window over raw customers — no single-task sort at any
  * fan-in.
  */
object StatsQueries {

  /** Engine-shared day index: µs-precision timestamp → epoch day. */
  private val dayIdxSpark = "cast(floor(cast(ts as long) / 86400) as bigint)"
  private val dayIdxSql = "CAST(floor(epoch(ts)) AS BIGINT) // 86400"

  /** q248 — autocorrelation function (ACF) of the daily event-count
    * series per event_type at lags 1–3: the seasonality/persistence
    * diagnostic that decides whether a metric needs differencing
    * before the trend tests (q210/q247) mean anything. Deviations are
    * taken around the FLOORED integer mean (x̄ = Σx div n — one
    * truncation, replayed identically by both engines; the n-scaled
    * exact form would push the ·10⁶ numerator past long at ~10⁷ rows
    * per day, this form holds to ~10⁹). Lag pairing is calendar
    * pairing (day_idx + k must exist) — a gap day contributes no
    * pair, the standard treatment for regularly-sampled series with
    * holes. The corpus-scale work is the daily aggregate; the lag
    * self-join runs on the |types|·|days| frame. */
  val q248 = QuerySpec("q248_acf",
    (s, dir) => {
      val daily = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "events")
          .groupBy(col("event_type"), expr(dayIdxSpark).as("day_idx"))
          .agg(count(lit(1)).as("x")))
      val stats = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("x").as("s"))
        .where(col("n_days") >= lit(4L))
      val dev = daily.join(stats, "event_type")
        .withColumn("d", col("x") - expr("s div n_days"))
        .select("event_type", "day_idx", "d", "n_days")
      val den = dev.groupBy("event_type")
        .agg(sum(col("d") * col("d")).as("den"))
        .where(col("den") > 0L)
      val lags = s.range(1, 4).select(col("id").as("lag"))
      val pairs = dev.as("a")
        .join(broadcast(lags))
        .join(dev.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.day_idx") + col("lag") === col("b.day_idx"))
        .groupBy(col("a.event_type").as("event_type"), col("lag"))
        .agg(sum(col("a.d") * col("b.d")).as("num"),
          count(lit(1)).as("n_pairs"))
      pairs.join(den, "event_type")
        .join(stats.select("event_type", "n_days"), "event_type")
        .withColumn("acf_ppm", expr("(num * 1000000) div den"))
        .select("event_type", "lag", "n_days", "n_pairs", "acf_ppm")
        .orderBy("event_type", "lag")
    },
    Some(raw"""
WITH daily AS (
  SELECT event_type, $dayIdxSql AS day_idx,
    CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
    CAST(sum(x) AS BIGINT) AS s
  FROM daily GROUP BY 1 HAVING count(*) >= 4
), dev AS (
  SELECT d.event_type, d.day_idx, d.x - (st.s // st.n_days) AS d,
    st.n_days
  FROM daily d JOIN stats st ON d.event_type = st.event_type
), den AS (
  SELECT event_type, CAST(sum(d * d) AS BIGINT) AS den
  FROM dev GROUP BY 1 HAVING sum(d * d) > 0
), lags AS (SELECT * FROM (VALUES (1), (2), (3)) t(lag)), pairs AS (
  SELECT a.event_type, CAST(l.lag AS BIGINT) AS lag,
    CAST(sum(a.d * b.d) AS BIGINT) AS num,
    CAST(count(*) AS BIGINT) AS n_pairs
  FROM dev a CROSS JOIN lags l
  JOIN dev b ON a.event_type = b.event_type
    AND a.day_idx + l.lag = b.day_idx
  GROUP BY 1, 2
)
SELECT p.event_type, p.lag, st.n_days, p.n_pairs,
  CAST((p.num * 1000000) // dn.den AS BIGINT) AS acf_ppm
FROM pairs p
JOIN den dn ON p.event_type = dn.event_type
JOIN stats st ON p.event_type = st.event_type
ORDER BY p.event_type, p.lag
"""))

  /** q249 — OLS daily trend per event_type: least-squares slope of
    * the daily count series in micro-counts/day plus the fit quality
    * R² in ppm — the parametric sibling of q247's Theil–Sen (which is
    * robust but rank-based; OLS is what dashboards draw). All sums are
    * exact integers over the calendar-bounded daily frame (x = day
    * offset from the per-type minimum, so Σx² stays tiny); the slope
    * is one exact ·10⁶ floor division of the n-scaled covariance
    * identity n·Σxy − Σx·Σy over n·Σx² − (Σx)². R² = Sxy²/(Sxx·Syy)
    * cannot stay in long (Sxy² overflows at any useful scale), so it
    * is the registry's pinned-float pattern: one double expression,
    * identical text both engines, multiplication/division only (each
    * IEEE-correctly-rounded), floored to ppm. */
  val q249 = QuerySpec("q249_ols_trend",
    (s, dir) => {
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"), expr(dayIdxSpark).as("day_idx"))
        .agg(count(lit(1)).as("y"))
      val based = daily
        .withColumn("x0", min("day_idx")
          .over(Window.partitionBy("event_type")))
        .withColumn("x", col("day_idx") - col("x0"))
      based.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
        .where(col("n") >= 3L)
        .withColumn("cxy", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("cxx", col("n") * col("sxx") - col("sx") * col("sx"))
        .withColumn("cyy", col("n") * col("syy") - col("sy") * col("sy"))
        .where(col("cxx") > 0L && col("cyy") > 0L)
        .withColumn("slope_micro", expr("(cxy * 1000000) div cxx"))
        .withColumn("r2_ppm", expr(
          "cast(floor(cast(cxy as double) * cast(cxy as double) / " +
            "(cast(cxx as double) * cast(cyy as double)) * 1000000.0) " +
            "as bigint)"))
        .select(col("event_type"), col("n").as("n_days"),
          col("slope_micro"), col("r2_ppm"))
        .orderBy("event_type")
    },
    Some(raw"""
WITH daily AS (
  SELECT event_type, $dayIdxSql AS day_idx,
    CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), based AS (
  SELECT event_type,
    day_idx - min(day_idx) OVER (PARTITION BY event_type) AS x, y
  FROM daily
), sums AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * x) AS BIGINT) AS sxx,
    CAST(sum(x * y) AS BIGINT) AS sxy,
    CAST(sum(y * y) AS BIGINT) AS syy
  FROM based GROUP BY 1 HAVING count(*) >= 3
), c AS (
  SELECT event_type, n, n * sxy - sx * sy AS cxy,
    n * sxx - sx * sx AS cxx, n * syy - sy * sy AS cyy
  FROM sums
)
SELECT event_type, n AS n_days,
  CAST((cxy * 1000000) // cxx AS BIGINT) AS slope_micro,
  CAST(floor(CAST(cxy AS DOUBLE) * CAST(cxy AS DOUBLE) /
    (CAST(cxx AS DOUBLE) * CAST(cyy AS DOUBLE)) * 1000000.0)
    AS BIGINT) AS r2_ppm
FROM c WHERE cxx > 0 AND cyy > 0
ORDER BY event_type
"""))

  /** q250 — chi-squared independence test, event_type × weekday: is
    * activity mix stable across the week, the screening test behind
    * every "did the composition shift" alert. The weekday comes from
    * pure epoch-day arithmetic ((day_idx + 4) mod 7, Sunday = 0) so
    * NO engine date function is in the comparison path (Spark's
    * dayofweek is 1-based-Sunday, DuckDB's 0-based — a classic
    * cross-engine trap bypassed entirely). Expected counts and χ²
    * contributions are exact two-step integer divisions: the cell
    * deviation dev = O·N − R·C is exact in long to ~10⁹ rows, and the
    * contribution dev²·10³/(R·C·N) is sequenced as
    * ((dev·10³ div (R·C)) · dev) div N so no intermediate squares.
    * Output: the |types|×7 contingency frame with per-cell expected
    * (milli) and contribution (milli), plus the ride-along total χ²
    * and degrees of freedom on every row (broadcast 1-row join). */
  val q250 = QuerySpec("q250_chi2_independence",
    (s, dir) => {
      val cells = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "events")
          .withColumn("day_idx", expr(dayIdxSpark))
          .withColumn("dow", expr("(day_idx + 4) % 7"))
          .groupBy("event_type", "dow")
          .agg(count(lit(1)).as("o")))
      val rowT = cells.groupBy("event_type").agg(sum("o").as("r"))
      val colT = cells.groupBy("dow").agg(sum("o").as("c"))
      val n = cells.agg(sum("o").as("n_total"))
      val enriched = graft.CacheRegistry.persistTracked(cells
        .join(rowT, "event_type").join(colT, "dow")
        .crossJoin(broadcast(n))
        .withColumn("e_milli", expr("(r * c * 1000) div n_total"))
        .withColumn("dev", expr("o * n_total - r * c"))
        .withColumn("contrib_milli",
          expr("(((dev * 1000) div (r * c)) * dev) div n_total")))
      val total = enriched
        .agg(sum("contrib_milli").as("chi2_milli"),
          ((countDistinct("event_type") - 1) *
            (countDistinct("dow") - 1)).as("dof"))
      enriched.crossJoin(broadcast(total))
        .select("event_type", "dow", "o", "e_milli", "contrib_milli",
          "chi2_milli", "dof")
        .orderBy("event_type", "dow")
    },
    Some(raw"""
WITH cells AS (
  SELECT event_type, ($dayIdxSql + 4) % 7 AS dow,
    CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
), rt AS (
  SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1
), ct AS (
  SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1
), nt AS (SELECT CAST(sum(o) AS BIGINT) AS n_total FROM cells),
enriched AS (
  SELECT cells.event_type, cells.dow, cells.o,
    (rt.r * ct.c * 1000) // nt.n_total AS e_milli,
    cells.o * nt.n_total - rt.r * ct.c AS dev,
    ((((cells.o * nt.n_total - rt.r * ct.c) * 1000) // (rt.r * ct.c))
      * (cells.o * nt.n_total - rt.r * ct.c)) // nt.n_total
      AS contrib_milli
  FROM cells JOIN rt ON cells.event_type = rt.event_type
  JOIN ct ON cells.dow = ct.dow CROSS JOIN nt
), tot AS (
  SELECT CAST(sum(contrib_milli) AS BIGINT) AS chi2_milli,
    CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT dow) - 1)
      AS BIGINT) AS dof
  FROM enriched
)
SELECT e.event_type, e.dow, e.o, CAST(e.e_milli AS BIGINT) AS e_milli,
  CAST(e.contrib_milli AS BIGINT) AS contrib_milli,
  t.chi2_milli, t.dof
FROM enriched e CROSS JOIN tot t
ORDER BY e.event_type, e.dow
"""))

  /** q251 — revenue-concentration indices per nation: Gini
    * coefficient, Herfindahl–Hirschman index, and CR-10 (top-10
    * customer share) over customer order revenue — the "is this
    * market/tenant concentrated" report every usage-billing warehouse
    * ships. The Gini needs every customer's revenue RANK within its
    * nation: ranks come from ONE global two-phase prefix-sum
    * (Packing.withCumulativeSum over the packed nation|revenue|cust
    * key — the q236 machinery) minus each nation's start offset
    * (a |nations|-row frame; its prefix window is over 25 rows, a
    * data constant) — never a per-nation window over raw customers,
    * so a hot nation costs nothing. Gini via the rank identity
    * G = 2·Σ(rank·v)/(n·Σv) − (n+1)/n, sequenced as two exact floor
    * divisions; HHI as Σ share_ppm² div 10⁶; shares in exact ppm. */
  val q251 = QuerySpec("q251_concentration",
    (s, dir) => {
      val rev = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("v"))
      val cust = Tables(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_nationkey").cast("long").as("nation"))
      val keyed = rev.join(cust, "o_custkey")
        .withColumn("k",
          concat(lpad(col("nation").cast("string"), 3, "0"),
            lpad(col("v").cast("string"), 15, "0"),
            lpad(col("o_custkey").cast("string"), 12, "0")))
        .withColumn("one", lit(1L))
      val ranked = graft.CacheRegistry.persistTracked(
        graft.operators.Packing
          .withCumulativeSum(keyed.toDF(), "k", "one", 32))
      // nation start offsets: |nations| rows — window is over a
      // domain-bounded constant frame
      val offs = ranked.groupBy("nation").agg(count(lit(1)).as("cnt"))
        .withColumn("off",
          coalesce(sum("cnt").over(Window.orderBy("nation")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val withRank = ranked.join(broadcast(offs), "nation")
        .withColumn("rk", col("cum") - col("off"))
      withRank.groupBy("nation")
        .agg(count(lit(1)).as("n_cust"), sum("v").as("s"),
          sum(col("rk") * col("v")).as("t"),
          max("v").as("vmax"),
          sum(when(col("rk") > col("cnt") - 10L, col("v"))
            .otherwise(0L)).as("top10"))
        .withColumn("gini_ppm",
          expr("(((2 * t) div n_cust) * 1000000) div s " +
            "- ((n_cust + 1) * 1000000) div n_cust"))
        .join(
          // HHI needs per-customer share_ppm²: one more pass over the
          // (nation, v) frame joined to nation totals — map-side only
          withRank.groupBy("nation").agg(sum("v").as("s2"))
            .join(withRank.select("nation", "v"), "nation")
            .withColumn("share_ppm", expr("(v * 1000000) div s2"))
            .groupBy("nation")
            .agg(expr("sum(share_ppm * share_ppm) div 1000000")
              .as("hhi_ppm")),
          "nation")
        .withColumn("top1_ppm", expr("(vmax * 1000000) div s"))
        .withColumn("cr10_ppm", expr("(top10 * 1000000) div s"))
        .select("nation", "n_cust", "gini_ppm", "hhi_ppm", "top1_ppm",
          "cr10_ppm")
        .orderBy("nation")
    },
    Some(raw"""
WITH rev AS (
  SELECT o_custkey,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
), keyed AS (
  SELECT CAST(c.c_nationkey AS BIGINT) AS nation, r.o_custkey, r.v
  FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
), ranked AS (
  SELECT nation, v,
    row_number() OVER (PARTITION BY nation ORDER BY v, o_custkey)
      AS rk,
    count(*) OVER (PARTITION BY nation) AS cnt
  FROM keyed
), gini AS (
  SELECT nation, CAST(count(*) AS BIGINT) AS n_cust,
    CAST(sum(v) AS BIGINT) AS s, CAST(sum(rk * v) AS BIGINT) AS t,
    CAST(max(v) AS BIGINT) AS vmax,
    CAST(sum(CASE WHEN rk > cnt - 10 THEN v ELSE 0 END) AS BIGINT)
      AS top10
  FROM ranked GROUP BY 1
), hhi AS (
  SELECT nation,
    CAST(sum(((v * 1000000) // s2) * ((v * 1000000) // s2)) // 1000000
      AS BIGINT) AS hhi_ppm
  FROM (SELECT nation, v, CAST(sum(v) OVER (PARTITION BY nation)
    AS BIGINT) AS s2 FROM keyed) GROUP BY 1
)
SELECT g.nation, g.n_cust,
  CAST((((2 * g.t) // g.n_cust) * 1000000) // g.s
    - ((g.n_cust + 1) * 1000000) // g.n_cust AS BIGINT) AS gini_ppm,
  h.hhi_ppm,
  CAST((g.vmax * 1000000) // g.s AS BIGINT) AS top1_ppm,
  CAST((g.top10 * 1000000) // g.s AS BIGINT) AS cr10_ppm
FROM gini g JOIN hhi h ON g.nation = h.nation
ORDER BY g.nation
"""))

  /** q266 — ship-lag percentiles per order priority (exact p50/p90):
    * the fulfillment-SLO report. The exact percentile NEVER ranks raw
    * rows: lag days collapse to the per-priority VALUE HISTOGRAM
    * first (one map-side-combining aggregate; the lag domain is a
    * data-bounded few thousand distinct values), and the percentile
    * is min(v) where cum·k ≥ n·j over that bounded frame — the same
    * histogram-rank idiom as q188/q216, windows over constants. */
  val q266 = QuerySpec("q266_ship_lag_percentiles",
    (s, dir) => {
      val w = Window.partitionBy("pri").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("pri")
      val lag = Tables(s, dir, "lineitem").as("l")
        .join(Tables(s, dir, "orders").as("o"),
          col("l.l_orderkey") === col("o.o_orderkey"))
        .select(col("o.o_orderpriority").as("pri"),
          expr("cast(datediff(cast(l_shipdate as date), " +
            "cast(o_orderdate as date)) as bigint)").as("d"))
      lag.groupBy("pri", "d").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(w))
        .withColumn("n", sum("cnt").over(wAll))
        .groupBy("pri")
        .agg(min(when(col("cum") * 2L >= col("n"), col("d"))).as("p50"),
          min(when(col("cum") * 10L >= col("n") * 9L, col("d")))
            .as("p90"),
          max("n").as("n"), min("d").as("dmin"), max("d").as("dmax"))
        .orderBy("pri")
    },
    Some(raw"""
WITH lag AS (
  SELECT o.o_orderpriority AS pri,
    CAST(datediff('day', CAST(o.o_orderdate AS DATE),
      CAST(l.l_shipdate AS DATE)) AS BIGINT) AS d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), h AS (
  SELECT pri, d, CAST(count(*) AS BIGINT) AS cnt FROM lag GROUP BY 1, 2
), c AS (
  SELECT pri, d, cnt,
    sum(cnt) OVER (PARTITION BY pri ORDER BY d
      ROWS UNBOUNDED PRECEDING) AS cum,
    sum(cnt) OVER (PARTITION BY pri) AS n
  FROM h
)
SELECT pri, CAST(min(d) FILTER (WHERE cum * 2 >= n) AS BIGINT) AS p50,
  CAST(min(d) FILTER (WHERE cum * 10 >= n * 9) AS BIGINT) AS p90,
  CAST(max(n) AS BIGINT) AS n, CAST(min(d) AS BIGINT) AS dmin,
  CAST(max(d) AS BIGINT) AS dmax
FROM c GROUP BY 1 ORDER BY 1
"""))

  /** q267 — weekly seasonality index per (event_type, weekday): the
    * descriptive companion to q250's chi-squared TEST — how far each
    * weekday's mean daily volume sits from the type's overall mean,
    * in exact ppm (index 10⁶ = flat). Same epoch-day weekday
    * arithmetic (no engine date functions); one exact truncation
    * sequence ((s_dw·n)·10⁶) div (n_dw·s) — inside long to ~10⁹
    * events/day. Daily frames are calendar-bounded. */
  val q267 = QuerySpec("q267_seasonality_index",
    (s, dir) => {
      val daily = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "events")
          .groupBy(col("event_type"), expr(dayIdxSpark).as("day_idx"))
          .agg(count(lit(1)).as("x"))
          .withColumn("dow", expr("(day_idx + 4) % 7")))
      val per = daily.groupBy("event_type", "dow")
        .agg(count(lit(1)).as("n_dw"), sum("x").as("s_dw"))
      val tot = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("s"))
      per.join(tot, "event_type")
        .withColumn("index_ppm",
          expr("((s_dw * n) * 1000000) div (n_dw * s)"))
        .select("event_type", "dow", "n_dw", "s_dw", "index_ppm")
        .orderBy("event_type", "dow")
    },
    Some(raw"""
WITH daily AS (
  SELECT event_type, $dayIdxSql AS day_idx,
    CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), d2 AS (
  SELECT event_type, (day_idx + 4) % 7 AS dow, x FROM daily
), per AS (
  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_dw,
    CAST(sum(x) AS BIGINT) AS s_dw
  FROM d2 GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS s
  FROM d2 GROUP BY 1
)
SELECT p.event_type, p.dow, p.n_dw, p.s_dw,
  CAST(((p.s_dw * t.n) * 1000000) // (p.n_dw * t.s) AS BIGINT)
    AS index_ppm
FROM per p JOIN tot t ON p.event_type = t.event_type
ORDER BY p.event_type, p.dow
"""))

  /** q270 — calendar gap-fill with forward-fill AND exact linear
    * interpolation: the thin daily series (high-value events only —
    * ~13% of type-days are empty) joins onto the dense calendar
    * (sequence() per type between its observed bounds), and each gap
    * day gets (a) the last observed value (forward fill) and (b) the
    * linearly interpolated value between its non-null neighbours —
    * px + ((nx − px)·(d − pd)) div (nd − pd), one exact truncation,
    * both engines — with edge gaps falling back to the available
    * neighbour. The repair step every time-series warehouse runs
    * before feeding models that can't see NULL. All windows run over
    * calendar-bounded per-type frames; the corpus-scale work is the
    * one daily aggregate. */
  val q270 = QuerySpec("q270_gap_fill",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("event_type"), expr(dayIdxSpark).as("day"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
      val daily = ev.where(col("cents") >= 17000L)
        .groupBy("event_type", "day").agg(sum("cents").as("x"))
      val cal = ev.groupBy("event_type")
        .agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("event_type"),
          explode(expr("sequence(d0, d1)")).as("day"))
      val wAsc = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wDesc = Window.partitionBy("event_type").orderBy(desc("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val filled = cal.join(daily, Seq("event_type", "day"), "left")
        .withColumn("px", last("x", ignoreNulls = true).over(wAsc))
        .withColumn("pd", last(when(col("x").isNotNull, col("day")),
          ignoreNulls = true).over(wAsc))
        .withColumn("nx", last("x", ignoreNulls = true).over(wDesc))
        .withColumn("nd", last(when(col("x").isNotNull, col("day")),
          ignoreNulls = true).over(wDesc))
        .withColumn("interp",
          when(col("x").isNotNull, col("x"))
            .when(col("pd").isNotNull && col("nd").isNotNull,
              col("px") + expr(
                "((nx - px) * (day - pd)) div (nd - pd)"))
            .otherwise(coalesce(col("px"), col("nx"))))
      filled.groupBy("event_type")
        .agg(count(lit(1)).as("n_cal"),
          sum(when(col("x").isNull, 1L).otherwise(0L)).as("n_gaps"),
          sum("px").as("ffill_cents"),
          sum("interp").as("interp_cents"))
        .orderBy("event_type")
    },
    Some(raw"""
WITH ev AS (
  SELECT event_type, $dayIdxSql AS day,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), daily AS (
  SELECT event_type, day, CAST(sum(cents) AS BIGINT) AS x
  FROM ev WHERE cents >= 17000 GROUP BY 1, 2
), cal AS (
  SELECT event_type, unnest(generate_series(min(day), max(day)))
    AS day
  FROM ev GROUP BY event_type
), filled AS (
  SELECT c.event_type, c.day, d.x,
    last_value(d.x IGNORE NULLS) OVER (PARTITION BY c.event_type
      ORDER BY c.day ROWS UNBOUNDED PRECEDING) AS px,
    last_value(CASE WHEN d.x IS NOT NULL THEN c.day END IGNORE NULLS)
      OVER (PARTITION BY c.event_type ORDER BY c.day
      ROWS UNBOUNDED PRECEDING) AS pd,
    last_value(d.x IGNORE NULLS) OVER (PARTITION BY c.event_type
      ORDER BY c.day DESC ROWS UNBOUNDED PRECEDING) AS nx,
    last_value(CASE WHEN d.x IS NOT NULL THEN c.day END IGNORE NULLS)
      OVER (PARTITION BY c.event_type ORDER BY c.day DESC
      ROWS UNBOUNDED PRECEDING) AS nd
  FROM cal c LEFT JOIN daily d
    ON c.event_type = d.event_type AND c.day = d.day
), interp AS (
  SELECT event_type, x, px,
    CASE WHEN x IS NOT NULL THEN x
      WHEN pd IS NOT NULL AND nd IS NOT NULL
        THEN px + ((nx - px) * (day - pd)) // (nd - pd)
      ELSE coalesce(px, nx) END AS interp
  FROM filled
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
  CAST(sum(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_gaps,
  CAST(sum(px) AS BIGINT) AS ffill_cents,
  CAST(sum(interp) AS BIGINT) AS interp_cents
FROM interp GROUP BY 1 ORDER BY event_type
"""))

  /** Shared pinned-double CUPED expressions (q309): θ from the pooled
    * exact integer sums, and the adjusted arm mean — spliced verbatim
    * into both engines (the q249/q293 pattern). */
  private val thetaExpr =
    "(dn * dxy - dx * dy) / (dn * dxx - dx * dx)"
  private val adjExpr =
    s"(ya / na - ($thetaExpr) * (xa / na - dx / dn))"

  /** q309 — A/B lift with CUPED variance reduction (Deng et al.,
    * WSDM'13 — the standard experimentation-platform adjustment):
    * users hash-split into two arms; the experiment metric Y is each
    * user's purchase value over the LAST 15 days of the data window,
    * the covariate X the same metric over the PRIOR period; the
    * adjusted metric Y − θ·(X − X̄) removes the pre-period component
    * of the variance (θ = cov(X,Y)/var(X), pooled). Reported per arm:
    * exact n and Σy, the adjusted mean (pinned-float ppm), and θ —
    * the numbers a lift dashboard prints.
    *
    * Scale: one purchases pass to per-user (x, y) conditional sums
    * (map-side combining on user), one 1-row pooled aggregate
    * broadcast back, one per-arm aggregate. Σx², Σxy accumulate in
    * decimal(38,0)/HUGEINT (past long at ~10⁶ heavy users). */
  val q309 = QuerySpec("q309_cuped_lift",
    (s, dir) => {
      val maxd = Tables(s, dir, "events")
        .where(col("event_type") === "purchase")
        .agg(max(expr(dayIdxSpark)).as("maxd"))
      val peruser = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "events")
          .where(col("event_type") === "purchase")
          .crossJoin(broadcast(maxd))
          .select(col("user_id"),
            expr(s"case when $dayIdxSpark > maxd - 15 then " +
              "cast(floor(value * 100) as bigint) else 0L end").as("yc"),
            expr(s"case when $dayIdxSpark <= maxd - 15 then " +
              "cast(floor(value * 100) as bigint) else 0L end").as("xc"))
          .groupBy("user_id")
          .agg(sum("yc").as("y"), sum("xc").as("x"))
          .withColumn("arm", expr(
            "cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint) % 2")))
      val pooled = peruser.agg(
        count(lit(1)).as("pn"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("x").cast("decimal(38,0)"))
          .as("sxx"),
        sum(col("x").cast("decimal(38,0)") * col("y").cast("decimal(38,0)"))
          .as("sxy"))
      peruser.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("y").as("sum_y_cents"),
          sum("x").as("sum_x_cents"))
        .crossJoin(broadcast(pooled))
        .select(col("arm"), col("n"), col("sum_y_cents"),
          expr("cast(n as double)").as("na"),
          expr("cast(sum_y_cents as double)").as("ya"),
          expr("cast(sum_x_cents as double)").as("xa"),
          expr("cast(pn as double)").as("dn"),
          expr("cast(sx as double)").as("dx"),
          expr("cast(sy as double)").as("dy"),
          expr("cast(sxx as double)").as("dxx"),
          expr("cast(sxy as double)").as("dxy"))
        .select(col("arm"), col("n"), col("sum_y_cents"),
          expr(s"cast(floor(($adjExpr) * 1000000.0) as bigint)")
            .as("adj_mean_ppm"),
          expr(s"cast(floor(($thetaExpr) * 1000000.0) as bigint)")
            .as("theta_ppm"))
        .orderBy("arm")
    },
    Some(raw"""
WITH md AS (
  SELECT max($dayIdxSql) AS maxd FROM events
  WHERE event_type = 'purchase'
), peruser AS (
  SELECT user_id,
    CAST(sum(CASE WHEN $dayIdxSql > md.maxd - 15
      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
    CAST(sum(CASE WHEN $dayIdxSql <= md.maxd - 15
      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
      AS BIGINT) % 2 AS arm
  FROM events CROSS JOIN md
  WHERE event_type = 'purchase'
  GROUP BY user_id
), pooled AS (
  SELECT CAST(count(*) AS BIGINT) AS pn,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT) AS sxx,
    CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT) AS sxy
  FROM peruser
), arms AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS sum_y_cents,
    CAST(sum(x) AS BIGINT) AS sum_x_cents
  FROM peruser GROUP BY 1
), d AS (
  SELECT arm, n, sum_y_cents,
    CAST(n AS DOUBLE) AS na, CAST(sum_y_cents AS DOUBLE) AS ya,
    CAST(sum_x_cents AS DOUBLE) AS xa, CAST(pn AS DOUBLE) AS dn,
    CAST(sx AS DOUBLE) AS dx, CAST(sy AS DOUBLE) AS dy,
    CAST(sxx AS DOUBLE) AS dxx, CAST(sxy AS DOUBLE) AS dxy
  FROM arms CROSS JOIN pooled
)
SELECT arm, n, sum_y_cents,
  CAST(floor(($adjExpr) * 1000000.0) AS BIGINT) AS adj_mean_ppm,
  CAST(floor(($thetaExpr) * 1000000.0) AS BIGINT) AS theta_ppm
FROM d ORDER BY arm
"""))

  /** q314 — Spearman rank correlation (tie-aware midranks) between
    * discount and quantity per return flag: the monotone-association
    * estimator that q272's Pearson r cannot give (Pearson measures
    * LINEAR association; Spearman is invariant to any monotone
    * rescaling of either axis). Completes the association tier on the
    * same two columns: q272 Pearson, this, and q315's Kendall τ-b are
    * the three classical estimators side by side.
    *
    * Ranking never touches raw rows: both variables live on bounded
    * domains (discount percent-points 0–10, quantity 1–50), so
    * midranks come from per-flag marginal histograms — a prefix sum
    * over ≤ 50 distinct values — and every per-row quantity is a
    * per-CELL quantity of the ≤ 550-cell joint histogram, weighted by
    * the cell count. Doubled midranks (rank2 = 2·cum_before + t + 1,
    * the q294 device) keep ranks integer under ties; deviations are
    * taken around the EXACT rank2 mean n+1 (Σ rank2 = n(n+1)
    * identically), so the three Σ c·d·d sums are exact integers with
    * no n·Σ cross-multiplication — they stay within decimal(38,0) /
    * HUGEINT to ~10¹² rows (4n³ < 10³⁸), Spark and DuckDB summing the
    * IDENTICAL integers. One pinned float expression converts the
    * three exact sums to ρ in ppm. */
  val q314 = QuerySpec("q314_spearman_corr",
    (s, dir) => {
      val w = Window.partitionBy("flag")
      val cells = Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          expr("cast(round(l_discount * 100) as bigint)").as("x"),
          expr("cast(round(l_quantity) as bigint)").as("y"))
        .groupBy("flag", "x", "y").agg(count(lit(1)).as("c"))
      val mx = cells.groupBy("flag", "x").agg(sum("c").as("cx"))
        .withColumn("rx2", lit(2L) * coalesce(sum("cx").over(
          w.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)) + col("cx") + lit(1L))
        .select("flag", "x", "rx2")
      val my = cells.groupBy("flag", "y").agg(sum("c").as("cy"))
        .withColumn("ry2", lit(2L) * coalesce(sum("cy").over(
          w.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)) + col("cy") + lit(1L))
        .select("flag", "y", "ry2")
      val n = cells.groupBy("flag").agg(sum("c").as("n"))
      cells.join(mx, Seq("flag", "x")).join(my, Seq("flag", "y"))
        .join(n, Seq("flag"))
        .withColumn("dx", col("rx2") - col("n") - lit(1L))
        .withColumn("dy", col("ry2") - col("n") - lit(1L))
        .groupBy("flag")
        .agg(max("n").as("n"),
          sum(expr("cast(c as decimal(38,0)) * dx * dy")).as("sxy"),
          sum(expr("cast(c as decimal(38,0)) * dx * dx")).as("sxx"),
          sum(expr("cast(c as decimal(38,0)) * dy * dy")).as("syy"))
        .where(col("sxx") > 0 && col("syy") > 0)
        .select(col("flag"), col("n"),
          expr("cast(floor(cast(sxy as double) / sqrt(cast(sxx as double)" +
            " * cast(syy as double)) * 1000000.0) as bigint)")
            .as("rho_ppm"))
        .orderBy("flag")
    },
    Some(raw"""
WITH li AS (
  SELECT l_returnflag AS flag,
    CAST(round(l_discount * 100) AS BIGINT) AS x,
    CAST(round(l_quantity) AS BIGINT) AS y
  FROM lineitem
), cells AS (
  SELECT flag, x, y, CAST(count(*) AS BIGINT) AS c
  FROM li GROUP BY 1, 2, 3
), n AS (
  SELECT flag, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1
), mx AS (
  SELECT flag, x, CAST(sum(c) AS BIGINT) AS cx FROM cells GROUP BY 1, 2
), mx2 AS (
  SELECT flag, x, 2 * COALESCE(sum(cx) OVER (PARTITION BY flag ORDER BY x
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cx + 1 AS rx2
  FROM mx
), my AS (
  SELECT flag, y, CAST(sum(c) AS BIGINT) AS cy FROM cells GROUP BY 1, 2
), my2 AS (
  SELECT flag, y, 2 * COALESCE(sum(cy) OVER (PARTITION BY flag ORDER BY y
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cy + 1 AS ry2
  FROM my
), j AS (
  SELECT cells.flag, c, rx2 - n - 1 AS dx, ry2 - n - 1 AS dy, n.n
  FROM cells
  JOIN mx2 ON mx2.flag = cells.flag AND mx2.x = cells.x
  JOIN my2 ON my2.flag = cells.flag AND my2.y = cells.y
  JOIN n ON n.flag = cells.flag
), agg AS (
  SELECT flag, CAST(max(n) AS BIGINT) AS n,
    sum(CAST(c AS HUGEINT) * dx * dy) AS sxy,
    sum(CAST(c AS HUGEINT) * dx * dx) AS sxx,
    sum(CAST(c AS HUGEINT) * dy * dy) AS syy
  FROM j GROUP BY 1
)
SELECT flag, n,
  CAST(floor(CAST(sxy AS DOUBLE) / sqrt(CAST(sxx AS DOUBLE)
    * CAST(syy AS DOUBLE)) * 1000000.0) AS BIGINT) AS rho_ppm
FROM agg WHERE sxx > 0 AND syy > 0 ORDER BY flag
"""))

  /** q315 — Kendall τ-b between discount and quantity per return
    * flag: the third estimator of the association tier — pairwise
    * concordance, the statistic with the direct probabilistic reading
    * (P[concordant] − P[discordant]) and full tie correction in both
    * margins. The O(n²) pair space never materializes: concordance is
    * a bilinear form over the joint histogram, so the pair join runs
    * on ≤ 550 CELLS per flag (≤ 300k cell pairs — a constant at any
    * corpus size) with every count product exact in long to ~3·10⁹
    * rows (Σ cᵢcⱼ ≤ n²). C2/D2 count ordered pairs (each unordered
    * pair twice, always even), tie terms t2 = Σ c(c−1) doubled the
    * same way, and the single pinned float expression assembles τ-b
    * in ppm from five exact integers. */
  val q315 = QuerySpec("q315_kendall_tau",
    (s, dir) => {
      val cells = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "lineitem")
          .select(col("l_returnflag").as("flag"),
            expr("cast(round(l_discount * 100) as bigint)").as("x"),
            expr("cast(round(l_quantity) as bigint)").as("y"))
          .groupBy("flag", "x", "y").agg(count(lit(1)).as("c")))
      val pairs = cells.as("a").join(cells.as("b"), Seq("flag"))
        .select(col("flag"),
          (col("a.c") * col("b.c")).as("cc"),
          signum(col("a.x") - col("b.x")).as("sx"),
          signum(col("a.y") - col("b.y")).as("sy"))
      val conc = pairs.groupBy("flag")
        .agg(sum(when(col("sx") * col("sy") > 0, col("cc"))
          .otherwise(0L)).as("c2"),
          sum(when(col("sx") * col("sy") < 0, col("cc"))
            .otherwise(0L)).as("d2"))
      val ties = cells.groupBy("flag").agg(sum("c").as("n"),
        sum(expr("c * (c - 1)")).as("txy2"))
      val tx = cells.groupBy("flag", "x").agg(sum("c").as("cx"))
        .groupBy("flag").agg(sum(expr("cx * (cx - 1)")).as("tx2"))
      val ty = cells.groupBy("flag", "y").agg(sum("c").as("cy"))
        .groupBy("flag").agg(sum(expr("cy * (cy - 1)")).as("ty2"))
      conc.join(ties, Seq("flag")).join(tx, Seq("flag"))
        .join(ty, Seq("flag"))
        .withColumn("n0_2", expr("n * (n - 1)"))
        .select(col("flag"), col("n"),
          expr("c2 div 2").as("concordant"),
          expr("d2 div 2").as("discordant"),
          expr("cast(floor(cast(c2 - d2 as double) / " +
            "sqrt(cast(n0_2 - tx2 as double) * " +
            "cast(n0_2 - ty2 as double)) * 1000000.0) as bigint)")
            .as("tau_ppm"))
        .orderBy("flag")
    },
    Some(raw"""
WITH li AS (
  SELECT l_returnflag AS flag,
    CAST(round(l_discount * 100) AS BIGINT) AS x,
    CAST(round(l_quantity) AS BIGINT) AS y
  FROM lineitem
), cells AS (
  SELECT flag, x, y, CAST(count(*) AS BIGINT) AS c
  FROM li GROUP BY 1, 2, 3
), pairs AS (
  SELECT a.flag,
    CAST(sum(CASE WHEN sign(a.x - b.x) * sign(a.y - b.y) > 0
      THEN a.c * b.c ELSE 0 END) AS BIGINT) AS c2,
    CAST(sum(CASE WHEN sign(a.x - b.x) * sign(a.y - b.y) < 0
      THEN a.c * b.c ELSE 0 END) AS BIGINT) AS d2
  FROM cells a JOIN cells b ON a.flag = b.flag
  GROUP BY 1
), ties AS (
  SELECT flag, CAST(sum(c) AS BIGINT) AS n,
    CAST(sum(c * (c - 1)) AS BIGINT) AS txy2
  FROM cells GROUP BY 1
), tx AS (
  SELECT flag, CAST(sum(cx * (cx - 1)) AS BIGINT) AS tx2
  FROM (SELECT flag, x, CAST(sum(c) AS BIGINT) AS cx
    FROM cells GROUP BY 1, 2) GROUP BY 1
), ty AS (
  SELECT flag, CAST(sum(cy * (cy - 1)) AS BIGINT) AS ty2
  FROM (SELECT flag, y, CAST(sum(c) AS BIGINT) AS cy
    FROM cells GROUP BY 1, 2) GROUP BY 1
)
SELECT p.flag, n, c2 // 2 AS concordant, d2 // 2 AS discordant,
  CAST(floor(CAST(c2 - d2 AS DOUBLE) /
    sqrt(CAST(n * (n - 1) - tx2 AS DOUBLE)
      * CAST(n * (n - 1) - ty2 AS DOUBLE)) * 1000000.0) AS BIGINT)
    AS tau_ppm
FROM pairs p
JOIN ties USING (flag) JOIN tx USING (flag) JOIN ty USING (flag)
ORDER BY flag
"""))

  /** q316 — isotonic (PAVA-equivalent) calibration of purchase rate
    * over spend bins, computed by the exact MINIMAX identity:
    * iso(i) = max_{j≤i} min_{k≥i} mean(y over bins j..k) — the closed
    * form whose value at every i equals the pool-adjacent-violators
    * fit, with no sequential pooling loop to distribute. The curve
    * answers "is P(purchase) monotone in event value, and what is its
    * best monotone approximation?" — the calibration layer q238's
    * reliability bins feed.
    *
    * Scale: the corpus-scale work is ONE binning aggregate (value
    * cents div 2048, capped at 24 bins); prefix sums, the ≤ 300
    * (j,k)-segment frame, the per-j suffix minimum, and the per-k
    * maximum all run on bin-bounded frames — constants at any corpus
    * size. Segment means are exact floor-ppm integers ((10⁶·Y) div N),
    * so min/max comparisons are integer and the whole output is
    * engine-exact; monotonicity of the result is a THEOREM of the
    * minimax form (max_{j≤i} of a family nondecreasing in i), which
    * the oracle's equality check re-certifies bin by bin. */
  val q316 = QuerySpec("q316_isotonic_calibration",
    (s, dir) => {
      val w = Window.orderBy("b")
      val bins = Tables(s, dir, "events")
        .select(expr("least(cast(round(value * 100) as bigint) div 2048," +
          " 23)").as("b"),
          expr("cast(event_type = 'purchase' as long)").as("yy"))
        .groupBy("b")
        .agg(count(lit(1)).as("n"), sum("yy").as("y"))
      val pref = bins
        .withColumn("cn", sum("n").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("cy", sum("y").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      val segs = pref.as("j").select(col("j.b").as("jb"),
          (col("j.cn") - col("j.n")).as("cn0"),
          (col("j.cy") - col("j.y")).as("cy0"))
        .join(pref.as("k").select(col("k.b").as("kb"), col("k.cn"),
          col("k.cy")), col("jb") <= col("kb"))
        .select(col("jb"), col("kb"),
          expr("((cy - cy0) * 1000000) div (cn - cn0)").as("avg_ppm"))
      val tail = segs.withColumn("min_tail", min("avg_ppm").over(
        Window.partitionBy("jb").orderBy(col("kb").desc)
          .rowsBetween(Window.unboundedPreceding, 0)))
      val iso = tail.groupBy(col("kb").as("b"))
        .agg(max("min_tail").as("iso_ppm"))
      bins.join(iso, Seq("b"))
        .select(col("b"), col("n"), col("y"),
          expr("(y * 1000000) div n").as("rate_ppm"), col("iso_ppm"))
        .orderBy("b")
    },
    Some(raw"""
WITH bins AS (
  SELECT LEAST(CAST(round(value * 100) AS BIGINT) // 2048, 23) AS b,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      AS BIGINT) AS y
  FROM events GROUP BY 1
), pref AS (
  SELECT b, n, y,
    CAST(sum(n) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
      AND CURRENT ROW) AS BIGINT) AS cn,
    CAST(sum(y) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
      AND CURRENT ROW) AS BIGINT) AS cy
  FROM bins
), segs AS (
  SELECT j.b AS jb, k.b AS kb,
    ((k.cy - (j.cy - j.y)) * 1000000) // (k.cn - (j.cn - j.n))
      AS avg_ppm
  FROM pref j JOIN pref k ON j.b <= k.b
), tail AS (
  SELECT jb, kb, CAST(min(avg_ppm) OVER (PARTITION BY jb ORDER BY kb DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS min_tail
  FROM segs
), iso AS (
  SELECT kb AS b, CAST(max(min_tail) AS BIGINT) AS iso_ppm
  FROM tail GROUP BY 1
)
SELECT bins.b, n, y, CAST((y * 1000000) // n AS BIGINT) AS rate_ppm,
  iso_ppm
FROM bins JOIN iso USING (b) ORDER BY b
"""))

  /** q319 — Holt double-exponential smoothing (level + trend) of the
    * daily event-count series per type, with 1- and 3-day-ahead
    * forecasts and the in-sample sum of absolute one-step errors: the
    * FORECASTING member of the time-series tier (ACF q248 diagnoses
    * persistence, q249/q247 fit a global trend, EWMA q281 smooths
    * level only — Holt extrapolates level AND trend). α = β = ¼.
    *
    * Determinism: the recurrence runs in milli-scaled integers with
    * explicit floor((·)/4.0) steps — division by 4 is exact in double
    * for any long below 2⁵³, and floor is engine-independent, so the
    * whole trajectory is exact integer replay on both sides (the
    * `div`-vs-`//` negative-operand trap never arises because neither
    * engine's truncating division is used). The Spark side folds
    * sort_array(collect_list) through the `aggregate` HOF — a
    * sequential left fold the engine cannot reorder; the oracle runs
    * the SAME recurrence as a recursive CTE, so two entirely
    * different execution mechanisms must reproduce identical 15-digit
    * state trajectories.
    *
    * Scale: the corpus-scale work is the one daily count aggregate;
    * the fold is over the calendar-bounded per-type day vector (a
    * constant in corpus size), same envelope as q248/q267. */
  val q319 = QuerySpec("q319_holt_winters",
    (s, dir) => {
      val step =
        "cast(floor((e.x * 1000 + 3 * (acc.s + acc.b)) / 4.0) as bigint)"
      Tables(s, dir, "events")
        .groupBy(col("event_type"), expr(dayIdxSpark).as("d"))
        .agg(count(lit(1)).as("x"))
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("d"), col("x"))))
          .as("arr"))
        .where(size(col("arr")) >= 2)
        .withColumn("st", expr(s"""
          aggregate(
            slice(arr, 2, size(arr) - 1),
            named_struct(
              's', element_at(arr, 1).x * 1000,
              'b', (element_at(arr, 2).x - element_at(arr, 1).x) * 1000,
              'sae', cast(0 as bigint)),
            (acc, e) -> named_struct(
              's', $step,
              'b', cast(floor(($step - acc.s + 3 * acc.b) / 4.0)
                as bigint),
              'sae', acc.sae + abs(e.x * 1000 - (acc.s + acc.b))))"""))
        .select(col("event_type"),
          size(col("arr")).cast("long").as("n_days"),
          col("st.s").as("level_milli"), col("st.b").as("trend_milli"),
          col("st.sae").as("sae_milli"),
          (col("st.s") + col("st.b")).as("fc1_milli"),
          (col("st.s") + lit(3L) * col("st.b")).as("fc3_milli"))
        .orderBy("event_type")
    },
    Some(raw"""
WITH RECURSIVE daily AS (
  SELECT event_type, $dayIdxSql AS d, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), seq AS (
  SELECT event_type, x,
    CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
      AS BIGINT) AS rn
  FROM daily
), dn AS (
  SELECT event_type, CAST(max(rn) AS BIGINT) AS nd FROM seq GROUP BY 1
), rec AS (
  SELECT a.event_type, CAST(1 AS BIGINT) AS rn,
    a.x * 1000 AS s, (b2.x - a.x) * 1000 AS b, CAST(0 AS BIGINT) AS sae
  FROM seq a JOIN seq b2 ON b2.event_type = a.event_type AND b2.rn = 2
  WHERE a.rn = 1
  UNION ALL
  SELECT d.event_type, r.rn + 1,
    CAST(floor((d.x * 1000 + 3 * (r.s + r.b)) / 4.0) AS BIGINT),
    CAST(floor((CAST(floor((d.x * 1000 + 3 * (r.s + r.b)) / 4.0)
      AS BIGINT) - r.s + 3 * r.b) / 4.0) AS BIGINT),
    r.sae + abs(d.x * 1000 - (r.s + r.b))
  FROM rec r JOIN seq d ON d.event_type = r.event_type
    AND d.rn = r.rn + 1
)
SELECT r.event_type, nd AS n_days, s AS level_milli, b AS trend_milli,
  sae AS sae_milli, s + b AS fc1_milli, s + 3 * b AS fc3_milli
FROM rec r JOIN dn ON dn.event_type = r.event_type AND r.rn = dn.nd
ORDER BY r.event_type
"""))

  /** q354 — MEDIAN / MAD ROBUST OUTLIER SCREEN per event type (the
    * Hampel rule, |x − med| > 3·MAD — the robust-stats screen that,
    * unlike z-scores, a few extreme values cannot poison because
    * median and MAD have 50% breakdown points): both medians are
    * EXACT LOWER MEDIANS (min v with cum·2 ≥ n) computed through the
    * q266 value-histogram rank idiom — the cents domain is bounded
    * (~49k distinct values), so nothing ever ranks raw rows, and the
    * outlier count comes from the DEVIATION histogram, not a third
    * corpus pass. Two corpus passes total (value histogram; deviation
    * histogram after a broadcast of the 1-row-per-type medians) —
    * the 100 TB shape for any two-level order statistic. Everything
    * is integer; the convention (lower median) is pinned in both
    * engines by construction rather than trusting either engine's
    * median() interpolation. */
  val q354 = QuerySpec("q354_mad_outliers",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("event_type"),
          expr("cast(round(value * 100) as bigint)").as("cents"))
      val wCum = Window.partitionBy("event_type").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("event_type")
      val med = ev.groupBy("event_type", "cents")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(wCum))
        .withColumn("n", sum("cnt").over(wAll))
        .groupBy("event_type")
        .agg(min(when(col("cum") * 2L >= col("n"), col("cents")))
          .as("median_cents"), max("n").as("n"))
      val wCumD = Window.partitionBy("event_type").orderBy("ad")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val devHist = ev.join(broadcast(med), "event_type")
        .select(col("event_type"),
          abs(col("cents") - col("median_cents")).as("ad"))
        .groupBy("event_type", "ad").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(wCumD))
        .withColumn("n", sum("cnt").over(wAll))
      val mad = devHist.groupBy("event_type")
        .agg(min(when(col("cum") * 2L >= col("n"), col("ad")))
          .as("mad_cents"))
      val outliers = devHist.join(broadcast(mad), "event_type")
        .where(col("ad") > col("mad_cents") * 3L)
        .groupBy("event_type").agg(sum("cnt").as("o"))
      med.join(mad, "event_type")
        .join(outliers, Seq("event_type"), "left")
        .select(col("event_type"), col("n"), col("median_cents"),
          col("mad_cents"), coalesce(col("o"), lit(0L)).as("n_outliers"))
        .orderBy("event_type")
    },
    Some(raw"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), h AS (
  SELECT event_type, cents, CAST(count(*) AS BIGINT) AS cnt
  FROM ev GROUP BY 1, 2
), c AS (
  SELECT *, sum(cnt) OVER (PARTITION BY event_type ORDER BY cents
      ROWS UNBOUNDED PRECEDING) AS cum,
    sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM h
), med AS (
  SELECT event_type,
    CAST(min(cents) FILTER (WHERE cum * 2 >= n) AS BIGINT)
      AS median_cents,
    CAST(max(n) AS BIGINT) AS n
  FROM c GROUP BY 1
), dh AS (
  SELECT e.event_type, abs(e.cents - m.median_cents) AS ad,
    CAST(count(*) AS BIGINT) AS cnt
  FROM ev e JOIN med m ON e.event_type = m.event_type
  GROUP BY 1, 2
), dc AS (
  SELECT *, sum(cnt) OVER (PARTITION BY event_type ORDER BY ad
      ROWS UNBOUNDED PRECEDING) AS cum,
    sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM dh
), mad AS (
  SELECT event_type,
    CAST(min(ad) FILTER (WHERE cum * 2 >= n) AS BIGINT) AS mad_cents
  FROM dc GROUP BY 1
), outl AS (
  SELECT d.event_type, CAST(sum(d.cnt) AS BIGINT) AS o
  FROM dh d JOIN mad m ON d.event_type = m.event_type
  WHERE d.ad > m.mad_cents * 3
  GROUP BY 1
)
SELECT med.event_type, med.n, med.median_cents, mad.mad_cents,
  CAST(coalesce(outl.o, 0) AS BIGINT) AS n_outliers
FROM med JOIN mad ON med.event_type = mad.event_type
LEFT JOIN outl ON med.event_type = outl.event_type
ORDER BY med.event_type
"""))

  def all: Seq[QuerySpec] = Seq(q248, q249, q250, q251, q266, q267,
    q270, q309, q314, q315, q316, q319, q354)
}
