package graft.queries

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}
import graft.operators.Packing

/** Round-13 third wave: the model-evaluation / statistical-guardrail
  * tier — the measurements a curation platform runs on its own
  * classifiers and release gates: AUC by the tie-aware rank-sum
  * (Mann–Whitney) identity, Wilson-interval defect gates, and
  * calibration (reliability) bins.
  *
  * Determinism: AUC and calibration are PURE bigint arithmetic (the
  * doubled-midrank trick keeps tie handling integer-exact); the
  * Wilson bound is the one place a square root appears — sqrt is NOT
  * in the banned-transcendental class (IEEE 754 requires correct
  * rounding, so both engines produce the identical double), and the
  * expression text is written once with pinned parenthesization and
  * interpolated into both dialects.
  */
object EvalQueries {

  /** q236 — AUC of the quality score as a detector for English
    * documents, computed by the rank-sum identity AUC =
    * (R₊ − n₊(n₊+1)/2) / (n₊·n₋) with TIES at midrank — the exact
    * statistic sklearn's roc_auc_score produces, reduced to integer
    * arithmetic: scores collapse to the distinct-value frame
    * (value, count, positive-count), the strict-predecessor
    * cumulative count comes from the two-phase prefix-sum core (an
    * RDD sortByKey over the lpad'd score key — never a
    * single-partition window over the value frame), and doubled
    * midranks (2·mid = 2·cum_before + cnt + 1) keep everything
    * bigint. Output: counts, the doubled rank-sum, and AUC in ppm
    * (exact floor; the ·10⁶ numerator stays inside long up to ~10⁹
    * scored documents — the same envelope every ppm figure in this
    * registry carries). AUC ≈ 0.5 here (the quality features are
    * language-blind) — the INTERESTING property is that two engines
    * agree on it to the ppm, ties and all. */
  val q236 = QuerySpec("q236_auc_rank",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(
          round(round(graft.functions.Text.qualityScore(col("text")), 6)
            * 1e6, 0).cast("long").as("q_u"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      val byScore = graft.CacheRegistry.persistTracked(
        docs.groupBy("q_u")
          .agg(count(lit(1)).as("cnt"), sum("pos").as("pc"))
          .withColumn("k", lpad(col("q_u").cast("string"), 8, "0"))
          .withColumn("one", col("cnt")))
      val ranked = Packing.withCumulativeSum(byScore.toDF(), "k", "one", 32)
        .withColumn("mid2",
          (col("cum") - col("cnt")) * 2 + col("cnt") + 1)
      ranked
        .agg(sum(col("pc") * col("mid2")).as("r2_pos"),
          sum("pc").as("n_pos"),
          (sum("cnt") - sum("pc")).as("n_neg"))
        .withColumn("auc_ppm", expr(
          "((r2_pos - n_pos * (n_pos + 1)) * 1000000) div " +
            "(2 * n_pos * n_neg)"))
        .select("n_pos", "n_neg", "r2_pos", "auc_ppm")
    },
    Some(raw"""
WITH docs AS (
  SELECT CAST(round(round(${TextQueries.sqlQuality}, 6) * 1e6, 0)
      AS BIGINT) AS q_u,
    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
), by_score AS (
  SELECT q_u, CAST(count(*) AS BIGINT) AS cnt,
    CAST(sum(pos) AS BIGINT) AS pc
  FROM docs GROUP BY q_u
), ranked AS (
  SELECT cnt, pc,
    (sum(cnt) OVER (ORDER BY q_u ROWS UNBOUNDED PRECEDING) - cnt) * 2
      + cnt + 1 AS mid2
  FROM by_score
), agg AS (
  SELECT CAST(sum(pc * mid2) AS BIGINT) AS r2_pos,
    CAST(sum(pc) AS BIGINT) AS n_pos,
    CAST(sum(cnt) - sum(pc) AS BIGINT) AS n_neg
  FROM ranked
)
SELECT n_pos, n_neg, r2_pos,
  ((r2_pos - n_pos * (n_pos + 1)) * 1000000) // (2 * n_pos * n_neg)
    AS auc_ppm
FROM agg
"""))

  /** The Wilson 95% interval endpoints as dialect-shared expression
    * text over bigint columns `d` (defects) and `n`: z = 1.96
    * (z² = 3.8416 exactly as a literal), every operation and paren
    * pinned so both engines execute the identical IEEE sequence; the
    * only non-arithmetic op is sqrt, which IEEE 754 requires to be
    * correctly rounded — bit-identical across conforming engines. */
  private def wilson(sign: String): String =
    "((pd + 1.9208 / nd " + sign + " 1.96 * sqrt(" +
      "(pd * (1.0 - pd) + 0.9604 / nd) / nd)) / (1.0 + 3.8416 / nd))"

  /** q237 — Wilson-interval release gate: per source, the defect rate
    * (documents under the 0.5 quality bar) with its Wilson 95%
    * lower/upper bounds — the statistically honest form of "is this
    * source's defect rate above 30%?" that a raw proportion can't
    * answer at small n (the gate a curation platform runs before
    * admitting a source into a training mix). Bounds floor to ppm
    * AFTER the pinned-order float evaluation (see [[wilson]]); the
    * gate column compares the ppm INTEGER, so the driver-checked
    * decision is integer-exact end to end. One aggregate, no joins,
    * |sources| output rows. */
  val q237 = QuerySpec("q237_wilson_gate",
    (s, dir) => {
      val per = Tables(s, dir, "documents")
        .select(col("source"),
          when(round(graft.functions.Text.qualityScore(col("text")), 6)
            < 0.5, 1L).otherwise(0L).as("defect"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("defect").as("d"))
      per
        .withColumn("pd", expr("cast(d as double) / cast(n as double)"))
        .withColumn("nd", expr("cast(n as double)"))
        .withColumn("rate_ppm", expr("(d * 1000000) div n"))
        .withColumn("wilson_lo_ppm",
          expr(s"cast(floor(${wilson("-")} * 1000000.0) as bigint)"))
        .withColumn("wilson_hi_ppm",
          expr(s"cast(floor(${wilson("+")} * 1000000.0) as bigint)"))
        .withColumn("gate_fail", col("wilson_lo_ppm") > 300000L)
        .select("source", "n", "d", "rate_ppm",
          "wilson_lo_ppm", "wilson_hi_ppm", "gate_fail")
        .orderBy("source")
    },
    Some(raw"""
WITH per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
    CAST(count(*) FILTER (
      WHERE round(${TextQueries.sqlQuality}, 6) < 0.5) AS BIGINT) AS d
  FROM documents GROUP BY source
), w AS (
  SELECT source, n, d,
    CAST(d AS DOUBLE) / CAST(n AS DOUBLE) AS pd,
    CAST(n AS DOUBLE) AS nd
  FROM per
)
SELECT source, n, d,
  (d * 1000000) // n AS rate_ppm,
  CAST(floor(${wilson("-")} * 1000000.0) AS BIGINT) AS wilson_lo_ppm,
  CAST(floor(${wilson("+")} * 1000000.0) AS BIGINT) AS wilson_hi_ppm,
  CAST(floor(${wilson("-")} * 1000000.0) AS BIGINT) > 300000
    AS gate_fail
FROM w ORDER BY source
"""))

  /** q238 — calibration (reliability) bins: does the quality score,
    * read as P(document is English)-style confidence, mean what it
    * says? Ten equal-width score bins; per bin the mean predicted
    * value in exact micro-units (integer sum div count — no float
    * mean) against the observed positive rate in ppm — the
    * reliability-diagram table, from which ECE or a recalibration
    * map is one more aggregate. Everything bigint; one map-side-
    * combining aggregate over a narrow projection. */
  val q238 = QuerySpec("q238_calibration_bins",
    (s, dir) => {
      Tables(s, dir, "documents")
        .select(
          round(round(graft.functions.Text.qualityScore(col("text")), 6)
            * 1e6, 0).cast("long").as("q_u"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
        .withColumn("bin", least(lit(9L), expr("q_u div 100000")))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("q_u").as("sq"),
          sum("pos").as("n_pos"))
        .select(col("bin"), col("n"),
          expr("sq div n").as("mean_pred_u"),
          expr("(n_pos * 1000000) div n").as("obs_pos_ppm"))
        .orderBy("bin")
    },
    Some(raw"""
WITH docs AS (
  SELECT CAST(round(round(${TextQueries.sqlQuality}, 6) * 1e6, 0)
      AS BIGINT) AS q_u,
    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents
), b AS (
  SELECT least(9, q_u // 100000) AS bin, q_u, pos FROM docs
)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(q_u) // count(*) AS BIGINT) AS mean_pred_u,
  CAST((sum(pos) * 1000000) // count(*) AS BIGINT) AS obs_pos_ppm
FROM b GROUP BY bin ORDER BY bin
"""))

  /** q239 — exact two-sample Kolmogorov–Smirnov statistic between the
    * English and non-English quality-score distributions: the
    * distribution-level drift test that completes the family (q156
    * watches stream-side histogram drift; q210 trends a scalar; this
    * is the exact "are these two samples from the same distribution"
    * statistic). D = max over thresholds |F_A − F_B|, kept integer by
    * cross-multiplying: D_scaled = max |cumA·n_B − cumB·n_A|, reported
    * as d_ppm = (D_scaled·10⁶) div (n_A·n_B) with the FIRST threshold
    * attaining the max (min q_u tie-break — a deterministic argmax).
    * The two cumulatives run as two passes of the two-phase prefix-sum
    * core over the distinct-score frame (same sort key, linear scale;
    * never a single-partition window); cross-products stay inside
    * long up to ~3·10⁹ rows per side. */
  val q239 = QuerySpec("q239_ks_two_sample",
    (s, dir) => {
      val byScore = Tables(s, dir, "documents")
        .select(
          round(round(graft.functions.Text.qualityScore(col("text")), 6)
            * 1e6, 0).cast("long").as("q_u"),
          when(col("lang") === "en", 1L).otherwise(0L).as("a"),
          when(col("lang") === "en", 0L).otherwise(1L).as("b"))
        .groupBy("q_u")
        .agg(sum("a").as("ca"), sum("b").as("cb"))
        .withColumn("k", lpad(col("q_u").cast("string"), 8, "0"))
      val cumA = Packing.withCumulativeSum(byScore, "k", "ca", 32)
        .withColumnRenamed("cum", "cum_a")
      val cum2 = Packing.withCumulativeSum(
          cumA.select("q_u", "k", "cb", "cum_a"), "k", "cb", 32)
        .withColumnRenamed("cum", "cum_b")
      // totals are the final cumulatives — exact, no second scan
      val stats = cum2.agg(max("cum_a").as("n_a"), max("cum_b").as("n_b"))
      cum2.crossJoin(broadcast(stats))
        .withColumn("gap",
          abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
        .groupBy("n_a", "n_b")
        // argmax(gap) with min-q_u tie-break as ONE packed bigint key
        // (q_u < 2²¹; DuckDB's arg_min takes scalar orderings only):
        // minimize q_u − gap·2²¹
        .agg(max("gap").as("d_scaled"),
          expr("min_by(q_u, q_u - gap * 2097152)").as("at_q_u"))
        .withColumn("d_ppm", expr("(d_scaled * 1000000) div (n_a * n_b)"))
        .select("n_a", "n_b", "d_ppm", "at_q_u")
    },
    Some(raw"""
WITH docs AS (
  SELECT CAST(round(round(${TextQueries.sqlQuality}, 6) * 1e6, 0)
      AS BIGINT) AS q_u,
    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
    CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS b
  FROM documents
), by_score AS (
  SELECT q_u, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
  FROM docs GROUP BY q_u
), cums AS (
  SELECT q_u,
    sum(ca) OVER (ORDER BY q_u ROWS UNBOUNDED PRECEDING) AS cum_a,
    sum(cb) OVER (ORDER BY q_u ROWS UNBOUNDED PRECEDING) AS cum_b
  FROM by_score
), tot AS (
  SELECT max(cum_a) AS n_a, max(cum_b) AS n_b FROM cums
), gaps AS (
  SELECT c.q_u, t.n_a, t.n_b,
    abs(c.cum_a * t.n_b - c.cum_b * t.n_a) AS gap
  FROM cums c, tot t
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  CAST((max(gap) * 1000000) // (n_a * n_b) AS BIGINT) AS d_ppm,
  CAST(arg_min(q_u, q_u - gap * 2097152) AS BIGINT) AS at_q_u
FROM gaps GROUP BY n_a, n_b
"""))

  /** q241 — NATIVE session windows (`session_window(ts, '30
    * minutes')`): the built-in gap-based sessionizer, exercised from
    * the registry so the engine covers BOTH sessionization paths —
    * this declarative one (Catalyst plans it as a per-key merging
    * aggregate; at scale it shuffles once on user and needs no state
    * store in batch) and the custom `flatMapGroupsWithState` path
    * ([[graft.streaming.SessionizeStream]]) for semantics the
    * built-in can't express. Sessions run at MICROSECOND precision
    * (the fixture's ts carries µs; a floor-to-seconds oracle would
    * mis-split borderline gaps): an event extends its session iff
    * t − prev < 30 min exactly as the oracle's lag/cumsum island
    * replay defines it. Output is the session-size histogram with
    * exact µs duration sums — bounded rows at any scale. */
  val q241 = QuerySpec("q241_session_window",
    (s, dir) => {
      val sess = Tables(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("n_events"),
          (expr("unix_micros(w.end)") - expr("unix_micros(w.start)") -
            lit(1800000000L)).as("dur_us"))
      sess.groupBy("n_events")
        .agg(count(lit(1)).as("n_sessions"),
          sum("dur_us").as("sum_dur_us"), max("dur_us").as("max_dur_us"))
        .orderBy("n_events")
    },
    Some(raw"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t FROM events
), lagged AS (
  SELECT user_id, t,
    CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
      OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= 1800000000
      THEN 1 ELSE 0 END AS brk
  FROM ev
), sid AS (
  SELECT user_id, t,
    sum(brk) OVER (PARTITION BY user_id ORDER BY t
      ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagged
), sess AS (
  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
    max(t) - min(t) AS dur_us
  FROM sid GROUP BY 1, 2
)
SELECT n_events, CAST(count(*) AS BIGINT) AS n_sessions,
  CAST(sum(dur_us) AS BIGINT) AS sum_dur_us,
  CAST(max(dur_us) AS BIGINT) AS max_dur_us
FROM sess GROUP BY n_events ORDER BY n_events
"""))

  /** q242 — backward as-of join through the engine's own PHYSICAL
    * operator ([[org.apache.spark.sql.graftexec.AsOfJoinExec]], the
    * custom LogicalPlan → Strategy → SparkPlan stack GraftExtensions
    * injects): every click joined to its user's most recent
    * purchase-or-earlier event, then rolled up per user — the same
    * semantics q64 builds from the union+window composition, now
    * planned as a co-partitioned sorted MERGE with one retained row
    * of state (no union materialization, no window buffer). The
    * oracle is DuckDB's native ASOF JOIN — engine-vs-engine on the
    * operator both implement natively. Rollup: per user, clicks,
    * matched clicks, and the exact sum of click→purchase lags in
    * µs (unmatched clicks excluded), bucketed by user id mod 16 to
    * keep output bounded. */
  val q242 = QuerySpec("q242_asof_exec",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("t"), col("event_id"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("t"), col("event_id"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("t").as("p_t"))
      val joined = org.apache.spark.sql.graftexec.AsOfJoinPhysical
        .joinBackward(clicks, purchases, "user_id", "p_user", "t", "p_t")
      joined
        .groupBy(expr("pmod(user_id, 16)").as("bucket"))
        .agg(count(lit(1)).as("n_clicks"),
          sum(when(col("p_t").isNotNull, 1L).otherwise(0L)).as("n_matched"),
          sum(when(col("p_t").isNotNull, col("t") - col("p_t"))
            .otherwise(0L)).as("sum_lag_us"))
        .orderBy("bucket")
    },
    Some(raw"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events
), clicks AS (
  SELECT user_id, t FROM ev WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, t AS p_t FROM ev WHERE event_type = 'purchase'
), j AS (
  SELECT c.user_id, c.t, p.p_t
  FROM clicks c ASOF LEFT JOIN purchases p
    ON c.user_id = p.user_id AND p.p_t <= c.t
)
SELECT user_id % 16 AS bucket,
  CAST(count(*) AS BIGINT) AS n_clicks,
  CAST(count(p_t) AS BIGINT) AS n_matched,
  CAST(coalesce(sum(t - p_t), 0) AS BIGINT) AS sum_lag_us
FROM j GROUP BY 1 ORDER BY bucket
"""))

  /** q243 — FORWARD as-of through the physical operator
    * ([[org.apache.spark.sql.graftexec.AsOfJoinExec]] with
    * `forward=true`): every click joined to its user's EARLIEST
    * following (or simultaneous) purchase — the time-to-convert
    * direction — same co-partitioned sorted-merge plan with time
    * reversed. The oracle replays the forward match with a min-over-
    * following window (DuckDB ASOF is backward-only), so the custom
    * exec is checked against an independent SQL formulation rather
    * than a twin implementation. Output mirrors q242's bucketed
    * rollup with forward lags. */
  val q243 = QuerySpec("q243_asof_forward_exec",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("t"), col("event_id"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("t"), col("event_id"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("t").as("p_t"))
      val joined = org.apache.spark.sql.graftexec.AsOfJoinPhysical
        .joinForward(clicks, purchases, "user_id", "p_user", "t", "p_t")
      joined
        .groupBy(expr("pmod(user_id, 16)").as("bucket"))
        .agg(count(lit(1)).as("n_clicks"),
          sum(when(col("p_t").isNotNull, 1L).otherwise(0L)).as("n_matched"),
          sum(when(col("p_t").isNotNull, col("p_t") - col("t"))
            .otherwise(0L)).as("sum_lag_us"))
        .orderBy("bucket")
    },
    Some(raw"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
), clicks AS (
  SELECT user_id, t FROM ev WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, t AS p_t FROM ev WHERE event_type = 'purchase'
), j AS (
  SELECT c.user_id, c.t,
    (SELECT min(p.p_t) FROM purchases p
     WHERE p.user_id = c.user_id AND p.p_t >= c.t) AS p_t
  FROM clicks c
)
SELECT user_id % 16 AS bucket,
  CAST(count(*) AS BIGINT) AS n_clicks,
  CAST(count(p_t) AS BIGINT) AS n_matched,
  CAST(coalesce(sum(p_t - t), 0) AS BIGINT) AS sum_lag_us
FROM j GROUP BY 1 ORDER BY bucket
"""))

  /** q244 — declarative data-contract audit (the dbt-test / Deequ
    * constraint suite reduced to its engine core): one bounded report
    * over the whole star schema — referential integrity (orders →
    * customer, lineitem → orders, events.user_id → the user universe
    * implied by events itself is skipped as vacuous; supplier →
    * nation), key uniqueness (lineitem's (l_orderkey, l_linenumber),
    * which the synthetic fixture DELIBERATELY violates — the audit
    * must report, not hide, the known duplicates), domain constraints
    * (event_type's accepted values, non-negative totals), and
    * completeness (non-null keys). Every check is one aggregate or
    * one anti-join — the shapes that stay linear at 100 TB — and the
    * report is |constraints| rows of exact violation counts with a
    * pass flag, union'd in a fixed order. */
  val q244 = QuerySpec("q244_constraint_audit",
    (s, dir) => {
      def row(name: String, df: org.apache.spark.sql.DataFrame) =
        df.select(lit(name).as("constraint_name"),
          col("n_violations").cast("long").as("n_violations"),
          (col("n_violations") === 0L).as("pass"))
      val orders = Tables(s, dir, "orders")
      val customer = Tables(s, dir, "customer")
      val lineitem = Tables(s, dir, "lineitem")
      val supplier = Tables(s, dir, "supplier")
      val nation = Tables(s, dir, "nation")
      val events = Tables(s, dir, "events")
      val fkOrdersCust = orders.join(
          customer.select(col("c_custkey")).distinct(),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      val fkLineOrders = lineitem.join(
          orders.select(col("o_orderkey")).distinct(),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      val fkSuppNation = supplier.join(
          nation.select(col("n_nationkey")).distinct(),
          col("s_nationkey") === col("n_nationkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      val uniqLine = lineitem.groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("c")).where(col("c") > 1)
        .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_violations"))
      val domainEvents = events
        .agg(sum(when(col("event_type").isin(
          "click", "view", "purchase", "signup", "error"), 0L)
          .otherwise(1L)).as("n_violations"))
      val nonNegTotals = orders
        .agg(sum(when(col("o_totalprice") >= 0, 0L).otherwise(1L))
          .as("n_violations"))
      val notNullUser = events
        .agg(sum(when(col("user_id").isNotNull, 0L).otherwise(1L))
          .as("n_violations"))
      row("fk_orders_customer", fkOrdersCust)
        .unionByName(row("fk_lineitem_orders", fkLineOrders))
        .unionByName(row("fk_supplier_nation", fkSuppNation))
        .unionByName(row("unique_lineitem_key", uniqLine))
        .unionByName(row("domain_event_type", domainEvents))
        .unionByName(row("nonneg_order_total", nonNegTotals))
        .unionByName(row("notnull_event_user", notNullUser))
        .orderBy("constraint_name")
    },
    Some(raw"""
WITH checks AS (
  SELECT 'fk_orders_customer' AS constraint_name,
    (SELECT CAST(count(*) AS BIGINT) FROM orders o
     WHERE NOT EXISTS (SELECT 1 FROM customer c
                       WHERE c.c_custkey = o.o_custkey)) AS n_violations
  UNION ALL
  SELECT 'fk_lineitem_orders',
    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
     WHERE NOT EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'fk_supplier_nation',
    (SELECT CAST(count(*) AS BIGINT) FROM supplier s
     WHERE NOT EXISTS (SELECT 1 FROM nation n
                       WHERE n.n_nationkey = s.s_nationkey))
  UNION ALL
  SELECT 'unique_lineitem_key',
    (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM (
       SELECT count(*) AS c FROM lineitem
       GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1))
  UNION ALL
  SELECT 'domain_event_type',
    (SELECT CAST(count(*) FILTER (WHERE event_type NOT IN
       ('click', 'view', 'purchase', 'signup', 'error')) AS BIGINT)
     FROM events)
  UNION ALL
  SELECT 'nonneg_order_total',
    (SELECT CAST(count(*) FILTER (WHERE o_totalprice < 0) AS BIGINT)
     FROM orders)
  UNION ALL
  SELECT 'notnull_event_user',
    (SELECT CAST(count(*) FILTER (WHERE user_id IS NULL) AS BIGINT)
     FROM events)
)
SELECT constraint_name, n_violations, n_violations = 0 AS pass
FROM checks ORDER BY constraint_name
"""))

  def all: Seq[QuerySpec] = Seq(q236, q237, q238, q239, q241, q242,
    q243, q244)
}
