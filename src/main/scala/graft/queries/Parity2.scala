package graft.queries

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}

/** Engine-breadth inventory beyond the reference's own operator set
  * (SURVEY.md §2 notes which families the reference lacks — set ops,
  * rollup, pivot, semi joins, rich aggregates; a user migrating real
  * workloads needs them, so they ship verified like everything else).
  */
object Parity2 {

  /** q50 — set ops: union / intersect / except with tags (D2-adjacent;
    * the reference has none, SURVEY.md §2.4). */
  val q50 = QuerySpec("q50_set_ops",
    (s, dir) => {
      val p = Tables(s, dir, "part")
      val big = p.where(col("p_size") > 25).select("p_brand").distinct()
      val pricey = p.where(col("p_retailprice") > 1500).select("p_brand").distinct()
      big.intersect(pricey).withColumn("tag", lit("both"))
        .unionByName(big.except(pricey).withColumn("tag", lit("big_only")))
        .unionByName(pricey.except(big).withColumn("tag", lit("pricey_only")))
        .orderBy("tag", "p_brand")
    },
    Some("""
WITH big AS (SELECT DISTINCT p_brand FROM part WHERE p_size > 25),
pricey AS (SELECT DISTINCT p_brand FROM part WHERE p_retailprice > 1500)
SELECT p_brand, 'both' AS tag FROM (SELECT * FROM big INTERSECT SELECT * FROM pricey)
UNION ALL
SELECT p_brand, 'big_only' AS tag FROM (SELECT * FROM big EXCEPT SELECT * FROM pricey)
UNION ALL
SELECT p_brand, 'pricey_only' AS tag FROM (SELECT * FROM pricey EXCEPT SELECT * FROM big)
ORDER BY tag, p_brand
"""))

  /** q51 — rollup with grouping flags (A-family extension). */
  val q51 = QuerySpec("q51_rollup",
    (s, dir) => {
      val n = Tables(s, dir, "nation")
      val c = Tables(s, dir, "customer")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_regionkey").cast("long").as("regionkey"),
          col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          round(sum(col("c_acctbal")), 2).as("total_bal"),
          grouping_id().cast("long").as("lvl"))
        .orderBy(asc_nulls_first("regionkey"), asc_nulls_first("n_name"),
          asc("lvl"))
    },
    Some("""
SELECT CAST(n_regionkey AS BIGINT) AS regionkey, n_name,
  CAST(count(*) AS BIGINT) AS n_cust,
  round(sum(c_acctbal), 2) AS total_bal,
  CAST(grouping(n_regionkey) * 2 + grouping(n_name) AS BIGINT) AS lvl
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_regionkey, n_name)
ORDER BY regionkey ASC NULLS FIRST, n_name ASC NULLS FIRST, lvl
"""))

  /** q52 — pivot: event counts per user bucket × event type (explicit
    * pivot values keep the schema static, as a 100 TB plan must). */
  val q52 = QuerySpec("q52_pivot",
    (s, dir) => Tables(s, dir, "events")
      .withColumn("bucket", (col("user_id") % 10).cast("long"))
      .groupBy("bucket")
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("bucket"),
    Some("""
SELECT CAST(user_id % 10 AS BIGINT) AS bucket,
  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase
FROM events GROUP BY 1 ORDER BY bucket
"""))

  /** q53 — left-semi join (J-family extension; complements q15's anti). */
  val q53 = QuerySpec("q53_semi_join",
    (s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .where(col("o_totalprice") > 200000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
ORDER BY c_custkey
"""))

  /** q54 — statistical aggregates: exact interpolating percentiles,
    * sample stddev/variance, correlation (A-family extension). */
  val q54 = QuerySpec("q54_stats_agg",
    (s, dir) => Tables(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(percentile(col("l_quantity"), lit(0.25)), 6).as("q25"),
        round(percentile(col("l_quantity"), lit(0.5)), 6).as("q50"),
        round(percentile(col("l_quantity"), lit(0.9)), 6).as("q90"),
        round(stddev(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_extendedprice")), 2).as("var_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"))
      .orderBy("l_returnflag"),
    Some("""
SELECT l_returnflag,
  round(quantile_cont(l_quantity, 0.25), 6) AS q25,
  round(quantile_cont(l_quantity, 0.5), 6) AS q50,
  round(quantile_cont(l_quantity, 0.9), 6) AS q90,
  round(stddev_samp(l_extendedprice), 4) AS sd_price,
  round(var_samp(l_extendedprice), 2) AS var_price,
  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""))

  /** q55 — array aggregation + functions: per-order sorted quantity
    * list, slicing, containment (collect_list sorted for determinism).
    * Array-typed columns are serialized to canonical strings
    * (`array_join` / DuckDB `array_to_string`) so the compared frame
    * is scalar-only — the oracle harness hashes pandas cells and
    * cannot hash numpy arrays. Quantities are whole-valued doubles in
    * the testdata, so a fixed %.1f rendering is exact on both engines.
    */
  val q55 = QuerySpec("q55_array_funcs",
    (s, dir) => Tables(s, dir, "lineitem")
      .where(col("l_orderkey") % 100 === 0)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_quantity"))).as("qtys_a"))
      .select(col("l_orderkey"),
        array_join(transform(col("qtys_a"), x => format_string("%.1f", x)), ",")
          .as("qtys"),
        size(col("qtys_a")).cast("long").as("n"),
        array_join(transform(slice(col("qtys_a"), 1, 2),
          x => format_string("%.1f", x)), ",").as("first2"),
        array_contains(col("qtys_a"), 1.0).as("has_one"),
        round(aggregate(col("qtys_a"), lit(0.0), (a, x) => a + x), 6).as("total"))
      .orderBy("l_orderkey"),
    Some("""
WITH agg AS (
  SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys_a
  FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY l_orderkey
)
SELECT l_orderkey,
  array_to_string(list_transform(qtys_a, x -> format('{:.1f}', x)), ',') AS qtys,
  CAST(len(qtys_a) AS BIGINT) AS n,
  array_to_string(list_transform(qtys_a[1:2], x -> format('{:.1f}', x)), ',') AS first2,
  list_contains(qtys_a, 1.0) AS has_one,
  round(list_sum(qtys_a), 6) AS total
FROM agg ORDER BY l_orderkey
"""))

  /** q56 — string function battery over part names (E10-adjacent). */
  val q56 = QuerySpec("q56_string_funcs",
    (s, dir) => Tables(s, dir, "part")
      .select(col("p_partkey"),
        substring(col("p_name"), 1, 5).as("sub"),
        locate("a", col("p_name")).cast("long").as("pos_a"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        reverse(col("p_type")).as("rev"),
        length(col("p_name")).cast("long").as("len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
      .orderBy("p_partkey"),
    Some("""
SELECT p_partkey,
  substr(p_name, 1, 5) AS sub,
  CAST(strpos(p_name, 'a') AS BIGINT) AS pos_a,
  lpad(p_brand, 12, '*') AS padded,
  reverse(p_type) AS rev,
  CAST(length(p_name) AS BIGINT) AS len,
  concat_ws('|', p_brand, p_type) AS joined,
  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
FROM part ORDER BY p_partkey
"""))

  /** q57 — analytic windows: running revenue + moving average + share
    * per customer over order dates (frame-specified windows). */
  val q57 = QuerySpec("q57_running_window",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byCust = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      val last3 = byCust.rowsBetween(-2, 0)
      Tables(s, dir, "orders")
        .where(col("o_custkey") % 50 === 0)
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
          col("o_totalprice"),
          round(sum(col("o_totalprice")).over(
            byCust.rowsBetween(Window.unboundedPreceding, 0)), 2).as("running"),
          round(avg(col("o_totalprice")).over(last3), 4).as("ma3"),
          round(col("o_totalprice") /
            sum(col("o_totalprice")).over(Window.partitionBy("o_custkey")), 6)
            .as("share"))
        .orderBy("o_custkey", "d", "o_orderkey")
    },
    Some("""
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS d,
  o_totalprice,
  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
    ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
  round(avg(o_totalprice) OVER (PARTITION BY o_custkey
    ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3,
  round(o_totalprice / sum(o_totalprice) OVER (PARTITION BY o_custkey), 6) AS share
FROM orders WHERE o_custkey % 50 = 0
ORDER BY o_custkey, d, o_orderkey
"""))

  /** q58 — conditional/null functions battery (P3/P4 extensions). */
  val q58 = QuerySpec("q58_null_funcs",
    (s, dir) => Tables(s, dir, "customer")
      .select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
          .as("seg_or"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_pos"),
        least(col("c_acctbal"), lit(1000.0)).as("bal_cap"),
        when(col("c_acctbal") < 0, lit("overdrawn"))
          .when(col("c_acctbal") < 1000, lit("low"))
          .otherwise(lit("high")).as("bal_class"))
      .orderBy("c_custkey"),
    Some("""
SELECT c_custkey,
  nullif(c_mktsegment, 'BUILDING') AS seg_nb,
  COALESCE(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or,
  greatest(c_acctbal, 0.0) AS bal_pos,
  least(c_acctbal, 1000.0) AS bal_cap,
  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
       WHEN c_acctbal < 1000 THEN 'low'
       ELSE 'high' END AS bal_class
FROM customer ORDER BY c_custkey
"""))

  /** q59 — gap-based sessionization (30-min inactivity gap): the
    * canonical two-window pattern — new-session flag via lag, session
    * id via running sum. One shuffle on user_id serves both windows
    * (same partitioning), then the session aggregation reuses it.
    */
  val q59 = QuerySpec("q59_sessionize",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("is_new",
          when(col("ts_us") - lag("ts_us", 1).over(w) > 1800L * 1000000L, 1)
            .when(lag("ts_us", 1).over(w).isNull, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts_us").as("start_us"), max("ts_us").as("end_us"),
          // decimal sum: order-insensitive (see q14's scale-stability note)
          round(sum(col("value").cast("decimal(28,10)")), 2)
            .cast("double").as("total_value"))
        .select(col("user_id"), col("session_id").cast("long").as("session_id"),
          col("n_events"), col("start_us"), col("end_us"), col("total_value"))
        .orderBy("user_id", "session_id")
    },
    Some("""
WITH base AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
), flagged AS (
  SELECT *, CASE
      WHEN ts_us - lag(ts_us) OVER w > 1800 * 1000000 THEN 1
      WHEN lag(ts_us) OVER w IS NULL THEN 1
      ELSE 0 END AS is_new
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sessions AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
  CAST(count(*) AS BIGINT) AS n_events,
  min(ts_us) AS start_us, max(ts_us) AS end_us,
  CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_value
FROM sessions GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""))

  /** q63 — E12 downstream Looker calculated fields
    * (`/root/reference/README.md:255-285`) over the pipeline output:
    * guarded price/fair ratios, mos bucket, hunter flag. */
  val q63 = QuerySpec("q63_looker_fields",
    (s, dir) => {
      import graft.functions.{Valuation => V}
      val out = graft.Pipeline.run(
        graft.Pipeline.syntheticFundamentals(s, dir), col("p_partkey"))
      out.select(col("ticker"),
          round(V.discountToFairPct(col("price"), col("fair_value")), 6)
            .as("discount_to_fair_pct"),
          round(V.premiumToFairPct(col("price"), col("fair_value")), 6)
            .as("premium_to_fair_pct"),
          round(V.priceToFair(col("price"), col("fair_value")), 6)
            .as("price_to_fair"),
          round(V.priceToGraham(col("price"), col("graham_value")), 6)
            .as("price_to_graham"),
          V.mosBucket(col("margin_of_safety")).as("mos_bucket"),
          V.hunterFlag(col("valuation_hunter")).as("hunter_flag"))
        .orderBy("ticker")
    },
    Some(Parity.valuationCtes + """
SELECT ticker,
  round(CASE WHEN fair_value > 0 THEN 100 * (fair_value - price) / fair_value END, 6) AS discount_to_fair_pct,
  round(CASE WHEN fair_value > 0 THEN 100 * (price - fair_value) / fair_value END, 6) AS premium_to_fair_pct,
  round(CASE WHEN fair_value > 0 THEN price / fair_value END, 6) AS price_to_fair,
  round(CASE WHEN graham_value > 0 THEN price / graham_value END, 6) AS price_to_graham,
  CASE WHEN margin_of_safety IS NULL THEN 'unknown'
       WHEN margin_of_safety >= 0.25 THEN '>=25%'
       WHEN margin_of_safety >= 0.10 THEN '10-25%'
       WHEN margin_of_safety >= 0 THEN '0-10%'
       ELSE '<0%' END AS mos_bucket,
  CASE WHEN valuation_hunter = 'pass' THEN 'PASS'
       WHEN valuation_hunter = 'fail' THEN 'FAIL'
       ELSE 'UNKNOWN' END AS hunter_flag
FROM labeled ORDER BY ticker
"""))

  /** q64 — backward as-of join (graft.operators.AsOf): each click
    * matched to the user's most recent purchase at or before it.
    * Verified against DuckDB's NATIVE ASOF JOIN — two independent
    * implementations of the operator must agree row-for-row.
    */
  val q64 = QuerySpec("q64_asof_join",
    (s, dir) => {
      import graft.operators.AsOf
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      // dedup purchases to one per (user, ts): as-of is undefined on
      // ties, so make the right side unique deterministically
      val w = Window.partitionBy("user_id", "ts_us").orderBy(desc("event_id"))
      val purchases = ev.where(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("user_id"), col("ts_us").as("p_ts_us"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      AsOf.joinBackward(clicks, purchases, key = "user_id",
          leftTs = "ts_us", rightTs = "p_ts_us",
          rightPayload = Seq("p_event_id", "p_value"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("__match.p_ts_us").as("p_ts_us"),
          col("__match.p_event_id").as("p_event_id"),
          round(col("__match.p_value"), 6).as("p_value"))
        .orderBy("event_id")
    },
    Some("""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
  FROM events
), clicks AS (
  SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts_us AS p_ts_us, event_id AS p_event_id, value AS p_value
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts_us
      ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'purchase'
  ) WHERE rn = 1
)
SELECT c.event_id, c.user_id, c.ts_us,
  p.p_ts_us, p.p_event_id, round(p.p_value, 6) AS p_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND p.p_ts_us <= c.ts_us
ORDER BY c.event_id
"""))

  /** q65 — the SQL entry path: temp views + spark.sql, with JSON
    * struct parsing (from_json) and semi-structured aggregation. A
    * user of the engine can run plain SQL, not just the DataFrame API.
    */
  val q65 = QuerySpec("q65_sql_api_json",
    (s, dir) => {
      Tables(s, dir, "events").createOrReplaceTempView("events_v")
      s.sql("""
        SELECT pmod(from_json(props, 'k INT').k, 5) AS k_mod,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE)
                 AS total_value
        FROM events_v
        WHERE from_json(props, 'k INT').k IS NOT NULL
        GROUP BY 1, 2
        ORDER BY k_mod, event_type
      """)
    },
    Some("""
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 5 AS k_mod,
  event_type, CAST(count(*) AS BIGINT) AS n,
  CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_value
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY 1, 2 ORDER BY k_mod, event_type
"""))

  /** q66 — range (theta) join: orders banded into price tiers by a
    * small broadcast ranges table. Non-equi joins plan as broadcast
    * nested-loop — correct exactly when the inner side is tiny, which
    * is the 100 TB shape for banding tables. */
  val q66 = QuerySpec("q66_range_join",
    (s, dir) => {
      val s2 = s
      import s2.implicits._
      val tiers = Seq(
        (0.0, 50000.0, "small"), (50000.0, 150000.0, "medium"),
        (150000.0, 300000.0, "large"), (300000.0, 1e9, "jumbo")
      ).toDF("lo", "hi", "tier")
      Tables(s, dir, "orders")
        .join(broadcast(tiers),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("tier")
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))
        .orderBy("tier")
    },
    Some("""
WITH tiers(lo, hi, tier) AS (VALUES
  (0.0, 50000.0, 'small'), (50000.0, 150000.0, 'medium'),
  (150000.0, 300000.0, 'large'), (300000.0, 1000000000.0, 'jumbo'))
SELECT tier, CAST(count(*) AS BIGINT) AS n,
  round(avg(o_totalprice), 2) AS avg_price
FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY tier ORDER BY tier
"""))

  /** q99 — FORWARD as-of join (`AsOf.joinForward`): each click
    * matched to the user's next purchase at or after it — the other
    * half of the time-series join family (backward: q64), same
    * one-shuffle union+window shape with the running state carried
    * over descending time. Verified against DuckDB's native ASOF
    * (`ON p_ts >= c_ts`) — two independent implementations agreeing
    * row-for-row.
    */
  val q99 = QuerySpec("q99_asof_forward",
    (s, dir) => {
      import graft.operators.AsOf
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val w = Window.partitionBy("user_id", "ts_us").orderBy(desc("event_id"))
      val purchases = ev.where(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("user_id"), col("ts_us").as("p_ts_us"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      AsOf.joinForward(clicks, purchases, key = "user_id",
          leftTs = "ts_us", rightTs = "p_ts_us",
          rightPayload = Seq("p_event_id", "p_value"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("__match.p_ts_us").as("p_ts_us"),
          col("__match.p_event_id").as("p_event_id"),
          round(col("__match.p_value"), 6).as("p_value"))
        .orderBy("event_id")
    },
    Some("""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
  FROM events
), clicks AS (
  SELECT event_id, user_id, ts_us FROM ev WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts_us AS p_ts_us, event_id AS p_event_id, value AS p_value
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts_us
      ORDER BY event_id DESC) AS rn
    FROM ev WHERE event_type = 'purchase'
  ) WHERE rn = 1
)
SELECT c.event_id, c.user_id, c.ts_us,
  p.p_ts_us, p.p_event_id, round(p.p_value, 6) AS p_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND p.p_ts_us >= c.ts_us
ORDER BY c.event_id
"""))

  val all: Seq[QuerySpec] =
    Seq(q50, q51, q52, q53, q54, q55, q56, q57, q58, q59, q63, q64, q65,
      q66, q99)
}
