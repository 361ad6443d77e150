package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Pipeline, QuerySpec, QueryUtil, Tables}

/** The parity query inventory — one verifiable query per operator family
  * of SURVEY.md §2, phrased over the driver's TPC-H-ish tables so the
  * DuckDB oracle can check each. Every query ends in a total-order
  * `orderBy` mirrored in the oracle SQL, so results are row-for-row
  * deterministic.
  */
object Parity {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** q01 — the reference's entire main query (SURVEY.md §3.1): synthetic
    * fundamentals → cleanse (E10,F1,D1,E1,F3,F2) → sector medians
    * (A1,A2,J1,J2,J3) → valuation ladders (E2–E9) → ordered output
    * (P1,P2). The oracle SQL below mirrors the dataflow stage by stage.
    */
  val q01 = QuerySpec("q01_valuation_pipeline",
    (s, dir) => {
      val out = Pipeline.run(Pipeline.syntheticFundamentals(s, dir), col("p_partkey"))
      QueryUtil.roundDoubles(out.select(Pipeline.orderedCols.map(col): _*))
        .orderBy("ticker")
    },
    Some(valuationCtes + """
SELECT '2026-01-01' AS as_of_date, '2026-01-01T00:00:00Z' AS run_ts_utc,
  ticker, company, sector,
  round(price, 6) AS price,
  round(peg_ratio, 6) AS peg_ratio, peg_ratio_source,
  round(trailing_pe, 6) AS trailing_pe,
  round(sector_median_pe, 6) AS sector_median_pe,
  round(pe_median_used, 6) AS pe_median_used,
  round(forward_pe, 6) AS forward_pe,
  round(earnings_growth, 6) AS earnings_growth,
  round(trailing_eps, 6) AS trailing_eps,
  round(forward_eps, 6) AS forward_eps,
  round(book_value_per_share, 6) AS book_value_per_share,
  round(graham_value, 6) AS graham_value,
  round(margin_of_safety, 6) AS margin_of_safety,
  peg_pass, pe_vs_sector_pass, margin_of_safety_pass, valuation_hunter,
  round(fair_value, 6) AS fair_value, fair_value_source, valuation,
  round(pct_diff, 6) AS pct_diff, currency,
  round(market_cap, 6) AS market_cap,
  round(target_mean_price, 6) AS target_mean_price
FROM labeled ORDER BY ticker
"""))

  /** Shared oracle CTE chain for the full valuation dataflow, ending in
    * the `labeled` relation (used by q01 and the E12 derived-fields
    * query in Parity2). */
  lazy val valuationCtes: String = """
WITH fundamentals AS (
  SELECT p_partkey,
    translate(p_name, ' ', '.') || '#' || CAST(p_partkey AS VARCHAR) AS ticker,
    p_name AS company,
    CASE WHEN p_partkey % 17 = 0 THEN NULL ELSE p_brand END AS sector,
    CASE WHEN p_partkey % 19 = 0 THEN -p_retailprice ELSE p_retailprice END AS price,
    CASE WHEN p_partkey % 23 = 0 THEN 0.0 ELSE p_retailprice * 1000 END AS market_cap,
    'USD' AS currency,
    CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE p_retailprice / 3.0 + CAST(p_size % 13 AS DOUBLE) END AS trailing_pe,
    CASE WHEN p_partkey % 6 = 0 THEN NULL ELSE p_retailprice / 4.0 + CAST(p_size % 11 AS DOUBLE) END AS forward_pe,
    CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE (CAST(p_size AS DOUBLE) - 25.0) / 2.0 END AS trailing_eps,
    CASE WHEN p_partkey % 8 = 0 THEN NULL ELSE (CAST(p_size AS DOUBLE) - 30.0) / 2.0 END AS forward_eps,
    CASE WHEN p_partkey % 4 = 0 THEN NULL
         WHEN p_partkey % 4 = 1 THEN CAST(p_size % 9 AS DOUBLE) / 10.0
         WHEN p_partkey % 4 = 2 THEN 5.0 + CAST(p_size % 20 AS DOUBLE)
         ELSE -0.1 END AS earnings_growth,
    CASE WHEN p_partkey % 3 = 0 THEN CAST(p_size % 5 AS DOUBLE) * 0.3 ELSE NULL END AS peg_ratio,
    CASE WHEN p_partkey % 11 = 0 THEN NULL ELSE p_retailprice / 12.5 END AS book_value_per_share,
    CASE WHEN p_partkey % 9 = 0 THEN p_retailprice * 1.05 ELSE NULL END AS target_mean_price
  FROM part
), normalized AS (
  SELECT p_partkey, translate(upper(trim(ticker)), '.', '-') AS ticker,
    company, sector, price, market_cap, currency, trailing_pe, forward_pe,
    trailing_eps, forward_eps, earnings_growth, peg_ratio AS peg_reported,
    book_value_per_share, target_mean_price
  FROM fundamentals
  WHERE ticker IS NOT NULL AND ticker <> ''
), deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY ticker ORDER BY p_partkey) AS rn
    FROM normalized
  ) WHERE rn = 1
), cleansed AS (
  SELECT p_partkey, ticker, company,
    CASE WHEN sector IS NULL OR sector = '' THEN 'Unknown' ELSE sector END AS sector,
    CASE WHEN price <= 0 THEN NULL ELSE price END AS price,
    CASE WHEN market_cap <= 0 THEN NULL ELSE market_cap END AS market_cap,
    currency, trailing_pe, forward_pe, trailing_eps, forward_eps,
    earnings_growth, peg_reported, book_value_per_share, target_mean_price
  FROM deduped
), sector_stats AS (
  SELECT sector, median(trailing_pe) AS sector_median_pe,
         median(forward_pe) AS sector_median_fpe
  FROM cleansed GROUP BY sector
), overall AS (
  SELECT median(trailing_pe) AS overall_median_pe,
         median(forward_pe) AS overall_median_fpe
  FROM cleansed
), enriched AS (
  SELECT c.*, ss.sector_median_pe, ss.sector_median_fpe,
    COALESCE(ss.sector_median_pe, o.overall_median_pe) AS pe_median_used,
    COALESCE(ss.sector_median_fpe, o.overall_median_fpe) AS fpe_median_used
  FROM cleansed c LEFT JOIN sector_stats ss USING (sector) CROSS JOIN overall o
), scalars AS (
  SELECT *,
    CASE WHEN trailing_eps > 0 AND book_value_per_share > 0
         THEN sqrt(22.5 * trailing_eps * book_value_per_share) END AS graham_value,
    CASE WHEN peg_reported > 0 THEN 'reported'
         WHEN trailing_pe > 0 AND earnings_growth > 0 THEN 'derived'
         ELSE 'missing' END AS peg_ratio_source,
    CASE WHEN peg_reported > 0 THEN peg_reported
         WHEN trailing_pe > 0 AND earnings_growth > 0
         THEN trailing_pe / (CASE WHEN earnings_growth <= 1 THEN earnings_growth * 100 ELSE earnings_growth END)
         END AS peg_ratio
  FROM enriched
), fair AS (
  SELECT *,
    CASE WHEN graham_value > 0 THEN graham_value
         WHEN target_mean_price > 0 THEN target_mean_price
         WHEN trailing_eps > 0 AND pe_median_used > 0 THEN trailing_eps * pe_median_used
         WHEN forward_eps > 0 AND fpe_median_used > 0 THEN forward_eps * fpe_median_used
         END AS fair_value,
    CASE WHEN graham_value > 0 THEN 'graham_value'
         WHEN target_mean_price > 0 THEN 'target_mean_price'
         WHEN trailing_eps > 0 AND pe_median_used > 0 THEN 'sector_median_trailing_pe'
         WHEN forward_eps > 0 AND fpe_median_used > 0 THEN 'sector_median_forward_pe'
         ELSE 'missing' END AS fair_value_source,
    CASE WHEN graham_value > 0 THEN (graham_value - price) / graham_value END AS margin_of_safety
  FROM scalars
), checks AS (
  SELECT *,
    CASE WHEN NOT (peg_ratio IS NOT NULL AND peg_ratio > 0) THEN 'unknown'
         WHEN peg_ratio < 1.0 THEN 'pass' ELSE 'fail' END AS peg_pass,
    CASE WHEN NOT (trailing_pe IS NOT NULL AND pe_median_used IS NOT NULL) THEN 'unknown'
         WHEN trailing_pe <= pe_median_used * 1.0 THEN 'pass' ELSE 'fail' END AS pe_vs_sector_pass,
    CASE WHEN margin_of_safety IS NULL THEN 'unknown'
         WHEN margin_of_safety >= 0.0 THEN 'pass' ELSE 'fail' END AS margin_of_safety_pass
  FROM fair
), labeled AS (
  SELECT *,
    CASE WHEN peg_pass = 'unknown' OR pe_vs_sector_pass = 'unknown' OR margin_of_safety_pass = 'unknown' THEN 'unknown'
         WHEN peg_pass = 'pass' AND pe_vs_sector_pass = 'pass' AND margin_of_safety_pass = 'pass' THEN 'pass'
         ELSE 'fail' END AS valuation_hunter,
    CASE WHEN price IS NULL OR fair_value IS NULL OR fair_value <= 0 THEN 'unknown'
         WHEN price <= fair_value * 0.90 THEN 'undervalued'
         WHEN price >= fair_value * 1.10 THEN 'overvalued'
         ELSE 'fair' END AS valuation,
    (price - fair_value) / fair_value AS pct_diff
  FROM checks
)
"""

  /** q02 — A1 group-by exact median (`transform_valuation.py:216-219`). */
  val q02 = QuerySpec("q02_sector_median_agg",
    (s, dir) => t(s, dir, "supplier")
      .groupBy(col("s_nationkey").cast("long").as("nationkey"))
      .agg(round(median(col("s_acctbal")), 6).as("median_acctbal"),
        count(lit(1)).as("n"))
      .orderBy("nationkey"),
    Some("""
SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
       round(median(s_acctbal), 6) AS median_acctbal,
       CAST(count(*) AS BIGINT) AS n
FROM supplier GROUP BY 1 ORDER BY nationkey
"""))

  /** q03 — A2/J1/J2: per-group median broadcast-joined back with
    * overall-median fallback (`transform_valuation.py:235-236`). Nation 3
    * is forced all-null so the fallback path is actually exercised.
    */
  val q03 = QuerySpec("q03_median_fallback_join",
    (s, dir) => {
      val c = t(s, dir, "customer").withColumn("bal",
        when(col("c_nationkey") % 25 === 3, lit(null).cast("double"))
          .otherwise(col("c_acctbal")))
      val perNation = c.groupBy("c_nationkey")
        .agg(median(col("bal")).as("nation_median_bal"))
      val overall = c.agg(median(col("bal")).as("overall_median_bal"))
      c.join(broadcast(perNation), Seq("c_nationkey"), "left")
        .crossJoin(broadcast(overall))
        .select(col("c_custkey"),
          col("c_nationkey").cast("long").as("nationkey"),
          round(col("bal"), 6).as("bal"),
          round(col("nation_median_bal"), 6).as("nation_median_bal"),
          round(coalesce(col("nation_median_bal"), col("overall_median_bal")), 6)
            .as("median_used"))
        .orderBy("c_custkey")
    },
    Some("""
WITH c AS (
  SELECT c_custkey, c_nationkey,
    CASE WHEN c_nationkey % 25 = 3 THEN NULL ELSE c_acctbal END AS bal
  FROM customer
), per_nation AS (
  SELECT c_nationkey, median(bal) AS nation_median_bal FROM c GROUP BY 1
), overall AS (
  SELECT median(bal) AS overall_median_bal FROM c
)
SELECT c.c_custkey, CAST(c.c_nationkey AS BIGINT) AS nationkey,
  round(c.bal, 6) AS bal,
  round(p.nation_median_bal, 6) AS nation_median_bal,
  round(COALESCE(p.nation_median_bal, o.overall_median_bal), 6) AS median_used
FROM c LEFT JOIN per_nation p USING (c_nationkey) CROSS JOIN overall o
ORDER BY c_custkey
"""))

  /** q04 — A3 conditional aggregates (`README.md:287-292`): count_if /
    * sum(CASE) / rates, plus plain sum/avg/min/max. sum(l_quantity) is a
    * sum of integer-valued doubles — exact, so no rounding needed there.
    */
  val q04 = QuerySpec("q04_conditional_agg",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity") > 25, 1).otherwise(0)).cast("long").as("big_qty_n"),
        (sum(when(col("l_quantity") > 25, 1).otherwise(0)) / count(lit(1)))
          .as("big_qty_rate"),
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .withColumn("big_qty_rate", round(col("big_qty_rate"), 6))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""
SELECT l_returnflag, l_linestatus,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS big_qty_n,
  round(CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS big_qty_rate,
  sum(l_quantity) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_price,
  round(avg(l_discount), 6) AS avg_disc,
  min(l_quantity) AS min_qty,
  max(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""))

  /** q05 — O3 top-k by value (Apps Script "top 3 margin_of_safety" shape,
    * `.gs:91-93`). Catalyst plans ORDER BY+LIMIT as TakeOrderedAndProject
    * — no global sort materialized.
    */
  val q05 = QuerySpec("q05_topk",
    (s, dir) => t(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10),
    Some("""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""))

  /** q06 — O3 "closest to target" top-k (the Gemini prompt's "PEG closest
    * below/around 1", `.gs:92`). */
  val q06 = QuerySpec("q06_topk_closest",
    (s, dir) => t(s, dir, "orders")
      .select(col("o_orderkey"),
        round(abs(col("o_totalprice") - 150000.0), 2).as("dist"))
      .orderBy(asc("dist"), asc("o_orderkey"))
      .limit(5),
    Some("""
SELECT o_orderkey, round(abs(o_totalprice - 150000.0), 2) AS dist
FROM orders ORDER BY dist, o_orderkey LIMIT 5
"""))

  /** q07 — D1 keep-first dedup (`transform_valuation.py:113`): first
    * lineitem per order in linenumber order, via row_number (deterministic
    * winner, unlike dropDuplicates). The synthetic lineitem has duplicate
    * (orderkey, linenumber) pairs, so extra tiebreakers make the order
    * total — exactly SURVEY.md §7.3 risk 3 (keep-first needs a total
    * order to be well-defined at all).
    */
  val q07 = QuerySpec("q07_keep_first_dedup",
    (s, dir) => {
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"))
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("first_line"),
          col("l_partkey"), col("l_quantity"))
        .orderBy("l_orderkey")
    },
    Some("""
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS first_line, l_partkey, l_quantity
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY l_orderkey
    ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS rn
  FROM lineitem
) WHERE rn = 1 ORDER BY l_orderkey
"""))

  /** q08 — D2/O1 distinct + global sort (`extract_tickers.py:41,61`). */
  val q08 = QuerySpec("q08_distinct_sort",
    (s, dir) => t(s, dir, "part").select("p_brand").distinct().orderBy("p_brand"),
    Some("SELECT DISTINCT p_brand FROM part ORDER BY p_brand"))

  /** q09 — P3/P4 fallback chains (`transform_valuation.py:22-30,74-75`):
    * coalesce over null-normalized candidates with a literal default. */
  val q09 = QuerySpec("q09_coalesce_chain",
    (s, dir) => t(s, dir, "part")
      .select(col("p_partkey"),
        coalesce(
          when(col("p_retailprice") > 1800, col("p_retailprice")),
          when(col("p_size") > 25, col("p_size").cast("double")),
          lit(0.0)).as("first_value"),
        coalesce(nullif(col("p_brand"), lit("")), nullif(col("p_type"), lit("")),
          lit("Unknown")).as("first_str"))
      .orderBy("p_partkey"),
    Some("""
SELECT p_partkey,
  COALESCE(CASE WHEN p_retailprice > 1800 THEN p_retailprice END,
           CASE WHEN p_size > 25 THEN CAST(p_size AS DOUBLE) END,
           0.0) AS first_value,
  COALESCE(nullif(p_brand, ''), nullif(p_type, ''), 'Unknown') AS first_str
FROM part ORDER BY p_partkey
"""))

  /** q10 — E10 ticker normalization (`extract_tickers.py:12-18`). */
  val q10 = QuerySpec("q10_ticker_normalize",
    (s, dir) => t(s, dir, "part")
      .select(col("p_partkey"),
        translate(upper(trim(concat(col("p_name"), lit(" .x")))), ".", "-")
          .as("ticker"))
      .orderBy("p_partkey"),
    Some("""
SELECT p_partkey, translate(upper(trim(p_name || ' .x')), '.', '-') AS ticker
FROM part ORDER BY p_partkey
"""))

  /** q11 — E11/E12 date derivations + monthly rollup (`pipeline_job.py:85-95`,
    * `README.md:255-257`). Timestamps are emitted as formatted strings so
    * the engine/oracle compare is precision-independent. */
  val q11 = QuerySpec("q11_date_ops",
    (s, dir) => t(s, dir, "orders")
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_totalprice"))
      .groupBy("month")
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("month"),
    Some("""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
  CAST(count(*) AS BIGINT) AS n,
  round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1 ORDER BY month
"""))

  /** q12 — O2 argmax by regex-extracted date (the Apps Script
    * latest-file scan, `.gs:10-35`), over synthesized dated filenames. */
  val q12 = QuerySpec("q12_argmax_regex",
    (s, dir) => t(s, dir, "orders")
      .select(col("o_orderkey"),
        concat(lit("nasdaq100_valuations_"),
          date_format(col("o_orderdate"), "yyyy-MM-dd"), lit(".csv")).as("fname"))
      .withColumn("fdate",
        regexp_extract(col("fname"), "nasdaq100_valuations_(\\d{4}-\\d{2}-\\d{2})", 1))
      .orderBy(desc("fdate"), asc("o_orderkey"))
      .limit(1),
    Some("""
SELECT o_orderkey, fname, fdate FROM (
  SELECT o_orderkey,
    'nasdaq100_valuations_' || strftime(o_orderdate, '%Y-%m-%d') || '.csv' AS fname,
    regexp_extract('nasdaq100_valuations_' || strftime(o_orderdate, '%Y-%m-%d') || '.csv',
      'nasdaq100_valuations_(\d{4}-\d{2}-\d{2})', 1) AS fdate
  FROM orders
) ORDER BY fdate DESC, o_orderkey LIMIT 1
"""))

  /** q13 — window ranking + lag (engine extension beyond the reference,
    * SURVEY.md §2.8 notes none present): latest 2 orders per customer. */
  val q13 = QuerySpec("q13_window_rank",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_orderdate"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("prev_price", lag("o_totalprice", 1).over(w))
        .filter(col("rn") <= 2)
        .select(col("o_custkey"), col("rn").cast("long").as("rn"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_totalprice"), col("prev_price"))
        .orderBy("o_custkey", "rn")
    },
    Some("""
SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice, prev_price
FROM (
  SELECT *,
    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS rn,
    lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS prev_price
  FROM orders
) WHERE rn <= 2 ORDER BY o_custkey, rn
"""))

  /** q14 — tumbling-window aggregation over the events stream table
    * (batch form; the streaming form is in graft.streaming and produces
    * the same frame via Trigger.AvailableNow). The value aggregates go
    * through decimal(28,10): double summation order is engine-defined,
    * and at sf0.1 one group's true average sat exactly on a 1e-6
    * rounding boundary — decimal sums are exact and order-insensitive,
    * so the frame is bit-stable at every scale factor. */
  val q14 = QuerySpec("q14_events_hourly",
    (s, dir) => t(s, dir, "events")
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(28,10)")), 2)
          .cast("double").as("total_value"),
        round(sum(col("value").cast("decimal(28,10)")) / count(lit(1)), 6)
          .cast("double").as("avg_value"))
      .orderBy("hour", "event_type"),
    Some("""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_value,
  CAST(round(sum(CAST(value AS DECIMAL(28,10))) / count(*), 6) AS DOUBLE) AS avg_value
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""))

  /** q15 — anti join (engine breadth; reference has only J1's lookup
    * join): customers that placed no orders. */
  val q15 = QuerySpec("q15_anti_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""))

  /** q16 — star join with broadcast dimensions: revenue per nation.
    * nation/region are broadcast (tiny build sides); only the
    * customer⋈orders equi-join shuffles, on the join key. */
  val q16 = QuerySpec("q16_star_join_revenue",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      val o = t(s, dir, "orders")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy("r_name", "n_name")
    },
    Some("""
SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_orders,
  round(sum(o_totalprice), 2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY r_name, n_name
"""))

  /** q17 — JSON field extraction from the events props column. */
  val q17 = QuerySpec("q17_json_extract",
    (s, dir) => t(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id"),
    Some("""
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events ORDER BY event_id
"""))

  val all: Seq[QuerySpec] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09,
    q10, q11, q12, q13, q14, q15, q16, q17)
}
