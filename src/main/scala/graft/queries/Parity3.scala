package graft.queries

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}

/** Round-2 engine-breadth additions: reshaping (unpivot), the rank
  * window family, map/semi-structured functions, and date/interval
  * arithmetic — API families a user migrating real analytics workloads
  * reaches for, each oracle-verified like everything else.
  */
object Parity3 {

  /** q74 — unpivot (melt): wide per-part metrics to long (metric,
    * value) rows. Spark's native unpivot == DuckDB's UNPIVOT. */
  val q74 = QuerySpec("q74_unpivot",
    (s, dir) => Tables(s, dir, "part")
      .where(col("p_partkey") % 10 === 0)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size"),
        col("p_retailprice").cast("double").as("retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("size"), col("retailprice")), "metric", "value")
      .orderBy("p_partkey", "metric"),
    Some("""
SELECT p_partkey, metric, value FROM (
  SELECT p_partkey, CAST(p_size AS DOUBLE) AS size,
    CAST(p_retailprice AS DOUBLE) AS retailprice
  FROM part WHERE p_partkey % 10 = 0
) UNPIVOT (value FOR metric IN (size, retailprice))
ORDER BY p_partkey, metric
"""))

  /** q75 — rank window family: rank / dense_rank / percent_rank /
    * cume_dist / ntile over customer balances per market segment. */
  val q75 = QuerySpec("q75_rank_family",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(desc("c_acctbal"), asc("c_custkey"))
      Tables(s, dir, "customer")
        .where(col("c_custkey") % 20 === 0)
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"),
          round(cume_dist().over(w), 6).as("cdist"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("c_mktsegment", "rnk", "c_custkey")
    },
    Some("""
SELECT c_mktsegment, c_custkey, c_acctbal,
  CAST(rank() OVER w AS BIGINT) AS rnk,
  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
  round(percent_rank() OVER w, 6) AS prnk,
  round(cume_dist() OVER w, 6) AS cdist,
  CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM customer WHERE c_custkey % 20 = 0
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_mktsegment, rnk, c_custkey
"""))

  /** q76 — map + struct functions over parsed JSON props: build a map,
    * extract keys/values, struct field access. Map iteration order is
    * engine-defined, so the compared columns are order-free (sorted
    * keys, specific lookups). */
  val q76 = QuerySpec("q76_map_struct_funcs",
    (s, dir) => Tables(s, dir, "events")
      .where(col("event_id") % 50 === 0)
      .select(col("event_id"),
        from_json(col("props"), lit("k INT, cat STRING")).as("p"),
        map(lit("type"), col("event_type"),
          lit("user"), col("user_id").cast("string")).as("m"))
      .select(col("event_id"),
        col("p.k").as("k"), col("p.cat").as("cat"),
        array_join(array_sort(map_keys(col("m"))), ",").as("mkeys"),
        element_at(col("m"), "type").as("mtype"),
        size(col("m")).cast("long").as("msize"))
      .orderBy("event_id"),
    Some("""
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS INT) AS k,
  json_extract_string(props, '$.cat') AS cat,
  array_to_string(list_sort(map_keys(
    MAP(['type','user'], [event_type, CAST(user_id AS VARCHAR)]))), ',') AS mkeys,
  event_type AS mtype,
  CAST(cardinality(MAP(['type','user'], [event_type, CAST(user_id AS VARCHAR)])) AS BIGINT) AS msize
FROM events WHERE event_id % 50 = 0 ORDER BY event_id
"""))

  /** q77 — date/interval arithmetic battery: add/sub months and days,
    * truncation, extraction, datediff, last_day, next_day-free
    * (engine-portable subset; both engines agree on proleptic
    * Gregorian). */
  val q77 = QuerySpec("q77_date_arith",
    (s, dir) => Tables(s, dir, "orders")
      .where(col("o_orderkey") % 200 === 0)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
        date_format(date_add(col("o_orderdate"), 45), "yyyy-MM-dd").as("plus45d"),
        date_format(trunc(col("o_orderdate"), "quarter"), "yyyy-MM-dd").as("qstart"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        datediff(lit("2026-01-01").cast("date"), col("o_orderdate"))
          .cast("long").as("days_to_2026"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"))
      .orderBy("o_orderkey"),
    Some("""
SELECT o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS d,
  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
  strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d') AS plus45d,
  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qstart,
  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
  CAST(quarter(o_orderdate) AS BIGINT) AS q,
  CAST(datediff('day', o_orderdate, DATE '2026-01-01') AS BIGINT) AS days_to_2026,
  strftime(last_day(o_orderdate), '%Y-%m-%d') AS eom
FROM orders WHERE o_orderkey % 200 = 0 ORDER BY o_orderkey
"""))

  /** q79 — full outer join with null-side handling: suppliers vs the
    * distinct part-supplier pairs implied by lineitem, both sides
    * restricted so each contributes unmatched rows. */
  val q79 = QuerySpec("q79_full_outer",
    (s, dir) => {
      val sup = Tables(s, dir, "supplier")
        .where(col("s_suppkey") % 3 === 0)
        .select(col("s_suppkey"), col("s_name"))
      val li = Tables(s, dir, "lineitem")
        .where(col("l_suppkey") % 2 === 0)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_items"),
          round(sum("l_extendedprice"), 2).as("volume"))
      sup.join(li, col("s_suppkey") === col("l_suppkey"), "full_outer")
        .select(
          coalesce(col("s_suppkey"), col("l_suppkey")).as("suppkey"),
          coalesce(col("s_name"), lit("(no supplier row)")).as("name"),
          coalesce(col("n_items"), lit(0L)).as("n_items"),
          coalesce(col("volume"), lit(0.0)).as("volume"))
        .orderBy("suppkey")
    },
    Some("""
WITH sup AS (
  SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey % 3 = 0
), li AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_items,
    round(sum(l_extendedprice), 2) AS volume
  FROM lineitem WHERE l_suppkey % 2 = 0 GROUP BY l_suppkey
)
SELECT COALESCE(s_suppkey, l_suppkey) AS suppkey,
  COALESCE(s_name, '(no supplier row)') AS name,
  COALESCE(n_items, 0) AS n_items,
  COALESCE(volume, 0.0) AS volume
FROM sup FULL OUTER JOIN li ON s_suppkey = l_suppkey
ORDER BY suppkey
"""))

  /** q80 — ordered string aggregation (listagg): brands per size,
    * deterministically sorted inside the aggregate on both engines. */
  val q80 = QuerySpec("q80_string_agg",
    (s, dir) => Tables(s, dir, "part")
      .where(col("p_size") <= 10)
      .groupBy(col("p_size").cast("long").as("size"))
      .agg(
        array_join(array_sort(collect_set(col("p_brand"))), "|").as("brands"),
        countDistinct(col("p_brand")).as("n_brands"))
      .orderBy("size"),
    Some("""
SELECT CAST(p_size AS BIGINT) AS size,
  array_to_string(list_sort(list(DISTINCT p_brand)), '|') AS brands,
  CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands
FROM part WHERE p_size <= 10
GROUP BY p_size ORDER BY size
"""))

  val all: Seq[QuerySpec] = Seq(q74, q75, q76, q77, q79, q80)
}
