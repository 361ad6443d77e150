package graft.queries

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}
import graft.operators.Skew

/** Scale-pattern inventory: native session windows, salted skew
  * aggregation, sketch aggregates.
  */
object ScaleQueries {

  /** q60 — native session_window (batch form of the same operator the
    * streaming engine uses for stateful sessions): 30-min gap sessions
    * per user. Boundary note: session_window starts a NEW session when
    * the gap is ≥ the window size (next ts outside [ts, ts+gap)),
    * mirrored with >= in the oracle's lag formulation.
    */
  val q60 = QuerySpec("q60_session_window",
    (s, dir) => Tables(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        // decimal sum: order-insensitive (see q14's scale-stability note)
        round(sum(col("value").cast("decimal(28,10)")), 2)
          .cast("double").as("total_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "start_us"),
    Some("""
WITH base AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events
), flagged AS (
  SELECT *, CASE
      WHEN ts_us - lag(ts_us) OVER w >= 1800 * 1000000 THEN 1
      WHEN lag(ts_us) OVER w IS NULL THEN 1
      ELSE 0 END AS is_new
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), sessions AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, min(ts_us) AS start_us,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_value
FROM sessions GROUP BY user_id, sid
ORDER BY user_id, start_us
"""))

  /** q61 — salted two-phase aggregation (skew pattern): identical
    * result to the direct groupBy, which is exactly what the oracle
    * computes. */
  val q61 = QuerySpec("q61_salted_agg",
    (s, dir) => Skew.saltedStats(Tables(s, dir, "lineitem"),
        "l_returnflag", "l_quantity", buckets = 16)
      .select(col("l_returnflag"), col("total"), col("n"),
        col("min_val"), col("max_val"), round(col("avg_val"), 6).as("avg_val"))
      .orderBy("l_returnflag"),
    Some("""
SELECT l_returnflag, sum(l_quantity) AS total,
  CAST(count(l_quantity) AS BIGINT) AS n,
  min(l_quantity) AS min_val, max(l_quantity) AS max_val,
  round(sum(l_quantity) / count(l_quantity), 6) AS avg_val
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""))

  /** q62 — sketch aggregates (HLL++ distinct count, approximate
    * percentiles): the 100 TB substitutes for exact distinct/median.
    * Sketch VALUES differ across engines by design, so the projection
    * carries their error CONTRACTS as booleans instead (TRUE literals
    * in the oracle): HLL++ within 3·rsd of the exact distinct count,
    * and the GK median's RANK error ≤ (n/acc + tie slack) — checked by
    * counting elements strictly below/above the returned value, which
    * is exact at every n (an exact-percentile envelope is not: the
    * sketch returns a REAL element while `percentile` interpolates, so
    * at small n the envelope degenerates to the interpolated point).
    * The exact counterparts are verified in q08/q54; tighter bounds in
    * SketchAccuracySpec.
    */
  val q62 = QuerySpec("q62_sketch_agg",
    (s, dir) => {
      val rsd = 0.02
      val acc = 1000
      val eps = 2.0 / acc // documented n/acc rank error + tie slack
      val base = Tables(s, dir, "orders").select(
        date_format(col("o_orderdate"), "yyyy").as("year"),
        col("o_custkey"), col("o_totalprice"))
      // Mixing countDistinct with other aggregates plants an Expand
      // (row multiplication) and demotes the whole plan to a sort
      // aggregate; the 100 TB shape is a separate two-level exact
      // distinct joined back on the (tiny) year key.
      val sketchy = base
        .groupBy("year")
        .agg(
          approx_count_distinct(col("o_custkey"), rsd).as("approx_cd"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(acc)).as("amed"),
          count(lit(1)).as("n"))
      val exact = base.select("year", "o_custkey").distinct()
        .groupBy("year").agg(count(lit(1)).as("exact_customers"))
      // rank-error check: one more narrow pass over orders, joined on
      // the (tiny) year key — no sort, no interpolation semantics
      val ranks = base
        .join(broadcast(sketchy.select(col("year"), col("amed"))), "year")
        .groupBy("year")
        .agg(sum(when(col("o_totalprice") < col("amed"), 1L).otherwise(0L))
            .as("below"),
          sum(when(col("o_totalprice") > col("amed"), 1L).otherwise(0L))
            .as("above"))
      sketchy.join(exact, "year").join(ranks, "year")
        .select(col("year"), col("exact_customers"),
          (abs(col("approx_cd") - col("exact_customers")) <=
            lit(3 * rsd) * col("exact_customers")).as("cd_ok"),
          (col("below") <= (lit(0.5) + eps) * col("n") &&
            col("above") <= (lit(0.5) + eps) * col("n")).as("pct_ok"),
          col("n"))
        .orderBy("year")
    },
    Some("""
SELECT strftime(o_orderdate, '%Y') AS year,
  CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
  TRUE AS cd_ok, TRUE AS pct_ok,
  CAST(count(*) AS BIGINT) AS n
FROM orders GROUP BY 1 ORDER BY year
"""))

  /** q68 — cube: all grouping-set combinations of (returnflag,
    * linestatus) with grouping flags. */
  val q68 = QuerySpec("q68_cube",
    (s, dir) => Tables(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("rev"),
        grouping_id().cast("long").as("lvl"))
      .orderBy(asc_nulls_first("l_returnflag"),
        asc_nulls_first("l_linestatus"), asc("lvl")),
    Some("""
SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
  round(sum(l_extendedprice), 2) AS rev,
  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS lvl
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST, lvl
"""))

  /** q69 — skew-salted join: the fact side salts its key N ways, the
    * dimension side replicates N ways, so one hot key spreads over N
    * reducers. Result provably equals the plain join — the oracle.
    * (AQE's skew-join handles sort-merge cases adaptively; explicit
    * salting is the deterministic fallback and works for any join.)
    */
  val q69 = QuerySpec("q69_salted_join",
    (s, dir) => {
      val buckets = 8
      val s2 = s
      import s2.implicits._
      val li = Tables(s, dir, "lineitem")
        .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")),
          lit(buckets)))
      val salts = (0 until buckets).toDF("salt")
      val part = Tables(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
        .crossJoin(broadcast(salts))
      li.join(part,
          col("l_partkey") === col("p_partkey") && li("salt") === part("salt"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("rev"))
        .orderBy("p_brand")
    },
    Some("""
SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
  round(sum(l_extendedprice), 2) AS rev
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
"""))

  /** q98 — incremental snapshot merge (CDC keep-latest compaction):
    * base corpus ∪ delta batch, one winner per doc_id by highest
    * version, with the op classified from the merge itself (insert /
    * update / keep). One exchange keyed by doc_id — the canonical
    * compaction shape; with the base bucketed by doc_id
    * (BucketingSpec) even that exchange disappears. Delta here:
    * doc_id % 7 gets a v2 text, doc_id % 13 arrives as a new doc.
    */
  val q98 = QuerySpec("q98_snapshot_merge",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val base = docs.select(col("doc_id"), col("text"), lit(1L).as("version"))
      val delta = docs.where(col("doc_id") % 7 === 0)
        .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
          lit(2L).as("version"))
        .unionByName(docs.where(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 500000L).as("doc_id"), col("text"),
            lit(2L).as("version")))
      val byDoc = Window.partitionBy("doc_id")
      base.unionByName(delta)
        .withColumn("rk", row_number().over(byDoc.orderBy(desc("version"))))
        .withColumn("n", count(lit(1)).over(byDoc))
        .where(col("rk") === 1)
        .select(col("doc_id"), col("version"),
          when(col("version") === 2L && col("n") === 1L, lit("insert"))
            .when(col("version") === 2L, lit("update"))
            .otherwise(lit("keep")).as("op"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    },
    Some(raw"""
WITH base AS (
  SELECT doc_id, text, 1 AS version FROM documents
), delta AS (
  SELECT doc_id, text || ' v2' AS text, 2 AS version
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 500000 AS doc_id, text, 2 AS version
  FROM documents WHERE doc_id % 13 = 0
), merged AS (
  SELECT * FROM base UNION ALL SELECT * FROM delta
), r AS (
  SELECT doc_id, version, text,
    row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rk,
    count(*) OVER (PARTITION BY doc_id) AS n
  FROM merged
)
SELECT doc_id, CAST(version AS BIGINT) AS version,
  CASE WHEN version = 2 AND n = 1 THEN 'insert'
       WHEN version = 2 THEN 'update' ELSE 'keep' END AS op,
  CAST(length(text) AS BIGINT) AS n_chars
FROM r WHERE rk = 1 ORDER BY doc_id
"""))

  val all: Seq[QuerySpec] = Seq(q60, q61, q62, q68, q69, q98)
}
