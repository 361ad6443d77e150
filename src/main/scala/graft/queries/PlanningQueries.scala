package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}

/** Round-15 planning/estimation tier: FIFO lot allocation (the
  * inventory-costing classic), a deterministic one-pass Poisson
  * bootstrap (the production way to put error bars on a cluster-scale
  * mean — B ride-along integer weights, never B data passes),
  * business-day SLA lag (closed-form weekday arithmetic, no calendar
  * table), and Neyman-allocation stratified sampling with an exact
  * top-n_h selection that never sorts a whole stratum in one task.
  *
  * Determinism: everything is exact integer arithmetic except q305's
  * σ_h (the pinned-float pattern — one shared double expression,
  * floored to ppm). The Poisson(1) inverse-CDF thresholds are ppm
  * literals (367879/735759/919699/981012), part of the query
  * definition, applied to the engine-standard md5 integer.
  */
object PlanningQueries {

  private val epochDaySpark = (c: String) =>
    s"cast(datediff(cast($c as date), date'1970-01-01') as bigint)"
  private val epochDaySql = (c: String) =>
    s"CAST(datediff('day', DATE '1970-01-01', CAST($c AS DATE)) AS BIGINT)"

  /** q302 — FIFO lot allocation: per part, consume supply lots
    * (non-returned lineitems, oldest ship date first) against the
    * part's return demand, and report how many lots each part's
    * returns burn through, the allocated/unfilled split, and the
    * exact FIFO cost of the allocated units. The running-consumption
    * form is one exclusive prefix sum per part:
    * alloc = clamp(demand − cum_before, 0, qty) — no iteration, no
    * per-lot loop.
    *
    * Determinism under the testdata's duplicate (orderkey,
    * linenumber) pairs: the lot order adds (qty, unit_cents) to the
    * sort key, so any remaining ties are FULL-ROW identical and the
    * per-part aggregates are order-invariant. Scale: the window
    * partitions by part (bounded per-part lot lists — TPC-H ~30
    * lineitems/part), everything else is map-side-combining
    * aggregates. */
  val q302 = QuerySpec("q302_fifo_allocation",
    (s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_partkey").as("part"), col("l_returnflag").as("rf"),
          expr("cast(l_quantity as bigint)").as("qty"),
          expr(epochDaySpark("l_shipdate")).as("sd"),
          col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          expr("cast(floor(l_extendedprice * 100) as bigint) div cast(l_quantity as bigint)")
            .as("unit_cents"))
      val demand = li.where(col("rf") === "R")
        .groupBy("part").agg(sum("qty").as("demand"))
      val w = Window.partitionBy("part")
        .orderBy("sd", "ok", "ln", "qty", "unit_cents")
        .rowsBetween(Window.unboundedPreceding, -1)
      val lots = li.where(col("rf") =!= "R")
        .withColumn("cumb", coalesce(sum("qty").over(w), lit(0L)))
      lots.join(demand, "part")
        .withColumn("alloc",
          greatest(lit(0L), least(col("qty"), col("demand") - col("cumb"))))
        .groupBy("part")
        .agg(max("demand").as("demand"), sum("qty").as("supply"),
          sum("alloc").as("allocated"),
          sum(when(col("alloc") > 0L, 1L).otherwise(0L)).as("n_lots"),
          sum(col("alloc") * col("unit_cents")).as("cost_cents"))
        .select(col("part"), col("demand"), col("supply"),
          col("allocated"),
          (col("demand") - col("allocated")).as("unfilled"),
          col("n_lots"), col("cost_cents"))
        .orderBy("part")
    },
    Some(raw"""
WITH li AS (
  SELECT l_partkey AS part, l_returnflag AS rf,
    CAST(l_quantity AS BIGINT) AS qty,
    ${epochDaySql("l_shipdate")} AS sd,
    l_orderkey AS ok, l_linenumber AS ln,
    CAST(floor(l_extendedprice * 100) AS BIGINT)
      // CAST(l_quantity AS BIGINT) AS unit_cents
  FROM lineitem
), demand AS (
  SELECT part, CAST(sum(qty) AS BIGINT) AS demand
  FROM li WHERE rf = 'R' GROUP BY 1
), lots AS (
  SELECT part, qty, unit_cents,
    CAST(COALESCE(sum(qty) OVER (PARTITION BY part
      ORDER BY sd, ok, ln, qty, unit_cents
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cumb
  FROM li WHERE rf <> 'R'
), a AS (
  SELECT l.part, d.demand, l.qty, l.unit_cents,
    greatest(0, least(l.qty, d.demand - l.cumb)) AS alloc
  FROM lots l JOIN demand d ON l.part = d.part
)
SELECT part, CAST(max(demand) AS BIGINT) AS demand,
  CAST(sum(qty) AS BIGINT) AS supply,
  CAST(sum(alloc) AS BIGINT) AS allocated,
  CAST(max(demand) - sum(alloc) AS BIGINT) AS unfilled,
  CAST(sum(CASE WHEN alloc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_lots,
  CAST(sum(alloc * unit_cents) AS BIGINT) AS cost_cents
FROM a GROUP BY 1 ORDER BY part
"""))

  /** q303 — deterministic one-pass Poisson bootstrap of the mean
    * order value: 32 replicate means from Poisson(1) resample
    * weights derived from md5(o_orderkey, b) — the cluster-scale
    * bootstrap (Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", and the standard Spark/MapReduce
    * practice): B weights ride along each row in ONE corpus pass
    * and 32 map-side-combining aggregates, instead of B shuffled
    * resamples. The Poisson(1) inverse CDF is applied to the hash
    * integer with ppm literal thresholds; every weight, sum, and
    * replicate mean (floor division) is exact — the replicate table
    * IS the uncertainty artifact (spread of mean_cents across b).
    * Scale: 32× row fan-out of a 2-column projection, nothing
    * else. */
  val q303 = QuerySpec("q303_poisson_bootstrap",
    (s, dir) => {
      // balanced: the 32× md5 fan-out above a 1-row-group dev scan
      // otherwise runs on one core (guide §2.6 idle capacity)
      val o = graft.QueryUtil.balanced(Tables(s, dir, "orders")
        .select(col("o_orderkey").as("ok"),
          expr("cast(floor(o_totalprice * 100) as bigint)").as("cents")))
      // 32× replicate fan-out as a codegen Generate (explode of a
      // literal sequence) instead of crossJoin(broadcast(range(32))):
      // same rows, but no BroadcastExchange/BroadcastNestedLoopJoin —
      // one WholeStageCodegen span from scan to partial aggregate
      o.withColumn("b", explode(expr("sequence(0L, 31L)")))
        .withColumn("u", expr(
          "cast(conv(substring(md5(concat(cast(ok as string), '_', " +
            "cast(b as string))), 1, 8), 16, 10) as bigint) % 1000000"))
        .withColumn("w", expr(
          "CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1 " +
            "WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3 ELSE 4 END"))
        .groupBy("b")
        .agg(sum("w").cast("long").as("w_sum"),
          sum(expr("w * cents")).as("wx"))
        .select(col("b"), col("w_sum"),
          expr("wx div w_sum").as("mean_cents"))
        .orderBy("b")
    },
    Some(raw"""
WITH o AS (
  SELECT o_orderkey AS ok,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), fan AS (
  SELECT ok, cents, CAST(b AS BIGINT) AS b,
    CAST(concat('0x', substr(md5(concat(CAST(ok AS VARCHAR), '_',
      CAST(CAST(b AS BIGINT) AS VARCHAR))), 1, 8)) AS BIGINT) % 1000000
      AS u
  FROM o CROSS JOIN (SELECT unnest(range(0, 32)) AS b)
), wtd AS (
  SELECT b, cents,
    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
      WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3 ELSE 4 END AS w
  FROM fan
)
SELECT b, CAST(sum(w) AS BIGINT) AS w_sum,
  CAST(sum(w * cents) // sum(w) AS BIGINT) AS mean_cents
FROM wtd GROUP BY 1 ORDER BY b
"""))

  /** q304 — business-day SLA lag: order→ship lag per order priority
    * in BUSINESS days (weekends excluded) by closed-form weekday
    * arithmetic — B(e) = 5·⌊m/7⌋ + min(m mod 7, 5) with m = e + 3
    * (epoch day 0 = Thursday, +3 re-origins the week on Monday)
    * counts business days in [origin, e); the lag is B(ship) −
    * B(order). No calendar-table join, no per-day explode — two
    * integer expressions per row, then one aggregate. */
  val q304 = QuerySpec("q304_business_day_lag",
    (s, dir) => {
      def bdays(e: String) = s"(5 * (($e + 3) div 7) + least(($e + 3) % 7, 5))"
      val lag = Tables(s, dir, "lineitem").as("l")
        .join(Tables(s, dir, "orders").as("o"),
          col("l.l_orderkey") === col("o.o_orderkey"))
        .select(col("o.o_orderpriority").as("pri"),
          expr(s"${bdays(epochDaySpark("l_shipdate"))} - " +
            s"${bdays(epochDaySpark("o_orderdate"))}").as("bd"))
      lag.groupBy("pri")
        .agg(count(lit(1)).as("n"), sum("bd").as("sum_bd"),
          max("bd").as("max_bd"))
        .select(col("pri"), col("n"),
          expr("(sum_bd * 1000000) div n").as("mean_bd_ppm"),
          col("max_bd"))
        .orderBy("pri")
    },
    Some {
      def bdays(e: String) = s"(5 * (($e + 3) // 7) + least(($e + 3) % 7, 5))"
      raw"""
WITH lag AS (
  SELECT o.o_orderpriority AS pri,
    ${bdays(epochDaySql("l.l_shipdate"))}
      - ${bdays(epochDaySql("o.o_orderdate"))} AS bd
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT pri, CAST(count(*) AS BIGINT) AS n,
  CAST((sum(bd) * 1000000) // count(*) AS BIGINT) AS mean_bd_ppm,
  CAST(max(bd) AS BIGINT) AS max_bd
FROM lag GROUP BY 1 ORDER BY pri
"""
    })

  /** Shared pinned-double Neyman weight: σ-proxy from the exact
    * integer sums (nh, s1 decimal-safe, s2 decimal). */
  private val sigmaExpr =
    "sqrt((cast(nh as double) * cast(s2 as double) - cast(s1 as double) * cast(s1 as double)) / (cast(nh as double) * cast(nh - 1 as double)))"

  /** q305 — Neyman-allocation stratified sample: allocate a fixed
    * budget of 1000 samples across the order-priority strata
    * ∝ N_h·σ_h (the variance-minimizing allocation for estimating
    * the overall mean), then draw each stratum's n_h EXACTLY and
    * deterministically by md5-rank — WITHOUT ever ranking a whole
    * stratum in one window task (the q223 lesson): the hash domain
    * is pre-bucketed (1024 buckets of 2²²), a per-(stratum, bucket)
    * histogram + prefix sum locates each stratum's cutoff bucket,
    * rows below the cutoff are taken wholesale, and only the
    * boundary bucket (≈ N_h/1024 rows) is row_number-ranked for the
    * remainder. Output: per stratum, the population size, allocated
    * and realized sample sizes, and the sample mean.
    *
    * σ_h is the registry's pinned-float pattern; every count, rank,
    * and mean is exact integer. Σx² accumulates in decimal(38,0)/
    * HUGEINT (overflows long at ~10⁶ rows of 10⁷-cent orders). */
  val q305 = QuerySpec("q305_neyman_sample",
    (s, dir) => {
      val o = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "orders")
          .select(col("o_orderkey").as("ok"),
            col("o_orderpriority").as("pri"),
            expr("cast(floor(o_totalprice * 100) as bigint)").as("cents"))
          .withColumn("u", expr(
            "cast(conv(substring(md5(cast(ok as string)), 1, 8), 16, 10) as bigint)"))
          .withColumn("ub", expr("u div 4194304")))
      val stats = o.groupBy("pri")
        .agg(count(lit(1)).as("nh"), sum("cents").as("s1"),
          sum(col("cents").cast("decimal(38,0)") *
            col("cents").cast("decimal(38,0)")).as("s2"))
        .withColumn("w", expr(s"cast(nh as double) * $sigmaExpr"))
      val alloc = graft.CacheRegistry.persistTracked(stats
        .crossJoin(broadcast(stats.agg(sum("w").as("wtot"))))
        .select(col("pri"), col("nh"),
          greatest(lit(1L),
            expr("cast(floor(1000.0 * w / wtot) as bigint)")).as("n_alloc")))
      val hist = o.groupBy("pri", "ub").agg(count(lit(1)).as("cnt"))
        .withColumn("cumb", coalesce(sum("cnt").over(
          Window.partitionBy("pri").orderBy("ub")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val cut = graft.CacheRegistry.persistTracked(
        hist.join(alloc, "pri")
          .where(col("cumb") + col("cnt") >= col("n_alloc"))
          .groupBy("pri")
          .agg(min("ub").as("cut_ub"))
          .join(hist.select(col("pri"), col("ub"), col("cumb")), "pri")
          .where(col("ub") === col("cut_ub"))
          .join(alloc, "pri")
          .select(col("pri"), col("cut_ub"), col("cumb").as("below"),
            (col("n_alloc") - col("cumb")).as("k_rem"), col("n_alloc"),
            col("nh")))
      val whole = o.join(cut, "pri").where(col("ub") < col("cut_ub"))
        .select(col("pri"), col("cents"))
      val wB = Window.partitionBy("pri").orderBy("u", "ok")
      val boundary = o.join(cut, "pri").where(col("ub") === col("cut_ub"))
        .withColumn("r", row_number().over(wB).cast("long"))
        .where(col("r") <= col("k_rem"))
        .select(col("pri"), col("cents"))
      whole.unionByName(boundary)
        .groupBy("pri")
        .agg(count(lit(1)).as("n_sampled"), sum("cents").as("sc"))
        .join(cut.select("pri", "n_alloc", "nh"), "pri")
        .select(col("pri"), col("nh").as("n_pop"), col("n_alloc"),
          col("n_sampled"),
          expr("sc div n_sampled").as("sample_mean_cents"))
        .orderBy("pri")
    },
    Some(raw"""
WITH o AS (
  SELECT o_orderkey AS ok, o_orderpriority AS pri,
    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
    CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
      AS BIGINT) AS u,
    CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
      AS BIGINT) // 4194304 AS ub
  FROM orders
), stats AS (
  SELECT pri, CAST(count(*) AS BIGINT) AS nh,
    CAST(sum(cents) AS BIGINT) AS s1,
    CAST(sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS HUGEINT)
      AS s2
  FROM o GROUP BY 1
), wtd AS (
  SELECT pri, nh, cast(nh as double) * $sigmaExpr AS w FROM stats
), alloc AS (
  SELECT pri, nh,
    greatest(1, CAST(floor(1000.0 * w / (SELECT sum(w) FROM wtd))
      AS BIGINT)) AS n_alloc
  FROM wtd
), hist AS (
  SELECT pri, ub, CAST(count(*) AS BIGINT) AS cnt,
    CAST(COALESCE(sum(count(*)) OVER (PARTITION BY pri ORDER BY ub
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS cumb
  FROM o GROUP BY 1, 2
), cut AS (
  SELECT c.pri, c.cut_ub, h.cumb AS below,
    a.n_alloc - h.cumb AS k_rem, a.n_alloc, a.nh
  FROM (
    SELECT h.pri, min(h.ub) AS cut_ub
    FROM hist h JOIN alloc a ON h.pri = a.pri
    WHERE h.cumb + h.cnt >= a.n_alloc GROUP BY 1) c
  JOIN hist h ON h.pri = c.pri AND h.ub = c.cut_ub
  JOIN alloc a ON a.pri = c.pri
), whole AS (
  SELECT o.pri, o.cents FROM o JOIN cut ON o.pri = cut.pri
  WHERE o.ub < cut.cut_ub
), boundary AS (
  SELECT pri, cents FROM (
    SELECT o.pri, o.cents, cut.k_rem,
      row_number() OVER (PARTITION BY o.pri ORDER BY o.u, o.ok) AS r
    FROM o JOIN cut ON o.pri = cut.pri
    WHERE o.ub = cut.cut_ub)
  WHERE r <= k_rem
), sample AS (
  SELECT * FROM whole UNION ALL SELECT * FROM boundary
)
SELECT s.pri, c.nh AS n_pop, c.n_alloc,
  CAST(count(*) AS BIGINT) AS n_sampled,
  CAST(sum(s.cents) // count(*) AS BIGINT) AS sample_mean_cents
FROM sample s JOIN cut c ON s.pri = c.pri
GROUP BY 1, 2, 3 ORDER BY s.pri
"""))

  /** q310 — spend-decile mobility matrix: each purchasing user's
    * bucketed spend decile in the PRIOR period versus the LAST 15
    * days (the q309 split), as a transition matrix — the
    * customer-migration diagnostic behind churn/upsell dashboards.
    * Deciles are VALUE-threshold deciles computed scale-safely: a
    * 1024-bucket histogram of per-user cents (bounds from one 1-row
    * aggregate), a prefix sum over the ≤1024-row bucket frame, and
    * threshold buckets t_d = first bucket with cum ≥ d·N/10; a
    * user's decile is 1 + |{d : bucket ≥ t_d}| — every frame after
    * the per-user aggregate is ≤1024 rows, no global sort, no
    * per-user rank. Ties share a decile by construction (bucketed
    * value deciles — documented, deterministic). */
  val q310 = QuerySpec("q310_decile_mobility",
    (s, dir) => {
      val dayIdx = "cast(floor(cast(ts as long) / 86400) as bigint)"
      val maxd = Tables(s, dir, "events")
        .where(col("event_type") === "purchase")
        .agg(max(expr(dayIdx)).as("maxd"))
      val peruser = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "events")
          .where(col("event_type") === "purchase")
          .crossJoin(broadcast(maxd))
          .select(col("user_id"),
            expr(s"case when $dayIdx > maxd - 15 then " +
              "cast(floor(value * 100) as bigint) else 0L end").as("yc"),
            expr(s"case when $dayIdx <= maxd - 15 then " +
              "cast(floor(value * 100) as bigint) else 0L end").as("xc"))
          .groupBy("user_id")
          .agg(sum("yc").as("y"), sum("xc").as("x"))
          .where(col("x") > 0L && col("y") > 0L))
      def deciles(valCol: String, tag: String) = {
        val mx = peruser.agg(max(col(valCol)).as("mx"))
        val bucketed = peruser.crossJoin(broadcast(mx))
          .select(col("user_id"),
            expr(s"($valCol * 1024) div (mx + 1)").as("bk"))
        val hist = bucketed.groupBy("bk").agg(count(lit(1)).as("cnt"))
          .withColumn("cum", sum("cnt").over(
            Window.orderBy("bk")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .crossJoin(broadcast(peruser.agg(count(lit(1)).as("n"))))
        val thresholds = hist
          .crossJoin(broadcast(s.range(1, 10).select(col("id").as("d"))))
          .where(col("cum") * 10L >= col("d") * col("n"))
          .groupBy("d").agg(min("bk").as("td"))
        bucketed.crossJoin(broadcast(thresholds))
          .groupBy("user_id", "bk")
          .agg(sum(when(col("bk") >= col("td"), 1L).otherwise(0L))
            .as("above"))
          .select(col("user_id"), (col("above") + 1L).as(tag))
      }
      deciles("x", "d_prior").join(deciles("y", "d_last"), "user_id")
        .groupBy("d_prior", "d_last").agg(count(lit(1)).as("n_users"))
        .orderBy("d_prior", "d_last")
    },
    Some(raw"""
WITH md AS (
  SELECT max(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS maxd
  FROM events WHERE event_type = 'purchase'
), peruser AS (
  SELECT user_id,
    CAST(sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) // 86400
        > md.maxd - 15
      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
    CAST(sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) // 86400
        <= md.maxd - 15
      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x
  FROM events CROSS JOIN md
  WHERE event_type = 'purchase'
  GROUP BY user_id
  HAVING sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) // 86400
      > md.maxd - 15
    THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) > 0
   AND sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) // 86400
      <= md.maxd - 15
    THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) > 0
), n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM peruser),
bx AS (
  SELECT user_id, (x * 1024) // ((SELECT max(x) FROM peruser) + 1) AS bk
  FROM peruser
), by_ AS (
  SELECT user_id, (y * 1024) // ((SELECT max(y) FROM peruser) + 1) AS bk
  FROM peruser
), hx AS (
  SELECT bk, sum(count(*)) OVER (ORDER BY bk
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM bx GROUP BY bk
), hy AS (
  SELECT bk, sum(count(*)) OVER (ORDER BY bk
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM by_ GROUP BY bk
), tx AS (
  SELECT d.d, min(h.bk) AS td
  FROM hx h CROSS JOIN (SELECT unnest(range(1, 10)) AS d) d
  CROSS JOIN n1 WHERE h.cum * 10 >= d.d * n1.n GROUP BY 1
), ty AS (
  SELECT d.d, min(h.bk) AS td
  FROM hy h CROSS JOIN (SELECT unnest(range(1, 10)) AS d) d
  CROSS JOIN n1 WHERE h.cum * 10 >= d.d * n1.n GROUP BY 1
), dx AS (
  SELECT b.user_id,
    CAST(1 + sum(CASE WHEN b.bk >= t.td THEN 1 ELSE 0 END) AS BIGINT)
      AS d_prior
  FROM bx b CROSS JOIN tx t GROUP BY 1
), dy AS (
  SELECT b.user_id,
    CAST(1 + sum(CASE WHEN b.bk >= t.td THEN 1 ELSE 0 END) AS BIGINT)
      AS d_last
  FROM by_ b CROSS JOIN ty t GROUP BY 1
)
SELECT dx.d_prior, dy.d_last, CAST(count(*) AS BIGINT) AS n_users
FROM dx JOIN dy ON dx.user_id = dy.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""))

  /** q311 — join-cardinality estimate audit: the textbook optimizer
    * estimate |R ⋈ S| ≈ |R|·|S| / max(ndv_R(k), ndv_S(k)) scored
    * against the EXACT intermediate sizes, for both orders of the
    * orders–lineitem–customer 3-way join. This is the engine auditing
    * its own planning arithmetic: the estimates come from the same
    * per-table statistics a cost-based optimizer keeps (row count +
    * NDV per join key), the actuals from one count per intermediate,
    * and err_ppm quantifies how far uniform-frequency assumptions
    * drift on this schema (FK joins: near-exact; the lesson is WHERE
    * the formula is trustworthy). All integer arithmetic. */
  val q311 = QuerySpec("q311_join_cardinality_audit",
    (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      val c = Tables(s, dir, "customer")
      def stats(df: org.apache.spark.sql.DataFrame, k: String) = {
        val r = df.agg(count(lit(1)), countDistinct(col(k))).head()
        (r.getLong(0), r.getLong(1))
      }
      val (no, ndvOok) = stats(o, "o_orderkey")
      val (nl, ndvLok) = stats(l, "l_orderkey")
      val (_, ndvOck) = stats(o, "o_custkey")
      val (nc, ndvCck) = stats(c, "c_custkey")
      val aOL = o.join(l, col("o_orderkey") === col("l_orderkey")).count()
      val aOC = o.join(c, col("o_custkey") === col("c_custkey")).count()
      val eOL = no * nl / math.max(ndvOok, ndvLok)
      val eOC = no * nc / math.max(ndvOck, ndvCck)
      Seq(
        ("OL_then_C", "orders_join_lineitem", eOL, aOL),
        ("OC_then_L", "orders_join_customer", eOC, aOC))
        .toDF("path", "step", "est", "actual")
        .withColumn("err_ppm",
          expr("((est - actual) * 1000000) div greatest(actual, 1)"))
        .orderBy("path")
    },
    Some(raw"""
WITH s AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS no,
    (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders)
      AS ndv_ook,
    (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS nl,
    (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem)
      AS ndv_lok,
    (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders)
      AS ndv_ock,
    (SELECT CAST(count(*) AS BIGINT) FROM customer) AS nc,
    (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer)
      AS ndv_cck,
    (SELECT CAST(count(*) AS BIGINT) FROM orders o
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey) AS a_ol,
    (SELECT CAST(count(*) AS BIGINT) FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey) AS a_oc
)
SELECT path, step, est, actual,
  CAST(((est - actual) * 1000000) // greatest(actual, 1) AS BIGINT)
    AS err_ppm
FROM (
  SELECT 'OL_then_C' AS path, 'orders_join_lineitem' AS step,
    CAST(no * nl // greatest(ndv_ook, ndv_lok) AS BIGINT) AS est,
    a_ol AS actual
  FROM s
  UNION ALL
  SELECT 'OC_then_L', 'orders_join_customer',
    CAST(no * nc // greatest(ndv_ock, ndv_cck) AS BIGINT), a_oc
  FROM s)
ORDER BY path
"""))

  val all: Seq[QuerySpec] = Seq(q302, q303, q304, q305, q310, q311)
}
