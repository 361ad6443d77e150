package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}

/** Round-14 closing wave: revenue-cohort LTV curves, the
  * discount–quantity correlation screen, and a deterministic-sample
  * approximate-query-processing audit — the "how wrong is the cheap
  * answer" report that justifies (or forbids) sampling at 100 TB.
  * Registry determinism rules throughout; the one float (q272's
  * Pearson r) is the pinned sqrt pattern (IEEE-correctly-rounded,
  * identical expression text both engines). */
object AqpQueries {

  private def h60(c: String): String =
    s"cast(conv(substring(md5($c), 1, 15), 16, 10) as bigint)"
  private def sqlH60(c: String): String =
    s"CAST(concat('0x', substr(md5($c), 1, 15)) AS BIGINT)"
  private val dayIdxSql = "CAST(floor(epoch(ts)) AS BIGINT) // 86400"

  /** q271 — weekly cohort LTV curves: users cohorted by first-activity
    * week, revenue (payload cents) accumulated by cohort age in weeks,
    * with the running cumulative LTV per cohort — the revenue twin of
    * q183's retention counts. Cohort assignment is a min-over-window
    * on the user_id exchange (no per-user frame is built or broadcast
    * — users grow with the data); the curve is a groupBy over (cohort,
    * age); the cumulative runs on the calendar-bounded (cohort × age)
    * frame (≤ weeks² rows); the only broadcast is the per-cohort size
    * table, bounded by the number of calendar weeks. */
  val q271 = QuerySpec("q271_cohort_ltv",
    (s, dir) => {
      val ev = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "events")
          .select(col("user_id"),
            expr("cast(floor(cast(ts as long) / 86400) as bigint) div 7")
              .as("week"),
            expr("cast(round(value * 100) as bigint)").as("cents"))
          .withColumn("cohort_week",
            min("week").over(Window.partitionBy("user_id"))))
      val sizes = ev.groupBy("user_id")
        .agg(min("cohort_week").as("cohort_week"))
        .groupBy("cohort_week")
        .agg(count(lit(1)).as("n_users"))
      val curve = ev
        .withColumn("age_week", col("week") - col("cohort_week"))
        .groupBy("cohort_week", "age_week")
        .agg(sum("cents").as("rev_cents"))
      val w = Window.partitionBy("cohort_week").orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      curve.join(broadcast(sizes), "cohort_week")
        .withColumn("cum_cents", sum("rev_cents").over(w))
        .select("cohort_week", "age_week", "n_users", "rev_cents",
          "cum_cents")
        .orderBy("cohort_week", "age_week")
    },
    Some(raw"""
WITH ev AS (
  SELECT user_id, ($dayIdxSql) // 7 AS week,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1
), sizes AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
  FROM cohort GROUP BY 1
), curve AS (
  SELECT c.cohort_week, e.week - c.cohort_week AS age_week,
    CAST(sum(e.cents) AS BIGINT) AS rev_cents
  FROM ev e JOIN cohort c ON e.user_id = c.user_id
  GROUP BY 1, 2
)
SELECT cv.cohort_week, cv.age_week, sz.n_users, cv.rev_cents,
  CAST(sum(cv.rev_cents) OVER (PARTITION BY cv.cohort_week
    ORDER BY cv.age_week ROWS UNBOUNDED PRECEDING) AS BIGINT)
    AS cum_cents
FROM curve cv JOIN sizes sz ON cv.cohort_week = sz.cohort_week
ORDER BY cv.cohort_week, cv.age_week
"""))

  /** q272 — discount–quantity correlation per return flag: does a
    * deeper discount move volume — the pricing-analytics screen, as
    * exact Pearson r in ppm. Sums are exact integers over the one
    * lineitem pass (x = discount in percent points, y = quantity —
    * both tiny ints, so n·Σxy holds in long to ~10⁹ rows); r =
    * cxy/√(cxx·cyy) is the registry's pinned-sqrt float pattern
    * (sqrt is IEEE-correctly-rounded; identical text both engines),
    * floored to ppm. */
  val q272 = QuerySpec("q272_discount_quantity_corr",
    (s, dir) => {
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          expr("cast(round(l_discount * 100) as bigint)").as("x"),
          expr("cast(round(l_quantity) as bigint)").as("y"))
        .groupBy("flag")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum("y").as("sy"), sum(expr("x * x")).as("sxx"),
          sum(expr("x * y")).as("sxy"), sum(expr("y * y")).as("syy"))
        .withColumn("cxy", expr("n * sxy - sx * sy"))
        .withColumn("cxx", expr("n * sxx - sx * sx"))
        .withColumn("cyy", expr("n * syy - sy * sy"))
        .where(col("cxx") > 0L && col("cyy") > 0L)
        .withColumn("r_ppm", expr(
          "cast(floor(cast(cxy as double) / sqrt(cast(cxx as double) " +
            "* cast(cyy as double)) * 1000000.0) as bigint)"))
        .select("flag", "n", "r_ppm")
        .orderBy("flag")
    },
    Some(raw"""
WITH s AS (
  SELECT l_returnflag AS flag,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sx,
    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sy,
    CAST(sum(CAST(round(l_discount * 100) AS BIGINT)
      * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sxx,
    CAST(sum(CAST(round(l_discount * 100) AS BIGINT)
      * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sxy,
    CAST(sum(CAST(round(l_quantity) AS BIGINT)
      * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS syy
  FROM lineitem GROUP BY 1
), c AS (
  SELECT flag, n, n * sxy - sx * sy AS cxy, n * sxx - sx * sx AS cxx,
    n * syy - sy * sy AS cyy
  FROM s
)
SELECT flag, n,
  CAST(floor(CAST(cxy AS DOUBLE) / sqrt(CAST(cxx AS DOUBLE)
    * CAST(cyy AS DOUBLE)) * 1000000.0) AS BIGINT) AS r_ppm
FROM c WHERE cxx > 0 AND cyy > 0 ORDER BY flag
"""))

  /** q273 — deterministic-sample AQP audit: a 5% Bernoulli sample by
    * key hash (pmod(h60, 1000) < 50 — reproducible, cross-engine)
    * estimates per-type counts and payload sums by inverse-probability
    * scaling (·20, exact integer), and the audit reports the signed
    * error vs the exact figures in ppm — the evidence table that
    * decides whether dashboards may run on the sample tier. One scan;
    * both branches are map-side-combining conditional aggregates. */
  val q273 = QuerySpec("q273_sample_aqp_audit",
    (s, dir) => {
      Tables(s, dir, "events")
        .select(col("event_type"),
          expr("cast(round(value * 100) as bigint)").as("cents"),
          (expr(s"pmod(${h60("concat('s|', cast(event_id as string))")}, 1000)")
            < 50L).cast("long").as("in_sample"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_exact"),
          sum("in_sample").as("n_sample"),
          sum("cents").as("exact_cents"),
          sum(col("in_sample") * col("cents")).as("sample_cents"))
        .withColumn("est_n", col("n_sample") * 20L)
        .withColumn("est_cents", col("sample_cents") * 20L)
        .withColumn("n_err_ppm",
          expr("((est_n - n_exact) * 1000000) div n_exact"))
        .withColumn("cents_err_ppm",
          expr("((est_cents - exact_cents) * 1000000) div exact_cents"))
        .select("event_type", "n_exact", "est_n", "n_err_ppm",
          "exact_cents", "est_cents", "cents_err_ppm")
        .orderBy("event_type")
    },
    Some(raw"""
WITH t AS (
  SELECT event_type,
    CAST(round(value * 100) AS BIGINT) AS cents,
    CASE WHEN ${sqlH60("concat('s|', CAST(event_id AS VARCHAR))")}
      % 1000 < 50 THEN 1 ELSE 0 END AS in_sample
  FROM events
), a AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact,
    CAST(sum(in_sample) AS BIGINT) AS n_sample,
    CAST(sum(cents) AS BIGINT) AS exact_cents,
    CAST(sum(in_sample * cents) AS BIGINT) AS sample_cents
  FROM t GROUP BY 1
)
SELECT event_type, n_exact, n_sample * 20 AS est_n,
  CAST(((n_sample * 20 - n_exact) * 1000000) // n_exact AS BIGINT)
    AS n_err_ppm,
  exact_cents, sample_cents * 20 AS est_cents,
  CAST(((sample_cents * 20 - exact_cents) * 1000000) // exact_cents
    AS BIGINT) AS cents_err_ppm
FROM a ORDER BY event_type
"""))

  def all: Seq[QuerySpec] = Seq(q271, q272, q273)
}
