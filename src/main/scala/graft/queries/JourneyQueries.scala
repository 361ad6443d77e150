package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.{QuerySpec, Tables}

/** Round-14 journey-analytics tier: the two classic ITERATIVE
  * customer-journey computations, made exactly deterministic —
  *
  *  - q274 Markov-chain attribution with removal effects: absorption
  *    probabilities by K-step power iteration in integer ppb (every
  *    step is integer multiply + order-independent sum + one floor
  *    division, so two engines replay it bit for bit — no float
  *    drift, ever);
  *  - q275 discrete-time survival/hazard with the survival curve as a
  *    sequential truncating product, run as a RECURSIVE CTE with
  *    near-identical SQL text on BOTH engines (Spark 4.x recursion —
  *    the q259 surface doing real statistics).
  */
object JourneyQueries {

  private val K = 30 // power-iteration steps (geometric convergence;
                     // identical truncation sequence both engines)
  private val channels = Seq("click", "error", "signup", "view")

  /** q274 — Markov removal-effect attribution: user journeys
    * (event streams truncated at first purchase) define a first-order
    * Markov chain over {START, channels..., purchase} with absorbing
    * CONV (conversion) and DROP (journey lost); the value of channel
    * c is the REMOVAL EFFECT — how much the START→CONV absorption
    * probability falls when every transition into c is redirected to
    * DROP (Anderl et al.'s attribution model, public literature).
    *
    * Determinism/scale: transition probabilities are exact ppm floor
    * divisions; absorption runs K = 30 power-iteration steps in
    * integer ppb (Σ ppm·p fits long: ≤ 10⁶·10⁹·|states|). The
    * corpus-scale work is the distributed journey/transition
    * counting; the iteration itself runs DRIVER-SIDE over the
    * |states|²·|variants| matrix — a DOMAIN constant (≤ hundreds of
    * rows at any corpus size), which is the scale-correct home for
    * it. The oracle replays the identical iteration as K unrolled
    * CTE steps (generated SQL), so the driver hash certifies all 30
    * steps agree. */
  val q274 = QuerySpec("q274_markov_attribution",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("rn")
      val ordered = Tables(s, dir, "events")
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")))
        .select("user_id", "event_type", "rn")
      val firstP = ordered.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("rn").as("prn"))
      val j = ordered.join(firstP, Seq("user_id"), "left")
        .where(col("prn").isNull || col("rn") <= col("prn"))
      val steps = j
        .withColumn("b", lead("event_type", 1).over(w))
        .select(col("event_type").as("a"),
          coalesce(
            when(col("event_type") === "purchase", lit("CONV"))
              .otherwise(col("b")),
            lit("DROP")).as("nxt"))
      val starts = j.where(col("rn") === 1)
        .select(lit("START").as("a"), col("event_type").as("nxt"))
      val trans = steps.unionByName(starts)
        .groupBy("a", "nxt").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2)))
      // driver-side exact iteration over the domain-bounded matrix
      def absorption(removed: Option[String]): Long = {
        val redirected = trans.map { case (a, b, c) =>
          (a, if (removed.contains(b)) "DROP" else b, c)
        }
        val outC = redirected.groupBy(_._1).view
          .mapValues(_.map(_._3).sum).toMap
        val ppm = redirected.groupBy(x => (x._1, x._2)).map {
          case ((a, b), xs) =>
            (a, b, xs.map(_._3).sum * 1000000L / outC(a))
        }.toSeq
        var p = Map[String, Long]("CONV" -> 1000000000L)
        for (_ <- 1 to K) {
          val next = ppm.groupBy(_._1).map { case (a, edges) =>
            a -> edges.map { case (_, b, t) =>
              t * p.getOrElse(b, 0L)
            }.sum./(1000000L)
          }
          p = next + ("CONV" -> 1000000000L)
        }
        p.getOrElse("START", 0L)
      }
      val full = absorption(None)
      val rows = (("none", full, 0L) +: channels.map { c =>
        val pr = absorption(Some(c))
        (c, pr, (full - pr) * 1000000L / full)
      }).map { case (v, p, re) => Row(v, p, re) }
      s.createDataFrame(
        s.sparkContext.parallelize(rows.toList, 1),
        StructType(Seq(
          StructField("removed", StringType, nullable = false),
          StructField("p_start_ppb", LongType, nullable = false),
          StructField("removal_ppm", LongType, nullable = false))))
        .orderBy("removed")
    },
    Some {
      // AS MATERIALIZED per step: DuckDB otherwise inlines every CTE
      // reference, so step k's plan embeds all k−1 prior plans —
      // measured superlinear (0.5 s at K=3 → 2.5 s at K=9 →
      // intractable at 30); materialized, each tiny step runs once
      val steps = (1 to K).map { i =>
        s"""p$i AS MATERIALIZED (
  SELECT vt.v, vt.a AS node,
    CAST(sum(vt.ppm * coalesce(p.p, 0)) // 1000000 AS BIGINT) AS p
  FROM vtrans vt LEFT JOIN p${i - 1} p
    ON vt.v = p.v AND vt.b = p.node
  GROUP BY 1, 2
  UNION ALL SELECT v, 'CONV', 1000000000 FROM variants
)"""
      }.mkString(", ")
      raw"""
WITH ordered AS (
  SELECT user_id, event_type,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS rn
  FROM events
), firstp AS (
  SELECT user_id, min(rn) AS prn FROM ordered
  WHERE event_type = 'purchase' GROUP BY 1
), j AS (
  SELECT o.user_id, o.event_type, o.rn FROM ordered o
  LEFT JOIN firstp f ON o.user_id = f.user_id
  WHERE f.prn IS NULL OR o.rn <= f.prn
), st AS (
  SELECT user_id, event_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY rn) AS b
  FROM j
), trans AS (
  SELECT a, nxt, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT event_type AS a,
      coalesce(CASE WHEN event_type = 'purchase' THEN 'CONV'
        ELSE b END, 'DROP') AS nxt
    FROM st
    UNION ALL
    SELECT 'START', event_type FROM j WHERE rn = 1
  ) GROUP BY 1, 2
), out_c AS (
  SELECT a, CAST(sum(c) AS BIGINT) AS oc FROM trans GROUP BY 1
), variants(v) AS (
  VALUES ('none'), ('click'), ('error'), ('signup'), ('view')
), vtrans AS MATERIALIZED (
  -- merge redirected counts BEFORE the ppm division (the driver-side
  -- iteration floors once over the merged count — must match)
  SELECT v, a, b, CAST((sum(c) * 1000000) // oc AS BIGINT) AS ppm
  FROM (
    SELECT v.v, t.a,
      CASE WHEN t.nxt = v.v THEN 'DROP' ELSE t.nxt END AS b,
      t.c, o.oc
    FROM trans t JOIN out_c o ON t.a = o.a CROSS JOIN variants v
  ) GROUP BY v, a, b, oc
), p0 AS MATERIALIZED (
  SELECT v, 'CONV' AS node, CAST(1000000000 AS BIGINT) AS p
  FROM variants
), $steps, fin AS (
  SELECT v AS removed, p AS p_start_ppb FROM p$K
  WHERE node = 'START'
), fullp AS (
  SELECT p_start_ppb AS fp FROM fin WHERE removed = 'none'
)
SELECT f.removed, f.p_start_ppb,
  CAST(CASE WHEN f.removed = 'none' THEN 0
    ELSE ((fl.fp - f.p_start_ppb) * 1000000) // fl.fp END AS BIGINT)
    AS removal_ppm
FROM fin f CROSS JOIN fullp fl
ORDER BY f.removed
"""
    })

  /** q275 — discrete-time survival analysis (churn hazard + survival
    * curve) with right-censoring: users "enter" at their first
    * HIGH-VALUE week (payload ≥ 170.00 — the engagement definition;
    * every-week raw activity is degenerate in this fixture) and churn
    * at lifetime k if their last high-value week is k weeks after
    * entry AND before the observation horizon (users still engaged in
    * the final week are censored, not churned — the Kaplan–Meier
    * discipline). hazard(k) = churned(k) / at-risk(k)
    * in exact ppm (at-risk = suffix count over the bounded lifetime
    * frame), and the survival curve S(k) = Π (1 − h(j)) is a
    * SEQUENTIAL truncating product — computed by a RECURSIVE CTE
    * whose SQL text is near-identical on Spark and DuckDB (only the
    * integer-division operator differs), each step one exact
    * multiply + floor division in ppm. All frames after the one
    * distributed per-user aggregate are lifetime-bounded constants.
    */
  val q275 = QuerySpec("q275_survival_hazard",
    (s, dir) => {
      // Spark executes each UnionLoop step against the anchor plan —
      // an un-materialized hazard CTE would re-run the corpus scan +
      // aggregates once per recursion step (measured 31 s at sf10).
      // Materialize the tiny hazard frame first; the recursion then
      // iterates over the cached 5-row view (7 s → 31 s fixed).
      Tables(s, dir, "events").createOrReplaceTempView("events_sv")
      graft.CacheRegistry.persistTracked(
        s.sql(hazardSql("events_sv", "div", "cast(ts as long)")))
        .createOrReplaceTempView("hazard_sv")
      s.sql(recursionSql("hazard_sv", "div"))
    },
    Some(raw"""
WITH RECURSIVE h AS (${hazardSql("events", "//", "epoch(ts)")}),
${recursionBody("h", "//")}
"""))

  /** The non-recursive hazard computation — one text, two engines
    * (`divOp` and the epoch accessor are the only dialect splits). */
  private def hazardSql(table: String, divOp: String,
      epochExpr: String): String = raw"""
SELECT k, at_risk, churned, n_cens,
  CAST((churned * 1000000) $divOp at_risk AS BIGINT) AS hazard_ppm
FROM (
  SELECT k, n, n_cens, n - n_cens AS churned,
    CAST(sum(n) OVER (ORDER BY k DESC ROWS UNBOUNDED PRECEDING)
      AS BIGINT) AS at_risk
  FROM (
    SELECT k, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(censored) AS BIGINT) AS n_cens
    FROM (
      SELECT s.l - s.f AS k,
        CASE WHEN s.l = hz.wmax THEN 1 ELSE 0 END AS censored
      FROM (
        SELECT user_id, min(week) AS f, max(week) AS l FROM (
          SELECT user_id,
            CAST(floor($epochExpr) AS BIGINT) $divOp 604800 AS week
          FROM $table
          WHERE CAST(round(value * 100) AS BIGINT) >= 17000
        ) GROUP BY 1
      ) s CROSS JOIN (
        SELECT max(l) AS wmax FROM (
          SELECT user_id, max(week) AS l FROM (
            SELECT user_id,
              CAST(floor($epochExpr) AS BIGINT) $divOp 604800 AS week
            FROM $table
            WHERE CAST(round(value * 100) AS BIGINT) >= 17000
          ) GROUP BY 1
        )
      ) hz
    ) GROUP BY 1
  )
)"""

  /** The recursive survival-curve part, shared modulo `divOp`. */
  private def recursionBody(h: String, divOp: String): String = raw"""
surv (k, s_ppm) AS (
  SELECT $h.k, CAST(1000000 - $h.hazard_ppm AS BIGINT) FROM $h
  WHERE $h.k = 0
  UNION ALL
  SELECT $h.k,
    CAST((surv.s_ppm * (1000000 - $h.hazard_ppm)) $divOp 1000000
      AS BIGINT)
  FROM surv JOIN $h ON $h.k = surv.k + 1
)
SELECT $h.k, $h.at_risk, $h.churned, $h.n_cens, $h.hazard_ppm,
  surv.s_ppm AS survival_ppm
FROM $h JOIN surv ON $h.k = surv.k
ORDER BY $h.k"""

  private def recursionSql(h: String, divOp: String): String =
    s"WITH RECURSIVE ${recursionBody(h, divOp)}"

  /** q283 — EXACT Shapley-value attribution (Shao & Li's coalition
    * model, public literature): the characteristic function
    * v(S) = (# converted journeys whose touched-channel set ⊆ S) /
    * (# journeys), and each channel's credit is its exact Shapley
    * value over the 2⁴ coalitions. All arithmetic is integer: the
    * output is Σ_S |S|!·(3−|S|)!·(N(S∪{c}) − N(S)) — an exact
    * integer "scaled Shapley" (the true value × 4! × n_total) — plus
    * its ppm floor division. v is monotone (mask ⊆ test), so every
    * marginal is ≥ 0 and floor division is engine-identical.
    *
    * Scale shape: the N-row work is the distributed journey
    * truncation + per-user bitmask fold (bit_or) + a 16-row mask
    * histogram; the coalition sweep runs driver-side over a DOMAIN
    * constant (2⁴ subsets × 4 channels — like q274's matrix, the
    * scale-correct home). The oracle replays the identical subset
    * algebra in SQL over generate_series(0,15). */
  val q283 = QuerySpec("q283_shapley_attribution",
    (s, dir) => {
      val maskExpr = expr("""bit_or(CASE event_type
        WHEN 'click' THEN 1 WHEN 'error' THEN 2
        WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END)""")
      val ordered = Tables(s, dir, "events")
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")))
        .select("user_id", "event_type", "rn")
      val firstP = ordered.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("rn").as("prn"))
      val j = ordered.join(firstP, Seq("user_id"), "left")
        .where(col("prn").isNull || col("rn") <= col("prn"))
        .groupBy("user_id")
        .agg(maskExpr.as("mask"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
      val stats = j.groupBy("mask")
        .agg(count(lit(1)).as("n"), sum("conv").as("nc"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      val nTotal = stats.map(_._2).sum
      val ncByMask = stats.map(x => x._1 -> x._3).toMap
      def nS(sMask: Int): Long =
        ncByMask.collect { case (m, c) if (m | sMask) == sMask => c }.sum
      val wt = Array(6L, 2L, 2L, 6L) // |S|!·(3−|S|)! for |S| = 0..3
      val rows = Seq("click" -> 1, "error" -> 2, "signup" -> 4,
        "view" -> 8).map { case (c, bit) =>
        val scaled = (0 until 16).filter(ss => (ss & bit) == 0).map {
          ss => wt(Integer.bitCount(ss)) * (nS(ss | bit) - nS(ss))
        }.sum
        Row(c, scaled, scaled * 1000000L / (24L * nTotal))
      }
      s.createDataFrame(
        s.sparkContext.parallelize(rows.toList, 1),
        StructType(Seq(
          StructField("channel", StringType, nullable = false),
          StructField("shapley_scaled", LongType, nullable = false),
          StructField("shapley_ppm", LongType, nullable = false))))
        .orderBy("channel")
    },
    Some(raw"""
WITH e AS (
  SELECT user_id, event_type,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), fp AS (
  SELECT user_id, min(rn) AS prn FROM e
  WHERE event_type = 'purchase' GROUP BY 1
), j AS (
  SELECT e.user_id,
    bit_or(CASE e.event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
      WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END) AS mask,
    max(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM e LEFT JOIN fp ON e.user_id = fp.user_id
  WHERE fp.prn IS NULL OR e.rn <= fp.prn
  GROUP BY 1
), tot AS (SELECT count(*) AS n_total FROM j),
m AS (SELECT mask, count(*) AS nc FROM j WHERE conv = 1 GROUP BY mask),
sub AS (SELECT unnest(generate_series(0, 15)) AS s),
ns AS (
  SELECT sub.s, CAST(coalesce(sum(m.nc), 0) AS BIGINT) AS n
  FROM sub LEFT JOIN m ON (m.mask | sub.s) = sub.s
  GROUP BY sub.s
), chan AS (
  SELECT * FROM (VALUES ('click', 1), ('error', 2), ('signup', 4),
    ('view', 8)) AS t(name, bit)
)
SELECT chan.name AS channel,
  CAST(sum((CASE bit_count(sub.s) WHEN 0 THEN 6 WHEN 1 THEN 2
      WHEN 2 THEN 2 ELSE 6 END) * (n2.n - n1.n)) AS BIGINT)
    AS shapley_scaled,
  CAST(sum((CASE bit_count(sub.s) WHEN 0 THEN 6 WHEN 1 THEN 2
      WHEN 2 THEN 2 ELSE 6 END) * (n2.n - n1.n)) * 1000000
    // (24 * any_value(tot.n_total)) AS BIGINT) AS shapley_ppm
FROM chan
JOIN sub ON (sub.s & chan.bit) = 0
JOIN ns n1 ON n1.s = sub.s
JOIN ns n2 ON n2.s = (sub.s | chan.bit)
CROSS JOIN tot
GROUP BY chan.name
ORDER BY channel
"""))

  def all: Seq[QuerySpec] = Seq(q274, q275, q283)
}