package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}
import org.apache.spark.sql.graftvec.VectorExpressions

/** Round-12 governance tier: the record-linkage / data-governance /
  * capacity-planning operators a curation platform layers over the
  * analytics engine — fuzzy name linkage over the value dictionary
  * (the scalable form: score DISTINCT values, never raw rows),
  * sketch-based join-cardinality estimation (the 100 TB query planner's
  * admission check), exact robust statistics (median/MAD outliers by
  * explicit integer rank — the q194 lesson: never let two engines
  * interpolate a percentile independently), Benford first-digit audits,
  * int8 embedding-quantization error accounting, and k-anonymity
  * release checks.
  *
  * Determinism rules as everywhere in the registry: integer or
  * bit-pinned IEEE outputs only (ppm/pico fixed-point via floor, raw
  * data values via rank-select, single-constant multiplies), no
  * cross-row float accumulation (error sums ride exact bigints), no
  * libm transcendentals (Benford expectations are hardcoded floored
  * constants, not log10 calls).
  */
object LinkageQueries {

  /** The engine-standard 60-bit deterministic hash (q164/q199
    * convention): top 15 hex digits of md5 as a bigint — both engines
    * parse the same hex, so sketch bucketing is bit-identical. */
  private def h60(c: String): String =
    s"cast(conv(substring(md5($c), 1, 15), 16, 10) as bigint)"
  private def sqlH60(c: String): String =
    s"CAST(concat('0x', substr(md5($c), 1, 15)) AS BIGINT)"

  /** q221 — fuzzy name linkage over the value DICTIONARY (entity
    * resolution's scalable first move): distinct lowered part names →
    * first-token blocking → Jaro–Winkler scoring with the codegen'd
    * [[org.apache.spark.sql.graftvec.JaroWinkler]] expression → pairs
    * ≥ 0.84 with their row multiplicities. Scoring the dictionary
    * instead of the rows is what survives 100 TB: the dictionary is
    * vocabulary-sized (64 names here, maybe 10⁶ in a real catalog —
    * broadcastable either way) while the row table grows unboundedly;
    * multiplicities (`rows_a/rows_b`) let downstream reconstruct
    * row-level impact without ever joining rows to rows. The score is
    * exported as floor-ppm fixed point; the raw double is bit-identical
    * to DuckDB's `jaro_winkler_similarity` (60k-pair fuzz pin, see
    * [[org.apache.spark.sql.graftvec.StringSim]]), so even the ≥ 0.84
    * threshold agrees at the bit level. */
  val q221 = QuerySpec("q221_name_linkage",
    (s, dir) => {
      val dict = Tables(s, dir, "part")
        .groupBy(lower(col("p_name")).as("nm"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("blk", split(col("nm"), " ").getItem(0))
      val a = dict.select(col("blk"), col("nm").as("nm_a"),
        col("cnt").as("rows_a"))
      val b = dict.select(col("blk"), col("nm").as("nm_b"),
        col("cnt").as("rows_b"))
      a.join(b, Seq("blk")).where(col("nm_a") < col("nm_b"))
        .withColumn("jw",
          VectorExpressions.jaroWinkler(col("nm_a"), col("nm_b")))
        .where(col("jw") >= 0.84)
        .select(col("nm_a"), col("nm_b"),
          floor(col("jw") * lit(1000000.0) + lit(0.5)).cast("long")
            .as("jw_ppm"),
          col("rows_a"), col("rows_b"))
        .orderBy("nm_a", "nm_b")
    },
    Some(raw"""
WITH d AS (
  SELECT lower(p_name) AS nm, CAST(count(*) AS BIGINT) AS cnt
  FROM part GROUP BY 1
), t AS (
  SELECT nm, cnt, split_part(nm, ' ', 1) AS blk FROM d
)
SELECT a.nm AS nm_a, b.nm AS nm_b,
  CAST(floor(jaro_winkler_similarity(a.nm, b.nm) * 1000000.0 + 0.5)
    AS BIGINT) AS jw_ppm,
  a.cnt AS rows_a, b.cnt AS rows_b
FROM t a JOIN t b ON a.blk = b.blk AND a.nm < b.nm
WHERE jaro_winkler_similarity(a.nm, b.nm) >= 0.84
ORDER BY nm_a, nm_b
"""))

  /** q222 — join-cardinality estimation by count-min inner product
    * (the planner's admission check before launching a 100 TB join:
    * |A ⋈ B| = Σₖ cntA(k)·cntB(k), estimated as min over d hash rows
    * of Σ_b cmA[r][b]·cmB[r][b] — an upper bound that tightens with
    * width). d=4 rows × w=256 buckets per side; the sketches are built
    * from per-key counts (one aggregate each — the key dictionary,
    * not the rows, is what the 4× explode touches) and the inner
    * product is a 1024-row join. At scale both sketches are
    * kilobytes regardless of input size, mergeable across shards, and
    * the exact verification column (computed here by the key-dictionary
    * equi-join) is exactly what you'd drop. CM always overestimates,
    * so `overest_ppm` is a nonnegative integer div — pure bigint
    * arithmetic end to end, nothing to drift. */
  val q222 = QuerySpec("q222_join_size_estimate",
    (s, dir) => {
      val W = 256
      def keyCounts(df: DataFrame, key: String): DataFrame =
        df.groupBy(col(key).cast("long").as("k"))
          .agg(count(lit(1)).as("c"))
      val ek = keyCounts(Tables(s, dir, "events"), "user_id")
      val ok = keyCounts(Tables(s, dir, "orders"), "o_custkey")
      def cm(kc: DataFrame, side: String): DataFrame =
        kc.select(explode(array((0 until 4).map(lit): _*)).as("r"),
            col("k"), col("c"))
          .withColumn("b", expr(
            s"${h60("concat('s', cast(r as string), ':', cast(k as string))")} % $W"))
          .groupBy("r", "b").agg(sum("c").as(side))
      val est = cm(ek, "ce").join(cm(ok, "co"), Seq("r", "b"))
        .groupBy("r").agg(sum(col("ce") * col("co")).as("e"))
        .agg(min("e").as("cm_estimate"))
      val exact = ek.withColumnRenamed("c", "ca")
        .join(ok.withColumnRenamed("c", "cb"), "k")
        .agg(sum(col("ca") * col("cb")).as("exact_rows"))
      exact.crossJoin(est)
        .select(col("exact_rows"), col("cm_estimate"),
          expr("((cm_estimate - exact_rows) * 1000000) div exact_rows")
            .as("overest_ppm"))
    },
    Some(raw"""
WITH ek AS (
  SELECT user_id AS k, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1
), ok AS (
  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS c FROM orders GROUP BY 1
), rr AS (
  SELECT unnest(generate_series(0, 3)) AS r
), ecm AS (
  SELECT r, ${sqlH60("concat('s', CAST(r AS VARCHAR), ':', CAST(k AS VARCHAR))")} % 256 AS b,
    CAST(sum(c) AS BIGINT) AS ce
  FROM ek, rr GROUP BY 1, 2
), ocm AS (
  SELECT r, ${sqlH60("concat('s', CAST(r AS VARCHAR), ':', CAST(k AS VARCHAR))")} % 256 AS b,
    CAST(sum(c) AS BIGINT) AS co
  FROM ok, rr GROUP BY 1, 2
), est AS (
  SELECT r, CAST(sum(ce * co) AS BIGINT) AS e
  FROM ecm JOIN ocm USING (r, b) GROUP BY r
), ex AS (
  SELECT CAST(sum(ek.c * ok.c) AS BIGINT) AS exact_rows
  FROM ek JOIN ok USING (k)
)
SELECT exact_rows, (SELECT min(e) FROM est) AS cm_estimate,
  ((SELECT min(e) FROM est) - exact_rows) * 1000000 // exact_rows
    AS overest_ppm
FROM ex
"""))

  /** q223 — robust outlier report by exact median/MAD (the
    * heavy-tail-safe anomaly screen: mean/stddev break on one extreme
    * value; median ± k·MAD doesn't). Both medians are LOWER medians
    * selected by explicit integer rank — raw data values, zero
    * interpolation, so the engines can't diverge on float arithmetic
    * (the q194 percentile lesson institutionalized). The outlier
    * cutoff multiplies MAD by the single constant 4.4478 (= 3σ × the
    * 1.4826 normal-consistency factor, pre-multiplied so there is
    * exactly ONE float multiply to agree on).
    *
    * Scale shape (rebuilt r13 per the r12 verdict): rank selection
    * runs on the q172 two-phase prefix-rank core — a global
    * `sortByKey` over `event_type : hex(doubleSortKey(value)) :
    * event_id` (the [[org.apache.spark.sql.graftvec.DoubleSortKey]]
    * sign-fold makes hex-lexicographic order EXACTLY double order, so
    * the oracle's plain ORDER BY picks the identical row) plus a
    * broadcast per-type offset frame; per-type rank = global
    * cumulative count − type offset. No window ever touches raw
    * events — the r12 shape put each event type's full row set
    * through one task's sort, which a hot type at 100 TB turns into
    * billions of rows on one core. Two rank passes scale like two
    * sorts; q216's sketch remains the one-pass approximate tier. */
  val q223 = QuerySpec("q223_robust_outliers",
    (s, dir) => {
      import org.apache.spark.sql.graftvec.VectorExpressions.doubleSortKey
      val ev = Tables(s, dir, "events")
        .select(col("event_type"), col("event_id"), col("value"))
      // rank-select the per-type lower median of `vCol` without any
      // window over raw rows: two-phase global prefix rank + a
      // |types|-row offset/count frame (broadcast both ways)
      def medianByRank(df: DataFrame, vCol: String,
          outName: String): DataFrame = {
        val counts = df.groupBy("event_type").agg(count(lit(1)).as("n"))
        val wt = Window.orderBy("event_type")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = counts
          .withColumn("off", coalesce(sum("n").over(wt), lit(0L)))
        val keyed = df
          .withColumn("k", concat(col("event_type"), lit(":"),
            lpad(hex(doubleSortKey(col(vCol))), 16, "0"), lit(":"),
            lpad(col("event_id").cast("string"), 12, "0")))
          .withColumn("one", lit(1L))
        graft.operators.Packing.withCumulativeSum(keyed, "k", "one", 32)
          .join(broadcast(offsets), "event_type")
          .where(expr("cum - off = (n + 1) div 2"))
          .select(col("event_type"), col(vCol).as(outName), col("n"))
      }
      val med = medianByRank(ev, "value", "med")
      // dev feeds the MAD rank pass (itself two jobs via sortByKey)
      // AND the final aggregate — persist or the events scan + median
      // join re-run per consumer (measured 60.7 -> 56.3 s at sf10;
      // the remaining cost is the two inherent full rank sorts)
      val dev = graft.CacheRegistry.persistTracked(
        ev.join(broadcast(med), "event_type")
          .withColumn("absdev", abs(col("value") - col("med"))))
      val mad = medianByRank(
        dev.select(col("event_type"), col("event_id"), col("absdev")),
        "absdev", "mad")
      dev.join(broadcast(mad.select("event_type", "mad")), "event_type")
        .groupBy("event_type")
        .agg(first("n").as("n"), first("med").as("med"),
          first("mad").as("mad"),
          sum(when(col("absdev") > col("mad") * lit(4.4478), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    },
    Some(raw"""
WITH ev AS (
  SELECT event_type, event_id, value FROM events
), med AS (
  SELECT event_type, value AS med, n FROM (
    SELECT event_type, value,
      row_number() OVER (PARTITION BY event_type
        ORDER BY value, event_id) AS rn,
      CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM ev
  ) WHERE rn = (n + 1) // 2
), dev AS (
  SELECT ev.event_type, ev.event_id, ev.value, med.med, med.n,
    abs(ev.value - med.med) AS absdev
  FROM ev JOIN med USING (event_type)
), mad AS (
  SELECT event_type, absdev AS mad FROM (
    SELECT event_type, absdev,
      row_number() OVER (PARTITION BY event_type
        ORDER BY absdev, event_id) AS rn,
      n
    FROM dev
  ) WHERE rn = (n + 1) // 2
)
SELECT dev.event_type, any_value(dev.n) AS n, any_value(dev.med) AS med,
  any_value(mad.mad) AS mad,
  CAST(count(*) FILTER (WHERE dev.absdev > mad.mad * 4.4478) AS BIGINT)
    AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type ORDER BY dev.event_type
"""))

  /** q224 — Benford first-significant-digit audit over order totals
    * (the fraud/synthetic-data screen: organically-grown magnitudes
    * follow log₁₀(1+1/d); fabricated ones usually don't). The digit is
    * taken from the STRING rendering of the floored bigint — never
    * from log10 (libm) and never from a double→string rendering (the
    * two engines format doubles differently). Expected frequencies are
    * hardcoded floored-ppm constants; observed shares and the
    * chi-square-style distortion are integer div ppm arithmetic —
    * the whole audit is bigint-exact. One aggregate + a broadcast
    * 1-row total: fully scalable. */
  val q224 = QuerySpec("q224_benford_audit",
    (s, dir) => {
      val expPpm = Map(1 -> 301029L, 2 -> 176091L, 3 -> 124938L,
        4 -> 96910L, 5 -> 79181L, 6 -> 66946L, 7 -> 57991L,
        8 -> 51152L, 9 -> 45757L)
      val obs = Tables(s, dir, "orders")
        .select(substring(floor(col("o_totalprice")).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
        // Benford is defined on significant digits 1-9 only: totals
        // < 1 yield digit 0 and negatives a null (leading '-') — both
        // out of the law's domain, filtered identically in BOTH
        // engines so neither can fall through to a divergent branch
        .where(col("digit").between(1, 9))
        .groupBy("digit").agg(count(lit(1)).as("obs"))
      val total = obs.agg(sum("obs").as("total"))
      obs.crossJoin(total)
        .withColumn("obs_ppm", expr("obs * 1000000 div total"))
        .withColumn("exp_ppm",
          expPpm.foldLeft(lit(0L)) { case (acc, (d, p)) =>
            when(col("digit") === d, lit(p)).otherwise(acc) })
        .withColumn("chi_contrib", expr(
          "((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)) div exp_ppm"))
        .select(col("digit"), col("obs"), col("obs_ppm"),
          col("exp_ppm"), col("chi_contrib"))
        .orderBy("digit")
    },
    Some(raw"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
      1, 1) AS INT) AS digit
  FROM orders
), obs AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS obs
  FROM d WHERE digit BETWEEN 1 AND 9 GROUP BY 1
), t AS (
  SELECT CAST(sum(obs) AS BIGINT) AS total FROM obs
)
SELECT digit, obs,
  obs * 1000000 // total AS obs_ppm,
  CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938
    WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66946
    WHEN 7 THEN 57991 WHEN 8 THEN 51152 ELSE 45757 END AS exp_ppm,
  ((obs * 1000000 // total) -
   (CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938
     WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66946
     WHEN 7 THEN 57991 WHEN 8 THEN 51152 ELSE 45757 END)) *
  ((obs * 1000000 // total) -
   (CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938
     WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66946
     WHEN 7 THEN 57991 WHEN 8 THEN 51152 ELSE 45757 END)) //
  (CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091 WHEN 3 THEN 124938
    WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66946
    WHEN 7 THEN 57991 WHEN 8 THEN 51152 ELSE 45757 END) AS chi_contrib
FROM obs, t
ORDER BY digit
"""))

  /** q225 — int8 scalar-quantization error audit for the embedding
    * store (the decision artifact for "can we serve vectors at 4×
    * less memory": per-dimension min/max grid, 256 levels,
    * reconstruct at bucket centers, account the squared error). The
    * error is accumulated as exact pico fixed-point bigints
    * (floor(err·10¹²)) because a cross-row DOUBLE sum is
    * order-dependent — the one arithmetic form this registry never
    * emits. Per-dimension min/max is one posexplode aggregate whose
    * output is dimension-sized (64 rows) and broadcast back; at scale
    * the quantizer fits in a closure while the scan stays narrow.
    * FLOAT→DOUBLE widening is exact on both engines, so grid, codes,
    * and errors are bit-identical. */
  val q225 = QuerySpec("q225_int8_quant_audit",
    (s, dir) => {
      val ex = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(transform(col("embedding"), e => e.cast("double")))
            .as(Seq("pos", "x")))
      val mm = ex.groupBy("pos")
        .agg(min("x").as("lo"), max("x").as("hi"))
      ex.join(broadcast(mm), "pos")
        .withColumn("scale", (col("hi") - col("lo")) / lit(255.0))
        .withColumn("q", when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(lit(255L),
            floor((col("x") - col("lo")) / col("scale")))))
        .withColumn("xq",
          col("lo") + (col("q").cast("double") + lit(0.5)) * col("scale"))
        .withColumn("err_pico",
          floor(((col("x") - col("xq")) * (col("x") - col("xq"))) *
            lit(1000000000000.0)).cast("long"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vals"),
          sum("err_pico").as("sum_err_pico"),
          max("err_pico").as("max_err_pico"))
        .orderBy("label")
    },
    Some(raw"""
WITH ex AS (
  SELECT vec_id, label,
    CAST(unnest(embedding) AS DOUBLE) AS x,
    unnest(generate_series(1, len(embedding))) AS pos
  FROM embeddings
), mm AS (
  SELECT pos, min(x) AS lo, max(x) AS hi FROM ex GROUP BY 1
), j AS (
  SELECT label, x, lo, hi, (hi - lo) / 255.0 AS scale
  FROM ex JOIN mm USING (pos)
), q AS (
  SELECT label, x, lo, scale,
    CASE WHEN hi = lo THEN 0
      ELSE least(255, CAST(floor((x - lo) / scale) AS BIGINT)) END AS q
  FROM j
), e AS (
  SELECT label,
    CAST(floor(((x - (lo + (CAST(q AS DOUBLE) + 0.5) * scale)) *
                (x - (lo + (CAST(q AS DOUBLE) + 0.5) * scale))) *
               1000000000000.0) AS BIGINT) AS err_pico
  FROM q
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vals,
  CAST(sum(err_pico) AS BIGINT) AS sum_err_pico,
  max(err_pico) AS max_err_pico
FROM e GROUP BY label ORDER BY label
"""))

  /** q226 — k-anonymity release check (the privacy gate before a
    * curated table leaves the platform): equivalence classes over the
    * quasi-identifiers (nation, market segment, account-balance
    * kilobucket), class sizes, the k<5 suppression flag, and the
    * release's overall k (the min class size) as a ride-along column.
    * One aggregate + a broadcast 1-row min — the same shape at 10⁹
    * customers. The balance bucket floors to bigint so the class key
    * is integer-exact. */
  val q226 = QuerySpec("q226_k_anonymity",
    (s, dir) => {
      val classes = Tables(s, dir, "customer")
        .select(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_kb"))
        .groupBy("nk", "seg", "bal_kb")
        .agg(count(lit(1)).as("class_size"))
      val kAnon = classes.agg(min("class_size").as("k_anon"))
      classes.crossJoin(kAnon)
        .select(col("nk"), col("seg"), col("bal_kb"), col("class_size"),
          (col("class_size") < 5).as("suppress"), col("k_anon"))
        .orderBy("nk", "seg", "bal_kb")
    },
    Some(raw"""
WITH classes AS (
  SELECT c_nationkey AS nk, c_mktsegment AS seg,
    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_kb,
    CAST(count(*) AS BIGINT) AS class_size
  FROM customer GROUP BY 1, 2, 3
)
SELECT nk, seg, bal_kb, class_size,
  class_size < 5 AS suppress,
  (SELECT min(class_size) FROM classes) AS k_anon
FROM classes
ORDER BY nk, seg, bal_kb
"""))

  def all: Seq[QuerySpec] = Seq(q221, q222, q223, q224, q225, q226)
}
