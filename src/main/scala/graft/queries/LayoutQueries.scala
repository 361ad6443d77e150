package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}
import graft.functions.{Text => T}

/** Round-13 second wave: physical-layout optimization and frontier /
  * integrity analytics — the Z-order (Morton) clustering audit behind
  * every lakehouse OPTIMIZE ZORDER decision, 2-D skyline (Pareto
  * frontier) extraction on the two-phase prefix-min pattern, and
  * homoglyph (mixed-script spoofing) detection for ingest integrity.
  *
  * Determinism rules unchanged: pure integer arithmetic for the bit
  * interleaves, zone stats, and ppm figures; the skyline orders by
  * exact integer cents/epoch-days; the homoglyph skeleton is one
  * fixed translate() table applied identically in both engines.
  */
object LayoutQueries {

  private def h60(c: String): String =
    s"cast(conv(substring(md5($c), 1, 15), 16, 10) as bigint)"
  private def sqlH60(c: String): String =
    s"CAST(concat('0x', substr(md5($c), 1, 15)) AS BIGINT)"

  /** 16-bit Morton spread (insert a zero bit before each input bit),
    * emitted as engine-dialect SQL text so Spark and DuckDB evaluate
    * the IDENTICAL mask/shift sequence: the classic 4-step magic-mask
    * chain, valid for inputs < 2¹⁶ (result < 2³², all in bigint). */
  private def spread(x: String, shl: (String, Int) => String): String = {
    val s1 = s"((($x) | ${shl(x, 8)}) & 16711935)"
    val s2 = s"(($s1 | ${shl(s1, 4)}) & 252645135)"
    val s3 = s"(($s2 | ${shl(s2, 2)}) & 858993459)"
    s"(($s3 | ${shl(s3, 1)}) & 1431655765)"
  }
  private def sparkShl(x: String, n: Int): String = s"shiftleft($x, $n)"
  private def duckShl(x: String, n: Int): String = s"($x << $n)"

  /** q233 — Z-order layout audit: would OPTIMIZE ZORDER(user, day)
    * beat the single-key sort layout for this table's probe mix? The
    * audit materializes zone statistics (min/max per zone of both
    * dimensions — the Parquet row-group / manifest mechanism, as in
    * q212) under TWO layouts — zones keyed by the leading 8 bits of
    * the single-key sort (user) versus the leading 8 bits of the
    * Morton interleave z = spread(u)|spread(d)<<1 — and counts, for a
    * fixed 1/16-width range probe on EACH dimension, the zones whose
    * [min,max] bracket cannot be skipped. Expected shape (and what
    * the spec pins): the single-key layout skips near-perfectly on
    * its own key and not at all on the other; Z-order skips on BOTH.
    * Dimensions normalize to 16-bit grids by exact integer min/max
    * scaling; everything downstream is bigint mask/shift/compare —
    * the two engines run the literally identical expression text.
    * Scale shape: one pass to zone stats (map-side-combining
    * aggregate on the zone id), then arithmetic on the ≤ 256-row zone
    * frames; the probe never touches rows. */
  val q233 = QuerySpec("q233_zorder_audit",
    (s, dir) => {
      val zS = spread("u16", sparkShl)
      val dS = spread("d16", sparkShl)
      val ev = Tables(s, dir, "events")
        .select(col("user_id").as("u"),
          expr("cast(floor(cast(ts as long) / 86400) as bigint)").as("d"))
      val bounds = ev.agg(min("u").as("ulo"), max("u").as("uhi"),
        min("d").as("dlo"), max("d").as("dhi"))
      val grid = ev.crossJoin(broadcast(bounds))
        .withColumn("u16",
          expr("((u - ulo) * 65535) div greatest(1, uhi - ulo)"))
        .withColumn("d16",
          expr("((d - dlo) * 65535) div greatest(1, dhi - dlo)"))
        .withColumn("z", expr(s"$zS | shiftleft($dS, 1)"))
      def zoneStats(zoneExpr: String, layout: String) = {
        val zones = grid.groupBy(expr(zoneExpr).as("zone"))
          .agg(min("u16").as("umin"), max("u16").as("umax"),
            min("d16").as("dmin"), max("d16").as("dmax"))
        zones.agg(count(lit(1)).as("n_zones"),
          sum(when(col("umax") >= 30720 && col("umin") <= 34815, 1L)
            .otherwise(0L)).as("u_hit"),
          sum(when(col("dmax") >= 30720 && col("dmin") <= 34815, 1L)
            .otherwise(0L)).as("d_hit"))
          .select(lit(layout).as("layout"), col("n_zones"),
            col("u_hit"), col("d_hit"))
      }
      zoneStats("u16 div 256", "single_key")
        .unionByName(zoneStats("z div 16777216", "zorder"))
        .select(col("layout"), explode(expr(
          "array(struct('u' as probe_dim, u_hit as zones_hit), " +
            "struct('d' as probe_dim, d_hit as zones_hit))")).as("p"),
          col("n_zones"))
        .select(col("layout"), col("p.probe_dim").as("probe_dim"),
          col("n_zones"), col("p.zones_hit").as("zones_hit"),
          expr("((n_zones - zones_hit) * 1000000) div n_zones")
            .as("skip_ppm"))
        .orderBy("layout", "probe_dim")
    },
    Some {
      val zD = spread("u16", duckShl)
      val dD = spread("d16", duckShl)
      raw"""
WITH ev AS (
  SELECT user_id AS u,
    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
  FROM events
), b AS (
  SELECT min(u) AS ulo, max(u) AS uhi, min(d) AS dlo, max(d) AS dhi
  FROM ev
), grid AS (
  SELECT ((u - ulo) * 65535) // greatest(1, uhi - ulo) AS u16,
    ((d - dlo) * 65535) // greatest(1, dhi - dlo) AS d16
  FROM ev, b
), gz AS (
  SELECT u16, d16, ($zD | (($dD) << 1)) AS z FROM grid
), za AS (
  SELECT 'single_key' AS layout, u16 // 256 AS zone,
    min(u16) AS umin, max(u16) AS umax,
    min(d16) AS dmin, max(d16) AS dmax
  FROM gz GROUP BY 2
  UNION ALL
  SELECT 'zorder', z // 16777216,
    min(u16), max(u16), min(d16), max(d16)
  FROM gz GROUP BY 2
), st AS (
  SELECT layout, CAST(count(*) AS BIGINT) AS n_zones,
    CAST(count(*) FILTER (WHERE umax >= 30720 AND umin <= 34815)
      AS BIGINT) AS u_hit,
    CAST(count(*) FILTER (WHERE dmax >= 30720 AND dmin <= 34815)
      AS BIGINT) AS d_hit
  FROM za GROUP BY layout
)
SELECT layout, p.probe_dim, n_zones,
  CASE p.probe_dim WHEN 'u' THEN u_hit ELSE d_hit END AS zones_hit,
  ((n_zones - CASE p.probe_dim WHEN 'u' THEN u_hit ELSE d_hit END)
    * 1000000) // n_zones AS skip_ppm
FROM st CROSS JOIN (SELECT unnest(['u', 'd']) AS probe_dim) p
ORDER BY layout, probe_dim
"""
    })

  /** q234 — 2-D skyline (Pareto frontier) of orders on (price asc,
    * recency desc): the cheapest-order-for-how-recent tradeoff curve
    * — the multi-criteria shortlist operator (skyline) that no
    * single ORDER BY can produce. Minimize x = exact cents, minimize
    * y = −epoch-day; a distinct point survives iff no other point is
    * ≤ on both axes with one strict.
    *
    * Algorithm (scale shape): collapse to the per-price minimum y
    * (one map-side-combining aggregate — anything above it at the
    * same price is dominated), then a STRICT prefix-min over the
    * price-sorted candidate frame decides survival — computed with
    * the q217 two-phase pattern: range-partition by price, per-bucket
    * local running min, and a ≤|buckets|-row broadcast edge frame
    * carrying each bucket's predecessor minimum. No single-partition
    * window ever sees the candidate frame. The oracle replays the
    * same frontier with a plain window (fine at oracle scale);
    * count-per-point rides along from the (x, y) aggregate. */
  val q234 = QuerySpec("q234_skyline_orders",
    (s, dir) => {
      val pts = Tables(s, dir, "orders")
        .select(expr("cast(round(o_totalprice * 100) as bigint)").as("x"),
          (-expr("datediff(o_orderdate, date'1970-01-01')").cast("long"))
            .as("y"))
      val counts = pts.groupBy("x", "y").agg(count(lit(1)).as("n_orders"))
      val cand = pts.groupBy("x").agg(min("y").as("y"))
      val parted = cand.repartitionByRange(32, col("x"))
        .withColumn("pid", spark_partition_id())
      val w = Window.partitionBy("pid").orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = parted.withColumn("lmin", min("y").over(w))
      val wp = Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
      val edges = parted.groupBy("pid").agg(min("y").as("bmin"))
        .withColumn("emin", min("bmin").over(wp))
        .select("pid", "emin")
      local.join(broadcast(edges), Seq("pid"), "left")
        .withColumn("pm", least(col("lmin"), col("emin")))
        .where(col("pm").isNull || col("y") < col("pm"))
        .join(counts, Seq("x", "y"))
        .select(col("x").as("price_cents"), (-col("y")).as("order_day"),
          col("n_orders"))
        .orderBy("price_cents")
    },
    Some(raw"""
WITH pts AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x,
    -CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
      AS y
  FROM orders
), counts AS (
  SELECT x, y, CAST(count(*) AS BIGINT) AS n_orders
  FROM pts GROUP BY 1, 2
), cand AS (
  SELECT x, min(y) AS y FROM pts GROUP BY x
), f AS (
  SELECT x, y, min(y) OVER (ORDER BY x
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM cand
)
SELECT f.x AS price_cents, -f.y AS order_day, c.n_orders
FROM f JOIN counts c ON f.x = c.x AND f.y = c.y
WHERE f.pm IS NULL OR f.y < f.pm
ORDER BY price_cents
"""))

  /** q235 — homoglyph (mixed-script spoofing) detection: the ingest
    * integrity screen that catches Cyrillic lookalikes smuggled into
    * ASCII words — the UTS #39 confusables idea reduced to its
    * engine core: a token is SPOOFED iff it differs from its skeleton
    * (one fixed confusable→ASCII translate table) and the skeleton is
    * a pure ASCII word — i.e. the token renders as an English word
    * but isn't one byte-wise. The fixture corpus is clean, so the
    * query first derives a deterministic "submission" stream with a
    * known injection (docs whose 60-bit hash ≡ 0 mod 7 get a/e/o
    * swapped for а/е/о — both engines replay the identical
    * injection), and the detector must recover exactly that split;
    * per source: submissions, flagged docs, spoofed token count, and
    * the flagged share in ppm. One narrow projection + explode +
    * aggregate — no joins, no windows; the translate table is a
    * constant. */
  val q235 = QuerySpec("q235_homoglyph_screen",
    (s, dir) => {
      val subs = Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          when(expr(s"pmod(${h60("concat('hg|', doc_id)")}, 7)") === 0,
            translate(col("text"), "aeo", "аео"))
            .otherwise(col("text")).as("text"))
      val toks = subs
        .select(col("source"), col("doc_id"),
          explode(T.tokens(col("text"))).as("tok"))
        .withColumn("skel",
          translate(col("tok"),
            "аеорсхуіѕј",
            "aeopcxyisj"))
        .withColumn("spoofed",
          col("tok") =!= col("skel") && col("skel").rlike("^[a-z]+$"))
      toks.groupBy("source", "doc_id")
        .agg(sum(when(col("spoofed"), 1L).otherwise(0L)).as("sp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("sp") > 0, 1L).otherwise(0L)).as("flagged_docs"),
          sum("sp").as("spoofed_tokens"))
        .withColumn("flagged_ppm",
          expr("(flagged_docs * 1000000) div n_docs"))
        .orderBy("source")
    },
    Some(raw"""
WITH subs AS (
  SELECT source, doc_id,
    CASE WHEN ${sqlH60("concat('hg|', doc_id)")} % 7 = 0
      THEN translate(text, 'aeo', 'аео') ELSE text END AS text
  FROM documents
), toks AS (
  SELECT source, doc_id, unnest(${TextQueries.sqlToks}) AS tok
  FROM subs
), sk AS (
  SELECT source, doc_id, tok,
    translate(tok, 'аеорсхуіѕј', 'aeopcxyisj') AS skel
  FROM toks
), per_doc AS (
  SELECT source, doc_id,
    CAST(count(*) FILTER (WHERE tok <> skel
      AND regexp_matches(skel, '^[a-z]+${"$"}')) AS BIGINT) AS sp
  FROM sk GROUP BY 1, 2
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(*) FILTER (WHERE sp > 0) AS BIGINT) AS flagged_docs,
  CAST(sum(sp) AS BIGINT) AS spoofed_tokens,
  (count(*) FILTER (WHERE sp > 0) * 1000000) // count(*) AS flagged_ppm
FROM per_doc GROUP BY source ORDER BY source
"""))

  /** q240 — spatial radius self-join via space-filling-curve
    * bucketing: all point pairs within Euclidean distance r, found by
    * an EQUI-join on Morton cells instead of the quadratic θ-join the
    * predicate literally is. Points are deterministic hash coordinates
    * (doc_id → a 2²⁰-square grid); cells are r-wide (cell = coord div 8192), one side expands to its 3×3 cell neighborhood,
    * the other stays home — every qualifying pair meets in EXACTLY one
    * (expanded, home) cell combination, so no post-dedup is needed —
    * and the exact integer predicate dx² + dy² ≤ r² refines
    * cell-local candidates only. The oracle is the NAIVE quadratic
    * join with the same predicate: the comparison proves the
    * bucketization neither loses nor duplicates a single pair.
    * Output is the banded distance histogram (8 d² bands) — bounded
    * rows at any corpus size.
    *
    * Scale shape: candidates are linear in Σ per-cell density² (flat
    * for hash-uniform points — the same argument as q198's per-key
    * range buckets); the join is a plain shuffled equi-join AQE can
    * re-plan; the 9× expansion touches only (id, x, y) tuples. */
  val q240 = QuerySpec("q240_spatial_join",
    (s, dir) => {
      val r2 = 8192L * 8192L
      val pts = Tables(s, dir, "documents")
        .select(col("doc_id").as("id"),
          expr(s"pmod(${h60("concat('px|', doc_id)")}, 1048576)").as("x"),
          expr(s"pmod(${h60("concat('py|', doc_id)")}, 1048576)").as("y"))
      val home = pts
        .withColumn("cx", expr("x div 8192"))
        .withColumn("cy", expr("y div 8192"))
      val expanded = home
        .select(col("id"), col("x"), col("y"),
          explode(expr("array(-1L, 0L, 1L)")).as("dx"), col("cx"), col("cy"))
        .select(col("id"), col("x"), col("y"),
          (col("cx") + col("dx")).as("cx"),
          explode(expr("array(-1L, 0L, 1L)")).as("dy"), col("cy"))
        .select(col("id"), col("x"), col("y"),
          col("cx"), (col("cy") + col("dy")).as("cy"))
      val pairs = expanded.as("a")
        .join(home.select(col("id").as("id_b"), col("x").as("xb"),
          col("y").as("yb"), col("cx"), col("cy")), Seq("cx", "cy"))
        .where(col("id") < col("id_b"))
        .withColumn("d2",
          (col("x") - col("xb")) * (col("x") - col("xb")) +
            (col("y") - col("yb")) * (col("y") - col("yb")))
        .where(col("d2") <= r2)
      pairs
        .groupBy(expr(s"(d2 * 8) div ${r2 + 1}").as("band"))
        .agg(count(lit(1)).as("n_pairs"), min("d2").as("min_d2"),
          max("d2").as("max_d2"))
        .orderBy("band")
    },
    Some(raw"""
WITH pts AS (
  SELECT doc_id AS id,
    ${sqlH60("concat('px|', doc_id)")} % 1048576 AS x,
    ${sqlH60("concat('py|', doc_id)")} % 1048576 AS y
  FROM documents
), pairs AS (
  SELECT (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM pts a JOIN pts b ON a.id < b.id
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
    <= 67108864
)
SELECT (d2 * 8) // 67108865 AS band,
  CAST(count(*) AS BIGINT) AS n_pairs,
  min(d2) AS min_d2, max(d2) AS max_d2
FROM pairs GROUP BY 1 ORDER BY band
"""))

  /** q245 — columnar-encoding advisor: for each candidate column,
    * the statistics a writer needs to pick its encoding (the
    * Parquet/ORC encoding-selection pass as a query): exact NDV,
    * adjacent-run count in storage order, and modeled sizes for
    * PLAIN (8 B/value), RLE (12 B/run), and DICTIONARY (8 B/entry +
    * ⌈log₂ ndv⌉ bits/value) — with the winner named. The subtle
    * part at scale is the RUN COUNT: adjacency is sequential, but
    * rather than a single-partition window the query counts
    * adjacent-equal pairs with a SELF-JOIN on `event_id + 1` — a
    * plain shuffled equi-join, linear and AQE-replannable; runs =
    * n − equal-adjacent-pairs (id gaps conservatively break runs —
    * exactly what a row-group boundary does). String columns reduce
    * to the engine-standard 60-bit hash surrogate (equality-faithful
    * for run/NDV purposes; both engines hash identically). Bit
    * widths via `length(bin(·))` — never a live log2. */
  val q245 = QuerySpec("q245_encoding_advisor",
    (s, dir) => {
      val ev = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "events")
          .select(col("event_id"),
            expr(h60("event_type")).as("c_event_type"),
            col("user_id").as("c_user_id"),
            expr("cast(round(value * 100) as bigint)").as("c_cents")))
      def advise(colName: String): org.apache.spark.sql.DataFrame = {
        val c = s"c_$colName"
        val base = ev.select(col("event_id"), col(c).as("v"))
        val adjEq = base.as("a").join(
            base.select((col("event_id") - 1).as("event_id"),
              col("v").as("v_next")).as("b"), Seq("event_id"))
          .where(col("v") === col("v_next"))
          .agg(count(lit(1)).as("eq_adj"))
        val stats = base.agg(count(lit(1)).as("n"),
          count_distinct(col("v")).as("ndv"))
        stats.crossJoin(broadcast(adjEq))
          .select(lit(colName).as("column_name"), col("n"), col("ndv"),
            (col("n") - col("eq_adj")).as("runs"))
          .withColumn("plain_bytes", expr("n * 8"))
          .withColumn("rle_bytes", expr("runs * 12"))
          .withColumn("dict_bytes", expr(
            "ndv * 8 + (n * (case when ndv <= 1 then 1 else " +
              "length(bin(ndv - 1)) end) + 7) div 8"))
          .withColumn("best", expr(
            "case when plain_bytes <= rle_bytes and " +
              "plain_bytes <= dict_bytes then 'plain' " +
              "when rle_bytes <= dict_bytes then 'rle' " +
              "else 'dict' end"))
      }
      advise("event_type")
        .unionByName(advise("user_id"))
        .unionByName(advise("cents"))
        .orderBy("column_name")
    },
    Some(raw"""
WITH ev AS (
  SELECT event_id,
    ${sqlH60("event_type")} AS c_event_type,
    user_id AS c_user_id,
    CAST(round(value * 100) AS BIGINT) AS c_cents
  FROM events
), cols AS (
  SELECT 'event_type' AS column_name, event_id, c_event_type AS v FROM ev
  UNION ALL
  SELECT 'user_id', event_id, c_user_id FROM ev
  UNION ALL
  SELECT 'cents', event_id, c_cents FROM ev
), adj AS (
  SELECT a.column_name, CAST(count(*) AS BIGINT) AS eq_adj
  FROM cols a JOIN cols b
    ON b.column_name = a.column_name AND b.event_id = a.event_id + 1
      AND b.v = a.v
  GROUP BY 1
), st AS (
  SELECT column_name, CAST(count(*) AS BIGINT) AS n,
    CAST(count(DISTINCT v) AS BIGINT) AS ndv
  FROM cols GROUP BY 1
), m AS (
  SELECT s.column_name, s.n, s.ndv,
    s.n - coalesce(a.eq_adj, 0) AS runs,
    s.n * 8 AS plain_bytes,
    (s.n - coalesce(a.eq_adj, 0)) * 12 AS rle_bytes,
    s.ndv * 8 + (s.n * (CASE WHEN s.ndv <= 1 THEN 1
      ELSE length(bin(s.ndv - 1)) END) + 7) // 8 AS dict_bytes
  FROM st s LEFT JOIN adj a ON s.column_name = a.column_name
)
SELECT column_name, n, ndv, runs,
  CAST(plain_bytes AS BIGINT) AS plain_bytes,
  CAST(rle_bytes AS BIGINT) AS rle_bytes,
  CAST(dict_bytes AS BIGINT) AS dict_bytes,
  CASE WHEN plain_bytes <= rle_bytes AND plain_bytes <= dict_bytes
    THEN 'plain'
    WHEN rle_bytes <= dict_bytes THEN 'rle' ELSE 'dict' END AS best
FROM m ORDER BY column_name
"""))

  /** One xy2d Hilbert level (side n = 256): given columns (x, y, acc)
    * and the level's bit s, emit the portable SQL projections for the
    * next (x, y, acc). Pure CASE/&/± arithmetic — Spark and DuckDB
    * evaluate the literally identical text (the quadrant value
    * (3·rx) XOR ry is enumerated as a CASE so no dialect-specific
    * XOR operator is needed). The classic Aho-free formulation:
    * d += s²·q, then flip (n−1 − ·) when rx=1 ∧ ry=0, swap when
    * ry=0. HilbertSpec proves bijection + unit-step adjacency over
    * the full 256×256 grid, so these expressions are pinned to the
    * real Hilbert curve, not merely engine-consistent. */
  private[graft] def hilbertLevel(s: Int): (String, String, String) = {
    val rx = s"(CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)"
    val quad = s"(CASE WHEN $rx = 1 AND $ry = 1 THEN 2 " +
      s"WHEN $rx = 1 THEN 3 WHEN $ry = 1 THEN 1 ELSE 0 END)"
    val nx = s"(CASE WHEN $ry = 0 THEN " +
      s"(CASE WHEN $rx = 1 THEN 255 - y ELSE y END) ELSE x END)"
    val ny = s"(CASE WHEN $ry = 0 THEN " +
      s"(CASE WHEN $rx = 1 THEN 255 - x ELSE x END) ELSE y END)"
    (nx, ny, s"acc + ${s * s} * $quad")
  }

  private[graft] val hilbertLevels = Seq(128, 64, 32, 16, 8, 4, 2, 1)

  /** q300 — Hilbert-curve layout audit, the q233 companion: on the
    * SAME events grid and the same fixed 1/16-width range probes,
    * does a Hilbert-ordered layout (256 zones of the 8-bit×8-bit
    * grid's Hilbert index) skip more zones than the Morton/Z-order
    * layout? Hilbert has strictly better locality than Morton (no
    * quadrant-boundary jumps), which shows up as tighter per-zone
    * [min,max] envelopes on both dimensions. The Hilbert index is
    * computed by the 8-level unrolled xy2d recurrence above — each
    * level is a named projection, so the expression tree stays
    * linear in levels (nesting the substitutions instead would
    * duplicate the (x,y) subtrees 2⁸-fold).
    *
    * Scale: one pass to 16-bit grid + 8 narrow codegen'd
    * projections per row, then a ≤256-row zone-stats aggregate per
    * layout — identical cost shape to q233. */
  val q300 = QuerySpec("q300_hilbert_layout",
    (s, dir) => {
      val ev = Tables(s, dir, "events")
        .select(col("user_id").as("u"),
          expr("cast(floor(cast(ts as long) / 86400) as bigint)").as("d"))
      val bounds = ev.agg(min("u").as("ulo"), max("u").as("uhi"),
        min("d").as("dlo"), max("d").as("dhi"))
      val grid0 = ev.crossJoin(broadcast(bounds))
        .withColumn("u8",
          expr("(((u - ulo) * 65535) div greatest(1, uhi - ulo)) div 256"))
        .withColumn("d8",
          expr("(((d - dlo) * 65535) div greatest(1, dhi - dlo)) div 256"))
        .select(col("u8"), col("d8"), col("u8").as("x"),
          col("d8").as("y"), lit(0L).as("acc"))
      val hilb = hilbertLevels.foldLeft(grid0) { (df, lv) =>
        val (nx, ny, nacc) = hilbertLevel(lv)
        df.selectExpr("u8", "d8", s"$nx as x", s"$ny as y",
          s"$nacc as acc")
      }
      val zS = spread("u8", sparkShl)
      val dS = spread("d8", sparkShl)
      def zoneStats(df: org.apache.spark.sql.DataFrame, zoneExpr: String,
          layout: String) = {
        val zones = df.groupBy(expr(zoneExpr).as("zone"))
          .agg(min("u8").as("umin"), max("u8").as("umax"),
            min("d8").as("dmin"), max("d8").as("dmax"))
        zones.agg(count(lit(1)).as("n_zones"),
          sum(when(col("umax") >= 120 && col("umin") <= 135, 1L)
            .otherwise(0L)).as("u_hit"),
          sum(when(col("dmax") >= 120 && col("dmin") <= 135, 1L)
            .otherwise(0L)).as("d_hit"))
          .select(lit(layout).as("layout"), col("n_zones"),
            col("u_hit"), col("d_hit"))
      }
      val base = graft.CacheRegistry.persistTracked(
        hilb.withColumn("z8", expr(s"$zS | shiftleft($dS, 1)")))
      zoneStats(base, "acc div 256", "hilbert")
        .unionByName(zoneStats(base, "z8 div 256", "zorder8"))
        .orderBy("layout")
    },
    Some {
      val levelCtes = hilbertLevels.zipWithIndex.map { case (lv, ix) =>
        val (nx, ny, nacc) = hilbertLevel(lv)
        s"""h${ix + 1} AS (
  SELECT u8, d8, $nx AS x, $ny AS y, $nacc AS acc
  FROM h$ix
)"""
      }.mkString(", ")
      raw"""
WITH ev AS (
  SELECT user_id AS u,
    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d
  FROM events
), bounds AS (
  SELECT min(u) AS ulo, max(u) AS uhi, min(d) AS dlo, max(d) AS dhi
  FROM ev
), h0 AS (
  SELECT u8, d8, u8 AS x, d8 AS y, CAST(0 AS BIGINT) AS acc FROM (
    SELECT (((u - ulo) * 65535) // greatest(1, uhi - ulo)) // 256 AS u8,
      (((d - dlo) * 65535) // greatest(1, dhi - dlo)) // 256 AS d8
    FROM ev CROSS JOIN bounds)
), $levelCtes, zh AS (
  SELECT acc // 256 AS zone, min(u8) AS umin, max(u8) AS umax,
    min(d8) AS dmin, max(d8) AS dmax
  FROM h8 GROUP BY 1
), zz AS (
  SELECT (${spread("u8", duckShl)} | (${spread("d8", duckShl)} << 1)) // 256
      AS zone,
    min(u8) AS umin, max(u8) AS umax, min(d8) AS dmin, max(d8) AS dmax
  FROM h8 GROUP BY 1
)
SELECT 'hilbert' AS layout, CAST(count(*) AS BIGINT) AS n_zones,
  CAST(sum(CASE WHEN umax >= 120 AND umin <= 135 THEN 1 ELSE 0 END) AS BIGINT) AS u_hit,
  CAST(sum(CASE WHEN dmax >= 120 AND dmin <= 135 THEN 1 ELSE 0 END) AS BIGINT) AS d_hit
FROM zh
UNION ALL
SELECT 'zorder8', CAST(count(*) AS BIGINT),
  CAST(sum(CASE WHEN umax >= 120 AND umin <= 135 THEN 1 ELSE 0 END) AS BIGINT),
  CAST(sum(CASE WHEN dmax >= 120 AND dmin <= 135 THEN 1 ELSE 0 END) AS BIGINT)
FROM zz
ORDER BY layout
"""
    })

  def all: Seq[QuerySpec] = Seq(q233, q234, q235, q240, q245, q300)
}
