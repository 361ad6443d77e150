package graft.queries

import org.apache.spark.sql.functions._
import graft.{QuerySpec, Tables}

/** Round-14 graph tier addition: multi-source BFS shortest-hop labels
  * over the co-purchase graph — the "how far is everything from the
  * hubs" reachability diagnostic that complements q89's connected
  * components (global partition), q161's PageRank (stationary mass),
  * and q191's triangle census (local clustering).
  */
object GraphQueries {

  /** q255 — multi-source BFS hop histogram: parts that co-occur in at
    * least 2 orders form an undirected graph; the 3 highest-degree
    * parts seed a breadth-first search; output is the exact hop
    * histogram (min hops from any seed, 0–4) plus the unreached count
    * as hop = −1 — the reachability profile a graph-feature pipeline
    * computes before trusting hub-distance features.
    *
    * Scale shape: the O(diameter) iterative min-label pattern q89's
    * connected components established — each round is one
    * frontier⋈edges equi-join plus a distinct and an anti-join
    * against the visited set (all map-side-combining shuffles on the
    * node key; no windows, no driver state beyond the 3-row seed
    * take). Rounds are bounded by the hop cap (4), so the plan is 4
    * joins regardless of corpus size. Seeds come from TakeOrdered
    * (top-3 by degree, partkey tiebreak) — never a global sort. The
    * oracle replays the exact search as a recursive CTE with
    * UNION-distinct termination. Edge support ≥ 2 bounds the edge
    * frame the same way q229's support floor bounds its pair frame. */
  val q255 = QuerySpec("q255_bfs_hops",
    (s, dir) => {
      // persist both the basket frame (scanned by both self-join
      // sides) and the directed pair frame (consumed by both union
      // branches) — without these the heavy pair expansion recomputes
      // up to 8× (measured 63 s → ~5 s at sf0.1)
      val baskets = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "lineitem")
          .select(col("l_orderkey").as("oid"), col("l_partkey").as("part"))
          .distinct())
      val e0 = graft.CacheRegistry.persistTracked(
        baskets.as("x").join(baskets.as("y"), Seq("oid"))
          .where(col("x.part") < col("y.part"))
          .groupBy(col("x.part").as("a"), col("y.part").as("b"))
          .agg(count(lit(1)).as("c"))
          .where(col("c") >= 2L)
          .select("a", "b"))
      val edges = graft.CacheRegistry.persistTracked(
        e0.unionByName(e0.select(col("b").as("a"), col("a").as("b"))))
      val deg = graft.CacheRegistry.persistTracked(
        edges.groupBy(col("a").as("part")).agg(count(lit(1)).as("d")))
      val seeds = deg.orderBy(desc("d"), asc("part")).limit(3)
        .select("part")
      // iterative rounds use EAGER localCheckpoint, not persist — the
      // CC lesson (operators/Dedup.scala): with lazy persists, round
      // k's anti-join plan nests every previous round's plan and
      // (re)planning grows super-linearly with rounds — measured here
      // as a 264 s wall on a 3,573-edge graph at sf0.1; checkpointed
      // rounds truncate the lineage to the materialized RDD and the
      // same graph runs in seconds. Blocks are handed to
      // CacheRegistry for release with the query's other caches.
      var labels = graft.CacheRegistry.trackCheckpoint(
        seeds.withColumn("hop", lit(0L)).localCheckpoint(true))
      var frontier = labels.select("part")
      for (k <- 1 to 4) {
        val fresh = graft.CacheRegistry.trackCheckpoint(
          frontier.as("f")
            .join(edges.as("e"), col("f.part") === col("e.a"))
            .select(col("e.b").as("part")).distinct()
            .join(labels.select("part"), Seq("part"), "left_anti")
            .withColumn("hop", lit(k.toLong))
            .localCheckpoint(true))
        // the visited set stays a LAZY union of the checkpointed level
        // frames: each level is already a materialized leaf, so the
        // union plan is 4 leaves deep at most — the per-round EAGER
        // union checkpoint this replaces paid one extra job per round
        // for no lineage benefit (r21; the exponential-nesting hazard
        // only exists when rounds nest un-materialized plans)
        labels = labels.unionByName(fresh)
        frontier = fresh.select("part")
      }
      val hist = labels.groupBy("hop").agg(count(lit(1)).as("n_parts"))
      val unreached = deg
        .join(labels.select("part"), Seq("part"), "left_anti")
        .agg(count(lit(1)).as("n_parts"))
        .select(lit(-1L).as("hop"), col("n_parts"))
      hist.unionByName(unreached).orderBy("hop")
    },
    Some(raw"""
WITH RECURSIVE baskets AS (
  SELECT DISTINCT l_orderkey AS oid, l_partkey AS part FROM lineitem
), edges0 AS (
  SELECT x.part AS a, y.part AS b FROM baskets x JOIN baskets y
  USING (oid) WHERE x.part < y.part GROUP BY 1, 2
  HAVING count(*) >= 2
), edges AS (
  SELECT a, b FROM edges0 UNION ALL SELECT b, a FROM edges0
), deg AS (
  SELECT a AS part, count(*) AS d FROM edges GROUP BY 1
), seeds AS (
  SELECT part FROM deg ORDER BY d DESC, part LIMIT 3
), bfs(node, hop) AS (
  SELECT part, 0 FROM seeds
  UNION
  SELECT e.b, bfs.hop + 1 FROM bfs JOIN edges e ON bfs.node = e.a
  WHERE bfs.hop < 4
), lab AS (
  SELECT node, CAST(min(hop) AS BIGINT) AS hop FROM bfs GROUP BY 1
)
SELECT hop, CAST(count(*) AS BIGINT) AS n_parts FROM lab GROUP BY 1
UNION ALL
SELECT -1, CAST(count(*) AS BIGINT) FROM deg
WHERE part NOT IN (SELECT node FROM lab)
ORDER BY hop
"""))

  /** Shared co-purchase edge-frame SQL (q255's construction):
    * undirected support-≥2 part pairs. */
  private val edgeSql = raw"""baskets AS (
  SELECT DISTINCT l_orderkey AS oid, l_partkey AS part FROM lineitem
), edges0 AS (
  SELECT x.part AS a, y.part AS b FROM baskets x JOIN baskets y
  USING (oid) WHERE x.part < y.part GROUP BY 1, 2
  HAVING count(*) >= 2
), edges AS (
  SELECT a, b FROM edges0 UNION ALL SELECT b, a FROM edges0
)"""

  private val kcoreRounds = 6
  private val kcoreK = 3

  private val kcoreSql: String = {
    val sb = new StringBuilder
    sb ++= s"WITH $edgeSql, alive0 AS (SELECT DISTINCT a AS v FROM edges)"
    for (r <- 1 to kcoreRounds) sb ++= s""",
deg$r AS (
  SELECT e.a AS v, count(*) AS d FROM edges e
  JOIN alive${r - 1} x ON e.a = x.v JOIN alive${r - 1} y ON e.b = y.v
  GROUP BY 1
), alive$r AS (SELECT v FROM deg$r WHERE d >= $kcoreK)"""
    sb ++= (1 to kcoreRounds).map(r => s"""
SELECT CAST($r AS BIGINT) AS round,
  CAST((SELECT count(*) FROM alive${r - 1})
    - (SELECT count(*) FROM alive$r) AS BIGINT) AS n_removed,
  CAST((SELECT count(*) FROM alive$r) AS BIGINT) AS n_remaining""")
      .mkString("", "\nUNION ALL", "")
    sb ++= "\nORDER BY round"
    sb.toString
  }

  /** q299 — k-core peeling toward the 3-core of the co-purchase
    * graph: each round drops every vertex whose degree among
    * SURVIVING vertices is < 3, and reports (round, n_removed,
    * n_remaining) for a fixed 6-round schedule — the standard graph
    * densification / spam-filtering primitive (a vertex's coreness
    * certifies it sits in a subgraph of min-degree k, which PageRank
    * and degree alone both miss). The round count is a FIXED constant
    * on both sides, so the output is well-defined whether or not the
    * peel has converged — no fixpoint detection crosses the engine
    * boundary (convergence shows up in the data as n_removed = 0
    * tail rows).
    *
    * Scale: each round is one edges⋈alive⋈alive equi-join plus a
    * map-side-combining degree count — O(rounds · |E|) total, the
    * q89/q255 iterative-join shape. Each round's survivor set is
    * EAGERLY localCheckpointed (the q255 lesson: lazy persists nest
    * every prior round's plan and re-planning grows super-linearly
    * with rounds). */
  val q299 = QuerySpec("q299_kcore_peel",
    (s, dir) => {
      import s.implicits._
      val baskets = graft.CacheRegistry.persistTracked(
        Tables(s, dir, "lineitem")
          .select(col("l_orderkey").as("oid"), col("l_partkey").as("part"))
          .distinct())
      val e0 = baskets.as("x").join(baskets.as("y"), Seq("oid"))
        .where(col("x.part") < col("y.part"))
        .groupBy(col("x.part").as("a"), col("y.part").as("b"))
        .agg(count(lit(1)).as("c"))
        .where(col("c") >= 2L)
        .select("a", "b")
      val edges = graft.CacheRegistry.persistTracked(
        e0.unionByName(e0.select(col("b").as("a"), col("a").as("b"))))
      // per-round survivor COUNT observed during the eager checkpoint
      // itself (CollectMetricsExec accumulator — the CC idiom): one
      // job per round instead of checkpoint + count, halving the
      // round-loop's job count (r21; guide §1.2 remove passes).
      // Checkpoint blocks are tracked so the caller's releaseAll frees
      // them — the returned frame is driver-side stats and references
      // none of them.
      def observedCheckpoint(df: org.apache.spark.sql.DataFrame)
          : (org.apache.spark.sql.DataFrame, Long) = {
        val obs = new org.apache.spark.sql.Observation()
        val ck = graft.CacheRegistry.trackCheckpoint(
          df.observe(obs, count(lit(1)).as("n")).localCheckpoint(true))
        val n = obs.get("n") match {
          case l: java.lang.Long => l.longValue
          case _ => 0L
        }
        (ck, n)
      }
      var (alive, aliveN) =
        observedCheckpoint(edges.select(col("a").as("v")).distinct())
      val stats = Seq.newBuilder[(Long, Long, Long)]
      for (r <- 1 to kcoreRounds) {
        val deg = edges
          .join(alive.select(col("v").as("a")), "a")
          .join(alive.select(col("v").as("b")), "b")
          .groupBy("a").agg(count(lit(1)).as("d"))
        val (next, nextN) = observedCheckpoint(
          deg.where(col("d") >= kcoreK.toLong).select(col("a").as("v")))
        stats += ((r.toLong, aliveN - nextN, nextN))
        alive = next
        aliveN = nextN
      }
      stats.result().toDF("round", "n_removed", "n_remaining")
        .orderBy("round")
    },
    Some(kcoreSql))

  def all: Seq[QuerySpec] = Seq(q255, q299)
}
