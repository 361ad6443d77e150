package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity operators: exact cosine, brute-force top-k ANN
  * baseline, and a random-hyperplane LSH-bucketed variant.
  *
  * Scale design:
  *  - Cosine is a codegen'd higher-order-function fold over
  *    array<double> — no UDF, no shuffle. (A custom Catalyst Expression
  *    with doGenCode is the next step if bench demands; SURVEY.md §4.3.)
  *  - Brute force broadcasts the *query* set and streams the corpus:
  *    the classic exact baseline — one linear corpus scan per batch,
  *    embarrassingly parallel, no corpus shuffle. TakeOrdered per query
  *    via window rank.
  *  - LSH variant buckets both sides with deterministic hyperplanes
  *    (md5-seeded integer coefficients, reproducible in DuckDB), so the
  *    join touches only same-bucket candidates — the 1000× cheaper path
  *    at 100 TB, traded against recall.
  */
object Similarity {

  /** Element-wise cast to array<double> — all arithmetic in doubles so
    * the fold order (left-to-right) is identical across engines. */
  def toDoubles(c: Column): Column = transform(c, x => x.cast("double"))

  /** Dot product — the custom codegen'd Catalyst expression
    * (graft.functions.DotProduct); bit-identical to the HOF fold
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` it replaces. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftvec.VectorExpressions.dotProduct(a, b)

  /** Cosine similarity; null when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val na = sqrt(dot(a, a))
    val nb = sqrt(dot(b, b))
    when(na > 0 && nb > 0, dot(a, b) / (na * nb))
  }

  /** Inverse L2 norm (null if zero). Computed in the per-vector
    * projection BELOW any join, so pairwise cosine is a single dot
    * times two attribute lookups: norms cost O(n), not O(n²) pairs.
    * (Caution from profiling: expressions referenced inside HOF lambdas
    * get re-evaluated per element — never put a fold inside a lambda.)
    */
  def invNorm(c: Column): Column = {
    val d = toDoubles(c)
    when(dot(d, d) > 0, lit(1.0) / sqrt(dot(d, d)))
  }

  /** Deterministic LSH hyperplane coefficients: c(j,i) =
    * (first-8-hex(md5("j_i")) % 1001) − 500 ∈ [−500, 500]. Computed
    * driver-side once; the oracle recomputes the same md5 in SQL.
    */
  def hyperplane(j: Int, dim: Int): Seq[Double] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { i =>
      val hex = digest.digest(s"${j}_$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      ((java.lang.Long.parseLong(hex, 16) % 1001) - 500).toDouble
    }
  }

  /** Sign-pattern bucket id over a FIXED `nPlanes` hyperplanes (bit
    * j = sign of the projection onto plane j). Pure projection, no
    * shuffle.
    *
    * FIXED RESOLUTION IS A QUADRATIC TRAP for corpus-scaled blocking:
    * with the plane count pinned, bucket occupancy grows linearly
    * with the corpus and within-bucket candidate pairs quadratically
    * (q67 measured 59× work at 100× rows). This entry point exists
    * for (a) query-time probe paths whose candidate volume is bounded
    * per query ([[lshTopK]] and friends) and (b) the pinned q67
    * fixed-resolution control; NEAR-DUP BLOCKING MUST USE
    * [[lshBucketed]], the resolution-calibrated default — a registry
    * lint (RegistryLintSpec) flags any other query-side use. */
  def lshBucketFixed(emb: Column, dim: Int, nPlanes: Int = 8): Column =
    (0 until nPlanes).map { j =>
      val coefs = typedlit(hyperplane(j, dim))
      val proj = aggregate(zip_with(toDoubles(emb), coefs, (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Smallest plane count H with `2^H ≥ ceil(n / targetOccupancy)`,
    * floored at `minPlanes` — the resolution that holds EXPECTED
    * BUCKET OCCUPANCY ≈ targetOccupancy as the corpus grows, keeping
    * within-bucket pair work O(N·occupancy) instead of O(N²/2^H).
    * Integer arithmetic only (powers of two are exact in doubles), so
    * an oracle can mirror the calibration without float flap. */
  def calibratedPlanes(n: Long, targetOccupancy: Int = 32,
      minPlanes: Int = 6): Int = {
    require(targetOccupancy >= 1 && minPlanes >= 1 && n >= 0)
    val m = (n + targetOccupancy - 1) / targetOccupancy
    var h = 0
    while ((1L << h) < m) h += 1
    math.max(minPlanes, h)
  }

  /** Corpus row count from FILE METADATA only — no Spark action: walks
    * the frame's analyzed plan through cardinality-preserving nodes
    * (projections, aliases) to the parquet relation and sums the file
    * footers' row counts driver-side (the same footer stats q355's
    * aggregate pushdown reads). None when the plan reshapes
    * cardinality or the source is not a file relation — callers fall
    * back to an action, but the calibrated-LSH default never needs
    * one on a plain table scan. */
  def statsRowCount(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def rel(p: LogicalPlan): Option[HadoopFsRelation] = p match {
      case Project(_, child) => rel(child)
      case SubqueryAlias(_, child) => rel(child)
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation
            if h.fileFormat.toString.toLowerCase.contains("parquet") =>
          Some(h)
        case _ => None
      }
      case _ => None
    }
    rel(df.queryExecution.analyzed).flatMap { h =>
      try {
        val conf = df.sparkSession.sessionState.newHadoopConf()
        Some(h.location.inputFiles.map { f =>
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f), conf))
          try r.getRecordCount finally r.close()
        }.sum)
      } catch { case _: Exception => None }
    }
  }

  /** THE near-dup blocking default: RESOLUTION-CALIBRATED sign-bucket
    * LSH. The plane count comes from [[calibratedPlanes]] over the
    * corpus size, and the corpus size comes from parquet FOOTER STATS
    * at plan time ([[statsRowCount]]) — zero extra corpus action on a
    * table scan (the fallback `count()` runs only for exotic inputs).
    * Returns the bucketed frame and the chosen plane count so callers
    * can emit it as an oracle-checked column. q391 pins this path;
    * q67 keeps the fixed-resolution control it supersedes. */
  def lshBucketed(df: DataFrame, embCol: String, dim: Int,
      targetOccupancy: Int = 32, minPlanes: Int = 6,
      out: String = "bucket"): (DataFrame, Int) = {
    val n = statsRowCount(df).getOrElse(df.count())
    val planes = calibratedPlanes(n, targetOccupancy, minPlanes)
    (df.withColumn(out, lshBucketFixed(col(embCol), dim, planes)), planes)
  }

  /** Brute-force exact top-k cosine neighbors for each query vector.
    * `queries` must be small (it is broadcast); the corpus is only
    * scanned, never shuffled — the per-query rank runs on (qid, nid,
    * cos) triples.
    */
  /** Contrastive TRIPLET mining — for each anchor, its nearest
    * neighbor as the POSITIVE and the top-`kNeg` vectors inside a
    * mid-similarity band `[bandLo, bandHi)` as HARD NEGATIVES: random
    * negatives are trivially separable (cos ≈ 0) and teach an
    * embedding model nothing, near-dups are false negatives — the
    * band is where the training signal lives (the standard hard-
    * negative mining recipe for contrastive/embedding training data).
    *
    * Both ranks order on the ROUNDED cosine with an id tiebreak (the
    * q36 determinism contract) and the band filters the rounded value
    * too, so an oracle replays the exact triplet set. Scale shape:
    * identical to [[bruteForceTopK]] (anchors broadcast, corpus
    * streamed once, WindowGroupLimit prunes per-partition before the
    * rank exchange); at production corpus sizes compose the same
    * scoring with the IVF cell-probe shortlist instead of the full
    * scan, exactly as q84 does for retrieval. */
  def tripletMine(corpus: DataFrame, queries: DataFrame, kNeg: Int,
      bandLo: Double, bandHi: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = corpus.repartition(par)
      .select(col(idCol).as("nid"), toDoubles(col(embCol)).as("nemb"),
        invNorm(col(embCol)).as("ni"))
    val q = queries.select(col(idCol).as("qid"),
      toDoubles(col(embCol)).as("qemb"), invNorm(col(embCol)).as("qi"))
    val scored = graft.CacheRegistry.persistTracked(
      c.crossJoin(broadcast(q))
        .where(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          round(dot(col("qemb"), col("nemb")) * col("qi") * col("ni"), 6)
            .as("cos")))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    val pos = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") === 1)
      .select(col("qid"), lit("pos").as("kind"),
        col("rank").cast("long").as("rank"), col("nid"), col("cos"))
    val neg = scored
      .where(col("cos") >= bandLo && col("cos") < bandHi)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= kNeg)
      .select(col("qid"), lit("neg").as("kind"),
        col("rank").cast("long").as("rank"), col("nid"), col("cos"))
    pos.unionByName(neg)
  }

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = corpus.repartition(par)
      .select(col(idCol).as("nid"), toDoubles(col(embCol)).as("nemb"),
        invNorm(col(embCol)).as("ni"))
    val q = queries.select(col(idCol).as("qid"), toDoubles(col(embCol)).as("qemb"),
      invNorm(col(embCol)).as("qi"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(dot(col("qemb"), col("nemb")) * col("qi") * col("ni"), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("nid"), col("cos"))
  }

  /** LSH-bucketed approximate top-k: identical to [[bruteForceTopK]]
    * but candidates are restricted to the query's hyperplane bucket.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      nPlanes: Int = 8, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = corpus.repartition(par)
      .select(col(idCol).as("nid"),
        toDoubles(col(embCol)).as("nemb"), invNorm(col(embCol)).as("ni"),
        lshBucketFixed(col(embCol), dim, nPlanes).as("bucket"))
    val q = queries.select(col(idCol).as("qid"),
      toDoubles(col(embCol)).as("qemb"), invNorm(col(embCol)).as("qi"),
      lshBucketFixed(col(embCol), dim, nPlanes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(dot(col("qemb"), col("nemb")) * col("qi") * col("ni"), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("nid"), col("cos"))
  }

  /** Multi-probe bucket list for a query vector: its own sign bucket
    * first, then the buckets reached by flipping the `nProbe − 1`
    * weakest-margin hyperplanes (smallest |projection| — the planes
    * the vector most nearly straddles). Classic multi-probe LSH: recall
    * approaches brute force while each extra probe costs one more
    * bucket's candidates, not a corpus scan. Probes are distinct
    * buckets, so candidate sets stay disjoint — no dedup join needed.
    */
  def lshProbes(emb: Column, dim: Int, nPlanes: Int = 8,
      nProbe: Int = 3): Column = {
    val planes = (0 until nPlanes).map { j =>
      val coefs = typedlit(hyperplane(j, dim))
      val proj = aggregate(zip_with(toDoubles(emb), coefs, (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x)
      (proj, j)
    }
    val bucket = planes.map { case (p, j) =>
      when(p > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    // rank planes by margin; struct sorts by first field (|proj|)
    val ranked = array_sort(array(planes.map { case (p, j) =>
      struct(abs(p).as("m"), lit(1L << j).as("bit"))
    }: _*))
    concat(array(bucket),
      transform(slice(ranked, 1, nProbe - 1),
        e => bucket.bitwiseXOR(e.getField("bit"))))
  }

  /** Multi-probe variant of [[lshTopK]]: the corpus keeps one bucket
    * per vector; each query explodes its probe list and equi-joins.
    */
  def lshTopKMultiProbe(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int, nPlanes: Int = 8, nProbe: Int = 3,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = corpus.repartition(par)
      .select(col(idCol).as("nid"),
        toDoubles(col(embCol)).as("nemb"), invNorm(col(embCol)).as("ni"),
        lshBucketFixed(col(embCol), dim, nPlanes).as("bucket"))
    val q = queries.select(col(idCol).as("qid"),
      toDoubles(col(embCol)).as("qemb"), invNorm(col(embCol)).as("qi"),
      explode(lshProbes(col(embCol), dim, nPlanes, nProbe)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(dot(col("qemb"), col("nemb")) * col("qi") * col("ni"), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("nid"), col("cos"))
  }

  /** SemDeDup-style semantic deduplication: cluster the embedding
    * space with a k-cell coarse quantizer, score pairwise cosine ONLY
    * within each cell, and collapse the resulting near-dup pair graph
    * into keep-min-id clusters (via [[Dedup.connectedComponents]]).
    * Returns one row per input vector: (id, cell, keeper, keep).
    *
    * Scale shape (the SemDeDup paper's layout): the codebook is a
    * broadcast referenced by ONE expression node (plan is O(1) in k,
    * per the IVF design), cells are the blocking unit — at 100 TB k
    * grows into the thousands so each cell's candidate square stays
    * bounded — and only (id, cell) pairs and the sparse pair graph
    * ever shuffle. The codebook here is the deterministic hash-rank
    * seed set (`trainCodebook`'s iters=0 state) so the oracle can
    * replay it; production swaps in the Lloyd-trained book, same plan.
    */
  /** The production cell count for [[semanticDedup]] / IVF blocking:
    * k ∝ N so the average cell holds `targetCellSize` vectors and the
    * within-cell candidate square stays CONSTANT as the corpus grows —
    * with fixed k, cells grow linearly with N and the pairwise pass
    * grows quadratically (measured: the r6 sf10 probe — fixed k=16 at
    * 100× vectors ran 19× the 10× cost; k = n/125 restored linear,
    * see PLANS.md). The registry query pins k=16 only so the DuckDB
    * oracle's recursive CTE stays replayable at test scale. */
  def cellsFor(n: Long, targetCellSize: Int = 128): Int =
    math.max(1, (n / math.max(1, targetCellSize)).toInt)

  /** Production semantic dedup entry point: DELEGATES to
    * [[semanticDedupTwoLevel]] — k ∝ N cells (constant ~`targetCellSize`
    * rows per cell, so the within-cell pair square stays constant as
    * the corpus grows), O(√k) driver state, O(√k)-per-row assignment.
    * The one-level fixed-k variant this replaced
    * ([[semanticDedupPinned]]) let a caller run a k that does not
    * grow with N — at 100× the data its within-cell pairwise pass
    * measured 19× the 10× cost (see PLANS.md) — so it is no longer
    * publicly reachable; it survives only as the oracle-replay pin
    * behind a compile-time constant. */
  def semanticDedup(emb: DataFrame, tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding",
      targetCellSize: Int = 128): DataFrame =
    semanticDedupTwoLevel(emb, tau, idCol, embCol, targetCellSize)

  /** Cell count of the ORACLE-PINNED flat variant, fixed at compile
    * time: small enough that a DuckDB recursive-CTE oracle replays the
    * full seed set, and deliberately NOT a parameter — a caller-chosen
    * fixed k on a growing corpus is the quadratic scale trap the
    * production path exists to prevent. */
  private val OraclePinnedCells = 16

  /** Flat one-level SemDeDup — the ORACLE-REPLAY variant (q93), not a
    * production path: seeds are the [[OraclePinnedCells]] smallest
    * rows by (md5(id), id) (TakeOrdered — bounded 16-row collect),
    * every row scans all 16 broadcast centroids, and the within-cell
    * pair square grows quadratically in N because k is fixed. Pinned
    * so the q93 DuckDB oracle can replay the flat assignment rule
    * verbatim at test scale; `private[graft]` + constant k keep any
    * production caller on [[semanticDedup]]'s two-level path. */
  private[graft] def semanticDedupPinned(emb: DataFrame, tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val seeds = emb.orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(OraclePinnedCells).select(toDoubles(col(embCol)).as("emb"))
      .collect().map(_.getSeq[Double](0).toArray).toSeq
    val ref = IvfIndex.broadcastCodebook(spark, seeds)
    val base = graft.CacheRegistry.persistTracked(
      emb.repartition(par).select(col(idCol).as("id"),
        toDoubles(col(embCol)).as("u"), invNorm(col(embCol)).as("iv"),
        IvfIndex.assignCell(col(embCol), ref).as("cell")))
    val pairs = base.as("x").join(base.as("y"), Seq("cell"))
      .where(col("x.id") < col("y.id"))
      .where(round(dot(col("x.u"), col("y.u")) * col("x.iv") * col("y.iv"), 6)
        >= tau)
      .select(col("x.id").as("a"), col("y.id").as("b"))
    val clusters = Dedup.connectedComponents(pairs)
    base.select("id", "cell")
      .join(clusters, Seq("id"), "left")
      .select(col("id"), col("cell").cast("long").as("cell"),
        coalesce(col("cluster"), col("id")).as("keeper"))
      .withColumn("keep", col("id") === col("keeper"))
  }

  /** Lexicographic md5-prefix threshold selecting an EXPECTED `k` of
    * `n` rows: a row is a fine seed iff the first 8 hex chars of
    * md5(id) sort below this literal. Pure filter — no sort, no limit,
    * no driver collect — and replayable verbatim in the DuckDB oracle
    * (`substr(md5(...),1,8) < lpad(lower(to_hex((4294967296*k)//n)),8,'0')`). */
  def fineSeedThresholdHex(n: Long, k: Int): String =
    f"${(4294967296L * k) / math.max(n, 1L)}%08x"

  /** Shared two-level coarse→fine cell assignment (steps 1–4 of
    * [[semanticDedupTwoLevel]]'s doc). Returns:
    *  - `assigned`: one row per input vector (id, u, iv, cell) with
    *    `cell` = fine-seed ROW ID (coalesce-to-own-id fallback for
    *    float-degenerate empty coarse cells), NOT persisted — callers
    *    that reuse it (self-join, window) persist via CacheRegistry;
    *  - `fineSeeds`: one row per fine seed (cell, c, c2) — the fine
    *    CENTROID table (each fine cell's centroid IS its seed vector),
    *    ~k = n/targetCellSize rows, distributed (never collected).
    * The intermediate `base` projection IS persisted (both outputs
    * scan it) and registered with CacheRegistry for caller release. */
  private def twoLevelAssignment(emb: DataFrame, idCol: String,
      embCol: String, targetCellSize: Int): (DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val n = emb.count() // parquet-footer job over a narrow table
    val k = cellsFor(n, targetCellSize)
    val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
    val coarseRows = emb
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(k1)
      .select(col(idCol).cast("long").as("id"), toDoubles(col(embCol)).as("emb"))
      .collect()
    val coarseIds = coarseRows.map(_.getLong(0)).toSeq
    val ref = IvfIndex.broadcastCodebook(spark,
      coarseRows.map(_.getSeq[Double](1).toArray).toSeq)
    val base = graft.CacheRegistry.persistTracked(
      emb.repartition(par).select(col(idCol).as("id"),
        toDoubles(col(embCol)).as("u"), invNorm(col(embCol)).as("iv"),
        IvfIndex.assignCell(col(embCol), ref).as("ccell"),
        substring(md5(col(idCol).cast("string")), 1, 8).as("h8")))
    val thresh = fineSeedThresholdHex(n, k)
    val isSeed = col("h8") < lit(thresh) || col("id").isInCollection(coarseIds)
    val seedLists = base
      .where(isSeed)
      .select(col("ccell"), struct(col("id").as("sid"), col("u").as("se"),
        dot(col("u"), col("u")).as("se2")).as("seed"))
      .groupBy("ccell")
      .agg(sort_array(collect_list(col("seed"))).as("seeds"))
    val assigned = base.join(seedLists, Seq("ccell"), "left")
      .select(col("id"), col("u"), col("iv"),
        coalesce(
          org.apache.spark.sql.graftvec.VectorExpressions
            .nearestSeedId(col("u"), col("seeds")),
          col("id")).as("cell"))
    val fineSeeds = base.where(isSeed)
      .select(col("id").as("cell"), col("u").as("c"),
        dot(col("u"), col("u")).as("c2"))
    (assigned, fineSeeds)
  }

  /** Two-level (coarse→fine) semantic dedup — the extreme-scale shape
    * of [[semanticDedup]]. Same semantics (cells block a pairwise
    * cosine-≥ τ pass; pair graph collapses to keep-min-id clusters),
    * but cell assignment never materializes a k ∝ N codebook on the
    * driver and never scans all k centroids per row:
    *
    *  1. k = [[cellsFor]](n) fine cells (constant ~`targetCellSize`
    *     rows per cell); k₁ = ⌈√k⌉ COARSE seeds are the k₁ smallest
    *     rows by (md5(id), id) — planned as TakeOrdered (per-partition
    *     top-k₁ + driver merge, no global sort), so the driver holds
    *     O(√k) vectors, never k.
    *  2. Every row gets its coarse cell from the broadcast coarse
    *     codebook — O(N·√k) flops through the one-node
    *     [[org.apache.spark.sql.graftvec.CentroidScores]] expression.
    *  3. FINE seeds are hash-sampled in place: rows whose md5 prefix
    *     falls under [[fineSeedThresholdHex]] (expected k of them) ∪
    *     the coarse-seed rows. They stay DISTRIBUTED: grouped by
    *     coarse cell into sorted seed lists (~√k seeds ≈
    *     √k·dim·8 B ≲ 1–2 MB per coarse cell at 10⁹ rows) — the full
    *     fine codebook exists only spread across k₁ rows, never in one
    *     place.
    *  4. Rows join their coarse cell's seed list (k₁-row build side —
    *     broadcast at test scale, shuffle-on-ccell at extreme scale
    *     where each key carries ~N/√k rows) and one codegen'd
    *     [[org.apache.spark.sql.graftvec.NearestSeedId]] argmin picks
    *     the fine cell: O(N·√k) flops total, O(√k) per row.
    *
    * Every nonempty coarse cell contains its own coarse-seed row (its
    * argmin is itself, up to exact-duplicate ties that empty the cell
    * entirely), so the seed-list join is total; the left-join +
    * coalesce(id) fallback only guards float-degenerate duplicates —
    * a row it catches becomes a singleton cell, never data loss.
    *
    * Fine cells are labeled by SEED ROW ID (data-dependent k makes
    * index labels meaningless), deterministic end to end, and the
    * q112 oracle replays the full two-level rule — seeds, both
    * argmins (ties by ascending seed id), threshold arithmetic — in
    * recursive-CTE SQL. */
  def semanticDedupTwoLevel(emb: DataFrame, tau: Double,
      idCol: String = "vec_id", embCol: String = "embedding",
      targetCellSize: Int = 128): DataFrame = {
    val (rawAssigned, _) = twoLevelAssignment(emb, idCol, embCol, targetCellSize)
    val assigned = graft.CacheRegistry.persistTracked(rawAssigned)
    val pairs = assigned.as("x").join(assigned.as("y"), Seq("cell"))
      .where(col("x.id") < col("y.id"))
      .where(round(dot(col("x.u"), col("y.u")) * col("x.iv") * col("y.iv"), 6)
        >= tau)
      .select(col("x.id").as("a"), col("y.id").as("b"))
    val clusters = Dedup.connectedComponents(pairs)
    assigned.select("id", "cell")
      .join(clusters, Seq("id"), "left")
      .select(col("id"), col("cell").cast("long").as("cell"),
        coalesce(col("cluster"), col("id")).as("keeper"))
      .withColumn("keep", col("id") === col("keeper"))
  }

  /** Cluster-balanced diversity pruning (the D4 / SSL-prototypes
    * curation move): cap every semantic cell at `quota` vectors,
    * keeping the LEAST prototypical first — rows ranked by cosine to
    * their own cell centroid ASCENDING, so the redundant near-centroid
    * mass that over-represents dense regions is what gets cut.
    * Complements [[semanticDedup]]: that removes near-DUPLICATES;
    * this rebalances CONCENTRATION.
    *
    * Deterministic end to end: the same TWO-LEVEL coarse→fine seed
    * assignment as [[semanticDedupTwoLevel]] (so the oracle replays
    * cell assignment exactly, and the driver never holds a k ∝ N
    * codebook — only the O(√k) coarse seeds), centroid cosines rounded
    * to 6 before ranking, ties broken by id.
    *
    * Scale shape: assignment is O(N·√k) flops through the broadcast
    * coarse codebook + distributed per-coarse-cell seed lists; each
    * fine cell's centroid IS its seed vector, so centroids join back
    * as a k-row (n/targetCellSize) distributed table keyed by cell —
    * broadcast at test scale by AQE, shuffle-on-cell at extreme scale,
    * which is exactly the partitioning the rank window needs anyway.
    * Fallback rows (float-degenerate empty coarse cell → own-id
    * singleton cell) miss the centroid join and score their
    * self-cosine. Returns one row per vector:
    * (id, cell, cos_centroid, rk, keep).
    */
  def cellQuotaPrune(emb: DataFrame, quota: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      targetCellSize: Int = 128): DataFrame = {
    val (assigned, fineSeeds) =
      twoLevelAssignment(emb, idCol, embCol, targetCellSize)
    val w = Window.partitionBy("cell")
      .orderBy(asc("cos_centroid"), asc("id"))
    assigned.join(fineSeeds, Seq("cell"), "left")
      .withColumn("cos_centroid",
        when(col("c").isNull,
          round(dot(col("u"), col("u")) * col("iv") * col("iv"), 6))
        .otherwise(
          round(dot(col("u"), col("c")) * col("iv")
            * (lit(1.0) / sqrt(col("c2"))), 6)))
      .withColumn("rk", row_number().over(w).cast("long"))
      .select(col("id"), col("cell").cast("long").as("cell"),
        col("cos_centroid"), col("rk"), (col("rk") <= quota).as("keep"))
  }

  /** Embedding near-duplicate pairs within a blocking key (e.g. a
    * cluster/label or an LSH bucket): all-pairs inside each block only.
    */
  def nearDupPairs(df: DataFrame, blockCol: String, threshold: Double,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // materialized: self-joined below (see Dedup.minhashPairs note);
    // tracked so callers can release after materialization
    val base = graft.CacheRegistry.persistTracked(
      df.repartition(par)
        .select(col(blockCol).as("block"), col(idCol).as("id"),
          toDoubles(col(embCol)).as("emb"), invNorm(col(embCol)).as("inv")))
    base.as("x").join(base.as("y"), Seq("block"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        round(dot(col("x.emb"), col("y.emb")) * col("x.inv") * col("y.inv"), 6)
          .as("cos"))
      .where(col("cos") >= threshold)
  }
}
