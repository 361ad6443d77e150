package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) ANN index with a TRAINED k-means coarse
  * quantizer — the production path q73's grid quantizer stands in for.
  *
  * Scale design (the standard IVF shape at 100 TB):
  *  - the codebook is tiny (k × dim doubles) and lives on the driver /
  *    in broadcast literals — the corpus NEVER shuffles for training;
  *  - one Lloyd iteration = a narrow assign projection (argmin over k
  *    codegen'd dot products) + ONE aggregation shuffle of per-cell
  *    per-dimension sums (k × dim rows — constant, independent of
  *    corpus size) collected to the driver;
  *  - querying probes the `nProbe` nearest cells only: the probe is an
  *    equi-join on cell id against the small broadcast query side.
  *
  * Determinism: initial centroids are the ⌈n/k⌉-strided vectors by
  * ascending id (no RNG), ties in argmin resolve to the lowest cell
  * index, so training is bit-reproducible across runs and engines.
  */
object IvfIndex {

  import Similarity.{dot, toDoubles}

  /** Squared-norm driver-side helper. */
  private def norm2(v: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    s
  }

  /** Cell-assignment column: argmin_j ||x − c_j||² as 0-based cell id.
    * ||x||² is constant per row, so the argmin ranks
    * −2·x·c_j + ||c_j||² — one codegen'd DotProduct per centroid, no
    * per-element lambda work. First minimum wins (deterministic ties).
    */
  def assignCell(emb: Column, codebook: Seq[Array[Double]]): Column = {
    val scores = array(codebook.map { c =>
      lit(-2.0) * dot(toDoubles(emb), typedlit(c.toSeq)) + lit(norm2(c))
    }: _*)
    (array_position(scores, array_min(scores)) - 1).cast("int")
  }

  /** Train a k-means codebook with `iters` Lloyd iterations. Returns
    * (codebook, per-iteration within-cluster SSE) — the SSE sequence is
    * non-increasing, which the spec asserts. Empty cells keep their
    * previous centroid (standard practice). Only k × dim aggregates
    * ever reach the driver.
    */
  def trainCodebook(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding")
      : (Seq[Array[Double]], Seq[Double]) = {
    val spark = corpus.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val base = graft.CacheRegistry.persistTracked(
      corpus.repartition(par)
        .select(col(idCol).as("id"), toDoubles(col(embCol)).as("emb")))
    val n = base.count()
    val stride = math.max(1L, n / k)
    // strided deterministic init: every stride-th id, first k — a
    // narrow filter (no global window/sort over the corpus)
    var codebook: Seq[Array[Double]] = base
      .where(col("id") % stride === 0)
      .orderBy("id").limit(k)
      .collect()
      .map(_.getSeq[Double](1).toArray)
      .toSeq
    val sses = (0 until iters).map { _ =>
      val assigned = base.withColumn("cell", assignCell(col("emb"), codebook))
      // one tiny aggregation: per (cell, dim) sums + per-cell count/SSE
      val agg = assigned
        .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(sum("x").as("sx"), count(lit(1)).as("cnt"))
        .collect()
      val counts = agg.filter(_.getAs[Int]("pos") == 0)
        .map(r => r.getAs[Int]("cell") -> r.getAs[Long]("cnt")).toMap
      val next = codebook.zipWithIndex.map { case (old, j) =>
        counts.get(j) match {
          case Some(cnt) if cnt > 0 =>
            val c = old.clone()
            agg.filter(_.getAs[Int]("cell") == j).foreach { r =>
              c(r.getAs[Int]("pos")) = r.getAs[Double]("sx") / cnt
            }
            c
          case _ => old // empty cell: keep previous centroid
        }
      }
      // SSE under the NEW centroids' assignment basis (old assignment):
      // standard Lloyd monotonicity holds for assignment-then-update
      val sse = assigned.select(sum(
        dot(col("emb"), col("emb")) +
          elementAtScores(col("cell"), codebook)).as("sse"))
        .head().getDouble(0)
      codebook = next
      sse
    }
    (codebook, sses)
  }

  /** −2·x·c_cell + ||c_cell||² looked up by assigned cell (the
    * x-dependent remainder of the point's squared distance; each
    * un-defaulted `when` is null unless its cell matches, so the
    * coalesce picks exactly the assigned centroid's term). */
  private def elementAtScores(cell: Column, codebook: Seq[Array[Double]]): Column =
    coalesce(codebook.zipWithIndex.map { case (c, j) =>
      when(cell === j,
        lit(-2.0) * dot(col("emb"), typedlit(c.toSeq)) + lit(norm2(c)))
    }: _*)

  /** IVF top-k: corpus cells are assigned with the trained codebook;
    * each query probes its `nProbe` nearest cells. The probe is an
    * equi-join on cell against the broadcast exploded query side —
    * identical plan shape to q73, with a trained quantizer.
    */
  def topK(corpus: DataFrame, queries: DataFrame,
      codebook: Seq[Array[Double]], k: Int, nProbe: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    import Similarity.invNorm
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = corpus.repartition(par).select(col(idCol).as("nid"),
      toDoubles(col(embCol)).as("nemb"), invNorm(col(embCol)).as("ni"),
      assignCell(col(embCol), codebook).as("cell"))
    // query side: nProbe nearest cells via slice of the score-sorted ids
    val scores = array(codebook.map { cb =>
      lit(-2.0) * dot(toDoubles(col(embCol)), typedlit(cb.toSeq)) + lit(norm2(cb))
    }: _*)
    val cellsByScore = transform(
      slice(array_sort(zip_with(scores,
        sequence(lit(0), lit(codebook.size - 1)),
        (s, i) => struct(s.as("s"), i.as("i")))), 1, nProbe),
      e => e.getField("i"))
    val q = queries.select(col(idCol).as("qid"),
      toDoubles(col(embCol)).as("qemb"), invNorm(col(embCol)).as("qi"),
      explode(cellsByScore).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        round(dot(col("qemb"), col("nemb")) * col("qi") * col("ni"), 6).as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("nid"), col("cos"))
  }
}
