package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftvec.{CodebookRef, VectorExpressions}

/** IVF (inverted-file) ANN index with a TRAINED k-means coarse
  * quantizer — the production path q73's grid quantizer stands in for.
  *
  * Scale design (the standard IVF shape at 100 TB):
  *  - the codebook is tiny (k × dim doubles) and lives in a Spark
  *    broadcast variable, referenced by ONE codegen'd expression node
  *    ([[org.apache.spark.sql.graftvec.CentroidScores]]) — the plan is
  *    O(1) in k, so production k (1k–64k cells) compiles and ships to
  *    executors once, and the corpus NEVER shuffles for training;
  *  - one Lloyd iteration = a narrow assign projection (argmin over the
  *    k-score array) + ONE aggregation shuffle of per-cell
  *    per-dimension sums (k × dim rows — constant, independent of
  *    corpus size) collected to the driver;
  *  - querying probes the `nProbe` nearest cells only: the probe is an
  *    equi-join on cell id against the small broadcast query side.
  *
  * Determinism: initial centroids are the k vectors with the smallest
  * (md5(id), id) — a deterministic uniform pseudo-sample planned as
  * TakeOrdered (per-partition top-k + driver merge; no global sort,
  * and no assumption that ids are dense/0-based). Ties in argmin
  * resolve to the lowest cell index, so training is bit-reproducible
  * across runs and engines.
  */
object IvfIndex {

  import Similarity.{dot, toDoubles}

  /** Ship a driver-side codebook to executors once (Torrent broadcast).
    * The returned handle is what score expressions reference — centroid
    * values never enter the expression tree. */
  def broadcastCodebook(spark: SparkSession,
      codebook: Seq[Array[Double]]): CodebookRef =
    new CodebookRef(spark.sparkContext.broadcast(codebook.toArray))

  /** Array of k scores, score_j = −2·x·c_j + ‖c_j‖² — argmin over it is
    * the nearest centroid (‖x‖² is constant per row). One expression
    * node regardless of k. */
  def centroidScores(emb: Column, ref: CodebookRef): Column =
    VectorExpressions.centroidScores(toDoubles(emb), ref)

  /** Cell-assignment column: argmin_j ‖x − c_j‖² as 0-based cell id.
    * First minimum wins (deterministic ties). */
  def assignCell(emb: Column, ref: CodebookRef): Column =
    cellOf(centroidScores(emb, ref))

  private def cellOf(scores: Column): Column =
    (array_position(scores, array_min(scores)) - 1).cast("int")

  /** Train a k-means codebook with `iters` Lloyd iterations. Returns
    * (codebook, per-iteration within-cluster SSE) — the SSE sequence is
    * non-increasing, which the spec asserts. Empty cells keep their
    * previous centroid (standard practice). Only k × dim aggregates
    * ever reach the driver; each iteration's codebook broadcast is
    * destroyed once its jobs complete.
    */
  def trainCodebook(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", embCol: String = "embedding")
      : (Seq[Array[Double]], Seq[Double]) = {
    val spark = corpus.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val base = graft.CacheRegistry.persistTracked(
      corpus.repartition(par)
        .select(col(idCol).as("id"), toDoubles(col(embCol)).as("emb")))
    // hash-rank seeding: k smallest by (md5(id), id) — uniform over the
    // corpus whatever the id distribution (sparse, offset, all-odd…),
    // planned as TakeOrderedAndProject, not a full sort shuffle
    var codebook: Seq[Array[Double]] = base
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(k)
      .select("emb")
      .collect()
      .map(_.getSeq[Double](0).toArray)
      .toSeq
    require(codebook.size == k,
      s"k-means needs >= k=$k training vectors, corpus has ${codebook.size}")
    val sses = (0 until iters).map { _ =>
      val ref = broadcastCodebook(spark, codebook)
      val scores = centroidScores(col("emb"), ref)
      // codegen CSE evaluates the score array once per row here
      val assigned = base.select(col("emb"), cellOf(scores).as("cell"),
        array_min(scores).as("minscore"))
      // one tiny aggregation: per (cell, dim) sums + per-cell count
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
      // SSE under the OLD centroids' assignment (minscore is the
      // assigned cell's score): standard Lloyd monotonicity basis
      val sse = assigned
        .select(sum(dot(col("emb"), col("emb")) + col("minscore")).as("sse"))
        .head().getDouble(0)
      ref.bc.destroy() // this iteration's jobs are complete
      codebook = next
      sse
    }
    (codebook, sses)
  }

  /** IVF top-k: corpus cells are assigned with the trained codebook;
    * each query probes its `nProbe` nearest cells. The probe is an
    * equi-join on cell against the broadcast exploded query side —
    * identical plan shape to q73, with a trained quantizer. The
    * codebook broadcast outlives the returned (lazy) plan.
    */
  def topK(corpus: DataFrame, queries: DataFrame,
      codebook: Seq[Array[Double]], k: Int, nProbe: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    import Similarity.invNorm
    val spark = corpus.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val ref = broadcastCodebook(spark, codebook)
    val c = corpus.repartition(par).select(col(idCol).as("nid"),
      toDoubles(col(embCol)).as("nemb"), invNorm(col(embCol)).as("ni"),
      assignCell(col(embCol), ref).as("cell"))
    // query side: nProbe nearest cells via slice of the score-sorted
    // ids. sequence bound is size(scores) — NOT a foldable k-literal —
    // so the plan stays k-free end to end.
    val scores = centroidScores(col(embCol), ref)
    val cellsByScore = transform(
      slice(array_sort(zip_with(scores,
        sequence(lit(0), size(scores) - 1),
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
