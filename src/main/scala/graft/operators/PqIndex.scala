package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftvec.{CodebookRef, PqRef, VectorExpressions => VE}

/** IVF-PQ: the standard 100 TB vector-search layout. The coarse IVF
  * quantizer ([[IvfIndex]]) restricts WHICH rows a query scores; product
  * quantization compresses WHAT each row stores — `m` small codes
  * (bytes at ksub ≤ 256) instead of `dim` doubles, a 64× compression at
  * dim=64/m=8 — and scoring a candidate is `m` lookup-table reads
  * instead of a dim-length dot product.
  *
  * Classic residual construction: PQ encodes x − c_cell (residuals are
  * smaller than raw vectors, so ksub centroids spend their precision
  * where the coarse quantizer left error), and the query-side score
  * decomposes exactly:
  *
  *   q·x ≈ q·c_cell + q·r̂   (r̂ = PQ reconstruction of the residual)
  *
  * with `q·c_cell` computed EXACTLY from the coarse codebook
  * ([[org.apache.spark.sql.graftvec.CentroidDots]]) and `q·r̂` read from
  * the per-query ADC lookup table ([[org.apache.spark.sql.graftvec.PqLut]]
  * / [[org.apache.spark.sql.graftvec.PqAdc]]). Cosine ranking comes from
  * multiplying by the EXACT stored inverse norms — approximation lives
  * only in the PQ term.
  *
  * Scale shape: every codebook is in a broadcast variable (plans are
  * O(1) in k and m·ksub — the IvfIndex lesson); training touches the
  * corpus only for the coarse stage plus ONE residual pass, with the m
  * per-subspace k-means running over a hash-rank SAMPLE (PQ training is
  * sample-based in every production system — the sample bounds driver
  * and iteration cost independently of corpus size); the probe join
  * moves (cell, m codes, 1 norm) per corpus row — never raw vectors.
  */
object PqIndex {

  import Similarity.{invNorm, toDoubles}

  /** A trained index model: coarse centroids + per-subspace codebooks. */
  final case class Model(coarse: Seq[Array[Double]],
      books: Array[Array[Array[Double]]]) {
    def m: Int = books.length
    def ksub: Int = if (books.isEmpty) 0 else books(0).length
  }

  def broadcastPq(spark: SparkSession, books: Array[Array[Array[Double]]]): PqRef =
    new PqRef(spark.sparkContext.broadcast(books))

  /** Train coarse + PQ codebooks. `sampleN` bounds the residual sample
    * the m sub-quantizers train on (hash-rank selection — deterministic
    * and uniform whatever the id distribution, same trick as the
    * k-means seeding). */
  def train(corpus: DataFrame, kCoarse: Int, m: Int, ksub: Int,
      coarseIters: Int = 4, pqIters: Int = 4, sampleN: Int = 2000,
      idCol: String = "vec_id", embCol: String = "embedding"): Model = {
    val spark = corpus.sparkSession
    val (coarse, _) = IvfIndex.trainCodebook(corpus, kCoarse, coarseIters,
      idCol, embCol)
    val ref = IvfIndex.broadcastCodebook(spark, coarse)
    // one residual pass, sampled by hash-rank: the PQ training set
    val sample = corpus
      .select(col(idCol).as("id"), toDoubles(col(embCol)).as("emb"))
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(sampleN)
      .select(col("id"), VE.centroidResidual(col("emb"),
        IvfIndex.assignCell(col("emb"), ref), ref).as("res"))
    val cached = graft.CacheRegistry.persistTracked(sample)
    val dim = coarse.head.length
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val books = trainPqBooks(cached, m, dim / m, ksub, pqIters)
    ref.bc.destroy()
    Model(coarse, books)
  }

  /** Lloyd k-means for ALL m sub-quantizers at once: per iteration ONE
    * [[org.apache.spark.sql.graftvec.PqEncode]] pass assigns every
    * subspace's code and ONE aggregation collects the m·ksub·dsub
    * (j, code, dim) means — the per-subspace-sequential formulation
    * costs m× the jobs for identical results, and job-scheduling
    * overhead is exactly what training over a small sample is bound
    * by. Seeds are the residual slices of the ksub hash-rank rows
    * (deterministic; shared across subspaces). Empty cells keep their
    * previous centroid. */
  private def trainPqBooks(residuals: DataFrame, m: Int, dsub: Int,
      ksub: Int, iters: Int): Array[Array[Array[Double]]] = {
    val spark = residuals.sparkSession
    val seedRows = residuals
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(ksub).select("res").collect()
      .map(_.getSeq[Double](0).toArray)
    require(seedRows.length == ksub,
      s"PQ training needs >= ksub=$ksub sample vectors, got ${seedRows.length}")
    var books: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      seedRows.map(r => r.slice(j * dsub, (j + 1) * dsub))
    }
    (0 until iters).foreach { _ =>
      val ref = broadcastPq(spark, books)
      val agg = residuals
        .select(VE.pqEncode(col("res"), ref).as("codes"),
          posexplode(col("res")).as(Seq("pos", "x")))
        .select((col("pos") / dsub).cast("int").as("j"),
          (col("pos") % dsub).cast("int").as("i"), col("x"),
          element_at(col("codes"), (col("pos") / dsub).cast("int") + 1).as("c"))
        .groupBy("j", "c", "i")
        .agg(sum("x").as("sx"), count(lit(1)).as("cnt"))
        .collect()
      val next = books.map(_.map(_.clone()))
      agg.foreach { r =>
        val (j, c, i) = (r.getAs[Int]("j"), r.getAs[Int]("c"), r.getAs[Int]("i"))
        next(j)(c)(i) = r.getAs[Double]("sx") / r.getAs[Long]("cnt")
      }
      ref.bc.destroy()
      books = next
    }
    books
  }

  /** Encode the corpus into the index layout: (id, cell, codes,
    * inv_norm) — 4 + m·4 + 8 bytes of payload per vector instead of
    * dim·8. This is the frame a 100 TB deployment writes to parquet,
    * partitioned by cell. */
  def encode(corpus: DataFrame, model: Model,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val coarseRef = IvfIndex.broadcastCodebook(spark, model.coarse)
    val pqRef = broadcastPq(spark, model.books)
    corpus
      .select(col(idCol).as("nid"), toDoubles(col(embCol)).as("emb"),
        invNorm(col(embCol)).as("ni"))
      .withColumn("cell", IvfIndex.assignCell(col("emb"), coarseRef))
      .select(col("nid"), col("cell"),
        VE.pqEncode(VE.centroidResidual(col("emb"), col("cell"), coarseRef),
          pqRef).as("codes"),
        col("ni"))
  }

  /** IVF-PQ top-k: probe each query's `nProbe` nearest cells, score
    * candidates by the residual ADC decomposition, rank by approximate
    * cosine. `encoded` is the [[encode]] output (reusable across query
    * batches — the index). */
  def topK(encoded: DataFrame, queries: DataFrame, model: Model,
      k: Int, nProbe: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val spark = encoded.sparkSession
    val coarseRef = IvfIndex.broadcastCodebook(spark, model.coarse)
    val pqRef = broadcastPq(spark, model.books)
    val scores = IvfIndex.centroidScores(col("qemb"), coarseRef)
    val cellsByScore = transform(
      slice(array_sort(zip_with(scores,
        sequence(lit(0), size(scores) - 1),
        (s, i) => struct(s.as("s"), i.as("i")))), 1, nProbe),
      e => e.getField("i"))
    val q = queries
      .select(col(idCol).as("qid"), toDoubles(col(embCol)).as("qemb"),
        invNorm(col(embCol)).as("qi"))
      .withColumn("qdotc", VE.centroidDots(col("qemb"), coarseRef))
      .withColumn("lut", VE.pqLut(col("qemb"), pqRef))
      .select(col("qid"), col("qi"), col("qdotc"), col("lut"),
        explode(cellsByScore).as("cell"))
    val scored = encoded.join(broadcast(q), Seq("cell"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        // q·x ≈ q·c_cell (exact) + q·r̂ (ADC); cosine via exact norms
        ((element_at(col("qdotc"), col("cell") + 1) +
          VE.pqAdc(col("codes"), col("lut"))) *
          col("qi") * col("ni")).as("acos"))
    val w = Window.partitionBy("qid").orderBy(desc("acos"), asc("nid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("nid"), round(col("acos"), 6).as("acos"))
  }

  /** IVF-PQ with an exact REFINE stage — the standard production
    * topology (FAISS's refine / ScaNN's rescoring): the compressed
    * index ranks a shortlist of `shortlist ≫ k` candidates by ADC,
    * then ONLY those rows' raw vectors are fetched and re-scored
    * exactly. The expensive full-precision read touches
    * |queries|·shortlist rows — independent of corpus size — so the
    * 100 TB corpus is still only ever scanned through its (cell,
    * codes, norm) layout. Recall is bounded by the coarse probe, not
    * by PQ quantization error.
    */
  def topKRefined(encoded: DataFrame, corpus: DataFrame, queries: DataFrame,
      model: Model, k: Int, nProbe: Int, shortlist: Int = 0,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val sl = if (shortlist > 0) shortlist else 5 * k
    val cand = topK(encoded, queries, model, sl, nProbe, idCol, embCol)
      .select("qid", "nid")
    val c = corpus.select(col(idCol).as("nid"),
      toDoubles(col(embCol)).as("nemb"), invNorm(col(embCol)).as("ni"))
    val q = queries.select(col(idCol).as("qid"),
      toDoubles(col(embCol)).as("qemb"), invNorm(col(embCol)).as("qi"))
    import Similarity.dot
    val rescored = cand
      .join(c, Seq("nid"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("nid"),
        round(dot(col("qemb"), col("nemb")) * col("qi") * col("ni"), 6)
          .as("cos"))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("nid"))
    rescored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("nid"), col("cos"))
  }
}
