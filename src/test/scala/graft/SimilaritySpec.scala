package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identity 1, orthogonal 0, opposite -1, zero-norm null") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),
      (Seq(1.0, 1.0, 0.0), Seq(-1.0, -1.0, 0.0)),
      (Seq(0.0, 0.0, 0.0), Seq(1.0, 2.0, 3.0))
    ).toDF("a", "b").select(round(Similarity.cosine($"a", $"b"), 9).as("c"))
    assert(col1(df, "c") == Seq(1.0, 0.0, -1.0, null))
  }

  test("brute-force top-k ranks by cosine desc, excludes self") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(vecs, vecs.where($"vec_id" === 0), k = 3)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("nid")).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_.getAs[Long]("qid")).distinct.toSeq == Seq(0L))
  }

  test("hyperplanes are deterministic and bounded") {
    val h1 = Similarity.hyperplane(3, 64)
    val h2 = Similarity.hyperplane(3, 64)
    assert(h1 == h2 && h1.length == 64)
    assert(h1.forall(c => c >= -500 && c <= 500))
    assert(Similarity.hyperplane(4, 64) != h1)
  }

  test("LSH top-k results are a subset of brute-force candidates (same bucket ⇒ same ranking rule)") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.where($"vec_id" < 4)
    val brute = Similarity.bruteForceTopK(e, q, k = 500)
      .select("qid", "nid", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(e, q, k = 3, dim = 64).collect()
    // every LSH hit carries the exact same cosine the brute-force pass found
    lsh.foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      assert(brute.contains(key) && brute(key) == r.getAs[Double]("cos"))
    }
  }

  test("cellQuotaPrune: quota per cell, least-prototypical kept, total function") {
    try {
      val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      val got = Similarity.cellQuotaPrune(emb, k = 16, quota = 8)
      // total: one verdict per input vector
      assert(got.count() == emb.count())
      val rows = got.collect()
      // quota: at most 8 keepers per cell
      val keptPerCell = rows.filter(_.getAs[Boolean]("keep"))
        .groupBy(_.getAs[Long]("cell")).view.mapValues(_.length)
      assert(keptPerCell.values.forall(_ <= 8), s"quota violated: $keptPerCell")
      // diversity direction: within a cell, every kept cosine ≤ every
      // cut cosine (the prototypical near-centroid mass is what's cut)
      rows.groupBy(_.getAs[Long]("cell")).foreach { case (_, rs) =>
        val (kept, cut) = rs.partition(_.getAs[Boolean]("keep"))
        if (kept.nonEmpty && cut.nonEmpty)
          assert(kept.map(_.getAs[Double]("cos_centroid")).max <=
            cut.map(_.getAs[Double]("cos_centroid")).min)
      }
    } finally CacheRegistry.releaseAll()
  }
}
