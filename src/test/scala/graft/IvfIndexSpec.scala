package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, Similarity}

/** Trained-quantizer IVF ANN (the production counterpart of q73's
  * oracle-checked grid quantizer): k-means training must be
  * deterministic and monotone, and the probe must actually find
  * neighbors — recall is checked against the exact brute-force top-k,
  * the same way a real ANN index is accepted.
  */
class IvfIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def emb = Tables(spark, dir, "embeddings")

  test("k-means training is deterministic and Lloyd-monotone") {
    val (cb1, sse1) = IvfIndex.trainCodebook(emb, k = 12, iters = 4)
    val (cb2, _) = IvfIndex.trainCodebook(emb, k = 12, iters = 4)
    try {
      assert(cb1.size == 12 && cb1.head.length == 64)
      // bit-identical across runs: no RNG anywhere in training
      assert(cb1.zip(cb2).forall { case (a, b) => a.sameElements(b) })
      // within-cluster SSE never increases across Lloyd iterations
      assert(sse1.zip(sse1.tail).forall { case (a, b) => b <= a + 1e-9 },
        s"SSE not monotone: $sse1")
      // training actually moved the centroids off their seeds
      assert(sse1.last < sse1.head)
    } finally CacheRegistry.releaseAll()
  }

  test("k=256: codebook stays out of the plan; recall holds") {
    // sf0.1 has 2000 vectors — enough for a 256-cell codebook (~8/cell)
    val big = Tables(spark, "/root/testdata/sf0.1", "embeddings")
    val queries = big.where(col("vec_id") < 50)
    try {
      val (cb256, sse) = IvfIndex.trainCodebook(big, k = 256, iters = 2)
      assert(cb256.size == 256)
      assert(sse.zip(sse.tail).forall { case (a, b) => b <= a + 1e-9 })
      // plan size must be O(1) in k: the broadcast-var CentroidScores
      // expression replaces r2's k-wide literal arrays, which made the
      // plan string (and janino input) grow linearly with k
      val (cb16, _) = IvfIndex.trainCodebook(big, k = 16, iters = 1)
      def planLen(cb: Seq[Array[Double]]) =
        IvfIndex.topK(big, queries, cb, k = 10, nProbe = 4)
          .queryExecution.executedPlan.toString.length
      val (p16, p256) = (planLen(cb16), planLen(cb256))
      assert(math.abs(p256 - p16) < 500,
        s"plan grows with k: len(k=16)=$p16 len(k=256)=$p256")
      // and a plan embedding the 256×64 codebook as literals would be
      // ≥ 256·64 ≈ 16k numbers long — this one must stay far under that
      assert(p256 < 100000, s"plan suspiciously large: $p256")
      // recall at production-shaped k: probe 32 of 256 cells (12.5%)
      val exact = Similarity.bruteForceTopK(big, queries, k = 10)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = IvfIndex.topK(big, queries, cb256, k = 10, nProbe = 32)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact intersect approx).size.toDouble / exact.size
      info(s"k=256 nProbe=32 recall@10 = $recall")
      assert(recall >= 0.65, s"recall@10 = $recall (expected >= 0.65)")
    } finally CacheRegistry.releaseAll()
  }

  test("IVF probe recall vs exact brute-force top-10") {
    val queries = emb.where(col("vec_id") < 50)
    val nCorpus = emb.count()
    val nQueries = queries.count()
    val (codebook, _) = IvfIndex.trainCodebook(emb, k = 10, iters = 4)
    try {
      val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = IvfIndex.topK(emb, queries, codebook, k = 10, nProbe = 4)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact intersect approx).size.toDouble / exact.size
      // training is RNG-free (hash-rank seeding), so this recall is a
      // deterministic value; the floor leaves margin for float jitter
      // only. Calibration note: the TRUE generator-label centroids
      // reach just 0.622 here — neighbors genuinely straddle cluster
      // boundaries in this data, so ~0.7 at nProbe=4/k=10 is the
      // honest operating point, not a weak index.
      assert(recall >= 0.65, s"recall@10 = $recall (expected >= 0.65)")
      // and the probe must stay a fraction of the corpus: nProbe=4 of
      // k=10 cells scans well under the full candidate square
      val probed = IvfIndex.topK(emb, queries, codebook, k = Int.MaxValue,
        nProbe = 4).count().toDouble
      val fraction = probed / (nQueries * (nCorpus - 1)).toDouble
      assert(fraction <= 0.6, s"probe scanned fraction $fraction")
      assert(recall > fraction,
        s"index no better than random scan: recall=$recall fraction=$fraction")
    } finally CacheRegistry.releaseAll()
  }
}
