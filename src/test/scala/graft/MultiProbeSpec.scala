package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Multi-probe LSH acceptance. A single sign-LSH table has low
  * absolute recall on diffuse data (each extra hyperplane halves the
  * bucket, and neighbors straddle planes) — the multi-probe claim is
  * the recall/cost KNOB: probing the weakest-margin flipped buckets
  * must raise recall monotonically and substantially, at one extra
  * bucket's candidates per probe. Measured against exact brute force;
  * deterministic (md5-seeded planes, no RNG). The high-recall path at
  * fixed cost is the trained IVF index (IvfIndexSpec, 0.698).
  */
class MultiProbeSpec extends SparkSpec {

  test("multi-probe recall rises monotonically and ~3x over single-probe") {
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
    val queries = emb.where(col("vec_id") < 50)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = pairs(Similarity.bruteForceTopK(emb, queries, k = 5))
    def recallAt(nProbe: Int): Double = {
      val got = pairs(Similarity.lshTopKMultiProbe(emb, queries, k = 5,
        dim = 64, nPlanes = 4, nProbe = nProbe))
      (exact intersect got).size.toDouble / exact.size
    }
    val r1 = recallAt(1) // == the single-bucket q37 plan at 4 planes
    val r2 = recallAt(2)
    val r4 = recallAt(4)
    assert(r1 < r2 && r2 < r4, s"recall not monotone: $r1, $r2, $r4")
    assert(r4 >= 2.5 * r1, s"4-probe recall $r4 < 2.5x single-probe $r1")
    assert(r4 >= 0.35, s"4-probe recall $r4 below floor")
  }
}
