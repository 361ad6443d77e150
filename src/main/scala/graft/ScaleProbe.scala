package graft

import org.apache.spark.sql.SparkSession

/** Dev scaling scratch (companion to [[Prof]]): time `semanticDedup`
  * at an explicit cell count, so the k-vs-N scaling contract is
  * measurable instead of argued — `k <= 0` selects the production
  * `Similarity.cellsFor` setting (k ∝ N, constant cell size), any
  * positive k pins the toy/oracle configuration.
  *
  *   SPARK_GRAFT_SF_DIR=data/sf10 runMain graft.ScaleProbe 0    # k ∝ N
  *   SPARK_GRAFT_SF_DIR=data/sf10 runMain graft.ScaleProbe 16   # fixed k
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val kArg = args.headOption.flatMap(_.toIntOption).getOrElse {
      if (args.nonEmpty) System.err.println(
        s"usage: ScaleProbe [k]  (non-numeric '${args.head}' ignored; using k ∝ N)")
      0
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables(spark, sfDir, "embeddings")
    val n = emb.count()
    val k = if (kArg > 0) kArg else graft.operators.Similarity.cellsFor(n)
    val t0 = System.nanoTime()
    graft.operators.Similarity.semanticDedup(emb, k = k, tau = 0.35)
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    CacheRegistry.releaseAll()
    println(f"SCALEPROBE sf=$sfDir n=$n k=$k $sec%.3f s")
    spark.stop()
  }
}
