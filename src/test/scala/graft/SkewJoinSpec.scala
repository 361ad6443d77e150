package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.Dedup

/** The one 100 TB dedup claim a plain oracle can't test: a HOT LSH
  * bucket. Boilerplate-heavy corpora put thousands of near-identical
  * documents into the same MinHash band bucket, so the candidate
  * self-join concentrates one bucket's entire candidate square on one
  * reducer. The claimed mitigation is AQE skew-join splitting — this
  * spec plants the hot bucket and asserts the mitigation actually
  * fires in the physical plan, plus that results stay correct.
  */
class SkewJoinSpec extends SparkSpec {

  test("minhash candidate join skew-splits a planted hot LSH bucket") {
    val s = spark
    import s.implicits._
    // Boilerplate-heavy corpus (75% identical): every boilerplate doc
    // has the SAME minhash signature, so each of the 4 band buckets is
    // a hot key holding 600 rows while unique keys spread thin.
    // Sizing note: skew detection works on COMPRESSED shuffle-block
    // bytes, and a hot bucket's identical 32-char md5 values compress
    // far better than the unique buckets' high-entropy ones — the hot
    // fraction must dominate row counts for its partition to tower
    // over the median in bytes (at prod scale a hot bucket is GBs and
    // this subtlety vanishes; thresholds here are scaled to match).
    val boiler = "lorem ipsum boilerplate terms of service all rights " +
      "reserved please read carefully before proceeding any further"
    val nDocs = 800
    val docs = (0 until nDocs).map { i =>
      if (i % 4 < 3) (i.toLong, boiler)
      else (i.toLong, s"unique document $i " +
        (0 until 12).map(j => s"w${(i * 31 + j * 7) % 997}").mkString(" "))
    }.toDF("doc_id", "text")
    val nHot = (0 until nDocs).count(_ % 4 < 3).toLong

    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // force a sort-merge join (broadcast would dodge the shuffle this
      // spec exists to stress) and drop the skew thresholds into test
      // range — at production defaults the same rule fires at 256 MB
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // enough reducers that the uniform keys dilute across partitions
      // and the hot-bucket partitions tower over the median size
      conf.set("spark.sql.shuffle.partitions", "16")

      val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.5)
      // materialize THIS DataFrame's own QueryExecution (a .count()
      // would finalize a sibling plan and leave pairs' AQE un-run)
      val nPairs = pairs.collect().length.toLong

      // correctness under skew: all boilerplate docs pair up
      // (C(nHot,2) exact-duplicate pairs at jaccard 1.0)
      assert(nPairs >= nHot * (nHot - 1) / 2,
        s"expected >= ${nHot * (nHot - 1) / 2} boilerplate pairs, got $nPairs")

      // mitigation fired: the finalized adaptive plan marks the
      // candidate join's scan as skewed (AQEShuffleRead) and/or the
      // SMJ itself as skew=true
      val finalPlan = pairs.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      }.getOrElse(pairs.queryExecution.executedPlan.toString)
      assert(finalPlan.contains("skew=true") || finalPlan.contains("skewed"),
        s"no skew-split in final plan:\n$finalPlan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      CacheRegistry.releaseAll()
    }
  }
}
