package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** [[graft.sources.KeyedShardSource]]: correct rows from the
  * partitionBy layout (multi-file keys chained, URL-escaped key
  * values decoded), the reported KeyGroupedPartitioning eliminating
  * the aggregate exchange under v2 bucketing (and NOT without it),
  * and the strict non-keyed-layout guard. */
class KeyedShardSourceSpec extends SparkSpec {

  private def hasShuffle(p: SparkPlan): Boolean = p match {
    case _: ShuffleExchangeLike => true
    case qs: QueryStageExec => hasShuffle(qs.plan)
    case _ => p.children.exists(hasShuffle)
  }

  private def executedHasShuffle(df: DataFrame): Boolean = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => hasShuffle(a.executedPlan)
      case p => hasShuffle(p)
    }
  }

  private def stage(): java.nio.file.Path = {
    val tmp = Files.createTempDirectory("graft_keyed_spec")
    import spark.implicits._
    // keys include a URL-escaped character (space); two staging
    // partitions force multiple files per key
    Seq(("hot key", 1L), ("hot key", 2L), ("cold", 10L),
      ("hot key", 3L), ("cold", 20L), ("warm", 7L))
      .toDF("g", "x").repartition(2)
      .write.mode("overwrite").partitionBy("g").csv(tmp.toString)
    tmp
  }

  test("serves all rows; multi-file keys chain into one partition") {
    val tmp = stage()
    try {
      val df = spark.read.format("graft-shard-keyed")
        .option("path", tmp.toString).load()
      val got = rows(df.orderBy("g", "x"))
        .map(r => (r.getString(0), r.getLong(1)))
      assert(got == Seq(("cold", 10L), ("cold", 20L), ("hot key", 1L),
        ("hot key", 2L), ("hot key", 3L), ("warm", 7L)))
      // one input partition per key, regardless of file count
      assert(df.rdd.getNumPartitions == 3)
    } finally graft.streaming.StreamingResidue.deleteRecursively(tmp)
  }

  test("reported partitioning removes the group-by exchange iff " +
      "v2 bucketing is enabled") {
    val tmp = stage()
    val ConfKey = "spark.sql.sources.v2.bucketing.enabled"
    val prev = spark.conf.getOption(ConfKey)
    try {
      def agg(): DataFrame = spark.read.format("graft-shard-keyed")
        .option("path", tmp.toString).load()
        .groupBy("g").agg(sum("x").as("sx"), count(lit(1)).as("n"))
      spark.conf.set(ConfKey, "true")
      val fired = agg()
      assert(!executedHasShuffle(fired))
      assert(rows(fired.orderBy("g")).map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))) ==
        Seq(("cold", 30L, 2L), ("hot key", 6L, 3L), ("warm", 7L, 1L)))
      spark.conf.set(ConfKey, "false")
      assert(executedHasShuffle(agg()))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ConfKey, v)
        case None => spark.conf.unset(ConfKey)
      }
      graft.streaming.StreamingResidue.deleteRecursively(tmp)
    }
  }

  test("refuses a non-keyed directory rather than mis-declare") {
    val tmp = Files.createTempDirectory("graft_keyed_flat")
    try {
      Files.writeString(tmp.resolve("a.csv"), "g1,5\n")
      val err = intercept[Exception] {
        spark.read.format("graft-shard-keyed")
          .option("path", tmp.toString).load().collect()
      }
      assert(err.getMessage.contains("g=") ||
        (err.getCause != null && err.getCause.getMessage.contains("g=")))
    } finally graft.streaming.StreamingResidue.deleteRecursively(tmp)
  }
}
