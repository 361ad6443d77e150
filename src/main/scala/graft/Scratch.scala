package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev-debug main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val tmp = java.nio.file.Files.createTempDirectory("graft_scratch")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val ord = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority").as("g"),
        expr("cast(round(o_totalprice) as bigint)").as("x"))
    val median = ord.stat.approxQuantile("o_orderkey", Array(0.5), 0.0).head
    def stage(name: String, cond: org.apache.spark.sql.Column): String = {
      val p = tmp.resolve(name).toString
      ord.where(cond).select(col("g"), col("x"))
        .repartition(col("g")).sortWithinPartitions("g", "x")
        .write.mode("overwrite").partitionBy("g").csv(p)
      p
    }
    val early = stage("early", col("o_orderkey") <= median)
    val late = stage("late", col("o_orderkey") > median)
    def read(p: String, o: Boolean) = spark.read.format("graft-shard-keyed")
      .option("path", p).option("ordered", o).load()
    def rec(o: Boolean) = {
      val e = read(early, o)
      val l = read(late, o)
      e.join(l, e("g") === l("g") && e("x") === l("x"))
        .groupBy(e("g"))
        .agg(count(lit(1)).as("n_collisions"),
          min(l("x")).as("min_price"), max(l("x")).as("max_price"))
    }
    println("=== STATIC ordered=false ===")
    println(rec(false).queryExecution.sparkPlan.toString.take(3000))
    graft.streaming.StreamingResidue.deleteRecursively(tmp)
    spark.stop()
  }
}
