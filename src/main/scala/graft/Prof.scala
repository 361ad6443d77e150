package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling scratch: run one query N times in a warm session. */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // dev knob: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" for conf experiments
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(
      _.split(';').filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      CacheRegistry.releaseAll()
      spark.catalog.clearCache()
      println(f"PROF $name run$i $sec%.3f s")
    }
    spark.stop()
  }
}
