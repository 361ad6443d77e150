package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All engine inputs are columnar parquet scans so Catalyst can push
  * filters and prune columns into the scan (`PushedFilters` /
  * `ReadSchema` in `.explain`). At 100 TB each `name.parquet` becomes a
  * partitioned directory; nothing here assumes a single file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver writes `events.ts` as TIMESTAMP(NANOS), which Spark's
    // vectorized parquet reader rejects. Read nanos as long and convert
    // to microsecond TimestampType (truncating, matching DuckDB's
    // ns→us cast) — still a pure columnar scan, prune/pushdown intact.
    // Set-if-changed: redundant conf writes churn SQLConf in packed
    // multi-query sessions.
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
