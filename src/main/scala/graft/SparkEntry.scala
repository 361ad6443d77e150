package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.*; each QuerySpec carries the Spark
  * implementation and (when SQL-expressible) the DuckDB oracle SQL.
  */
object SparkEntry {

  def specs: Seq[QuerySpec] = _root_.graft.queries.Registry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's entire main query (SURVEY.md §3.1). */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.run(
      Pipeline.syntheticFundamentals(spark, "/root/testdata/sf0.001"),
      col("p_partkey"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(s => s.name -> s.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(s => s.oracle.map(o => s.name -> o.trim)).toMap
}
