package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all suites (one JVM, Test/fork=true).
  * Mirrors the driver harness config: few shuffle partitions, UTC, no UI.
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark

  /** Collect a single column as a seq (null-safe). */
  def col1[T](df: DataFrame, name: String): Seq[Any] =
    df.select(name).collect().toSeq.map(r => if (r.isNullAt(0)) null else r.get(0))

  def rows(df: DataFrame): Seq[Row] = df.collect().toSeq
}
