package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join: for each left row, the most recent right row
  * with rightTs ≤ leftTs within the same key (the time-series join
  * Spark lacks natively).
  *
  * Spark-first composition (SURVEY.md §7.2 preference (a) — no custom
  * strategy needed): tag and union both sides, then one window pass
  * per key carries the latest right payload forward via
  * last(ignoreNulls) over (ts, side) order; left rows then read their
  * match from the running state. Cost: ONE shuffle on the key (the
  * union sort is within partitions) — same exchange count as any
  * shuffle join of the two inputs, and no custom Catalyst code. This
  * is the scalable shape: a naive "max(rightTs) ≤ leftTs per left row"
  * correlated join is O(L×R) per key.
  *
  * At equal timestamps the right row sorts first (side 0 < side 1), so
  * a right row AT the left timestamp matches — same semantics as
  * DuckDB's ASOF JOIN (`ON r.ts <= l.ts`), which is the oracle.
  */
object AsOf {

  /** @param left      probe side; all its columns pass through
    * @param right     build side: key, ts, and payload columns
    * @param key       equi-key column name (both sides)
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightPayload right columns to carry to matches
    */
  def joinBackward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame =
    joinDirected(left, right, key, leftTs, rightTs, rightPayload,
      forward = false)

  /** Forward variant: for each left row, the EARLIEST right row with
    * rightTs ≥ leftTs within the key — same one-shuffle union+window
    * shape, with the running state carried over descending time (at
    * equal timestamps the right row still sorts first, so a right row
    * AT the left timestamp matches — DuckDB `ON r.ts >= l.ts`). */
  def joinForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[String]): DataFrame =
    joinDirected(left, right, key, leftTs, rightTs, rightPayload,
      forward = true)

  private def joinDirected(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      forward: Boolean): DataFrame = {
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select((rightTs +: rightPayload).map(col): _*).schema.fields)))
    val r = right.select(
      col(key), col(rightTs).as("__ts"), lit(0).as("__side"),
      struct((rightTs +: rightPayload).map(col): _*).as("__r"))
    val lCols = left.columns
    val unioned = l.select((Seq(col(key), col("__ts"), col("__side"), col("__r")) ++
      lCols.filterNot(_ == key).map(c => col(c))): _*)
      .unionByName(r, allowMissingColumns = true)
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(key).orderBy(tsOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__ts", "__side", "__r")
  }
}
