package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.operators.Health

/** Single-pass observe() health counters: metrics collected on the
  * SAME action as the plan agree exactly with a separate aggregation,
  * and survive into a write action (the production shape: counters on
  * the job that lands the data, not a second scan over it).
  */
class HealthSpec extends SparkSpec {

  test("observed counters equal a direct aggregation, from one pass") {
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
      .withColumn("maybe_null",
        when(col("doc_id") % 3 === 0, col("n_chars")))
    val obs = Observation("health")
    val observed = Health.withCounters(docs, obs, Seq("maybe_null", "text"))
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    val direct = docs.agg(
      count(lit(1)).as("rows"),
      sum(when(col("maybe_null").isNull, 1L).otherwise(0L)).as("nm"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("nt")).head()
    assert(m("rows") == direct.getLong(0))
    assert(m("null_maybe_null") == direct.getLong(1))
    assert(m("null_maybe_null").asInstanceOf[Long] > 0,
      "fixture must exercise the null branch")
    assert(m("null_text") == direct.getLong(2))
  }
}
