package graft

import org.apache.spark.sql.execution.exchange.Exchange

/** The `QueryUtil.balanced` scale-safety contract (r20 verdict item 1):
  * balancing exists ONLY to spread a narrow-partition dev scan across
  * idle cores — on an input that is already at least
  * `defaultParallelism`-way parallel it must be an identity, adding no
  * exchange, because at 100 TB an unconditional
  * `repartition(defaultParallelism)` would SHRINK a thousands-of-
  * partitions scan down to core count through a full forced shuffle.
  */
class QueryUtilSpec extends SparkSpec {

  private def countExchanges(df: org.apache.spark.sql.Dataset[_]): Int = {
    // AQE wraps the plan in AdaptiveSparkPlanExec, whose children are
    // hidden from collect — unwrap to the input plan it will execute
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }
    plan.collect { case e: Exchange => e }.size
  }

  test("balanced is the identity (no added exchange) on a pre-partitioned input") {
    val par = spark.sparkContext.defaultParallelism
    val pre = spark.range(0, 1000, 1, numPartitions = par * 4)
    val out = QueryUtil.balanced(pre)
    // same object back — no new plan node at all
    assert(out eq pre)
    assert(countExchanges(out) === 0)
    assert(out.rdd.getNumPartitions === par * 4)
  }

  test("balanced keeps an exactly-parallel input untouched") {
    val par = spark.sparkContext.defaultParallelism
    val pre = spark.range(0, 100, 1, numPartitions = par)
    assert(QueryUtil.balanced(pre) eq pre)
  }

  test("balanced spreads a single-partition input to defaultParallelism") {
    val par = spark.sparkContext.defaultParallelism
    val one = spark.range(0, 1000, 1, numPartitions = 1)
    val out = QueryUtil.balanced(one)
    assert(out.rdd.getNumPartitions === par)
    assert(countExchanges(out) === 1)
    // round-robin balance, not a key shuffle: rows spread evenly
    val sizes = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.max - sizes.min <= 1)
    // and the rows themselves are untouched
    assert(out.toDF("v").collect().map(_.getLong(0)).sorted
      === (0L until 1000L).toArray)
  }
}
