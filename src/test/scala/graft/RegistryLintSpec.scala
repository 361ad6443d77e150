package graft

import org.apache.spark.sql.types._

/** Registry-wide driver-comparability lint — the invariants two rounds
  * of driver red rows taught, enforced at build time for EVERY query
  * instead of rediscovered one artifact at a time:
  *
  *  - r11 (q164): a top-level array column raises "unhashable type"
  *    in the driver's pandas row-sort canon → outputs must be scalar.
  *  - r13 (q183): DATE columns arrive as python-object from Spark
  *    parquet but datetime64 from DuckDB — same values, different
  *    dtype kind → dates/timestamps ship as formatted strings.
  *  - names must be unique (the correctness file is keyed by name) and
  *    column names unique within a query (pandas silently mangles
  *    duplicates).
  *
  * The DuckDB side of the same gate lives in tools/compare.py (the
  * post-canon dtype assert added r13): this spec pins the Spark half
  * that is checkable without a DuckDB runtime. Schema derivation needs
  * only plan analysis, so the walk stays cheap even at 200+ queries —
  * the handful of queries with eager sub-steps (counts, sortByKey
  * partitioners) run them at sf0.001.
  */
class RegistryLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("registry: query names are unique and well-formed") {
    val names = graft.queries.Registry.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate names: ${names.diff(names.distinct).mkString(",")}")
    assert(names.forall(_.matches("q[0-9]+[a-z0-9_]*")),
      s"non-conforming: ${names.filterNot(_.matches("q[0-9]+[a-z0-9_]*"))}")
  }

  test("every query's output schema is scalar, driver-hashable, " +
      "deduplicated — no arrays/structs/maps/dates at top level") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    for (q <- graft.queries.Registry.all) {
      try {
        val schema = q.fn(spark, dir).schema
        val dup = schema.fieldNames.diff(schema.fieldNames.distinct)
        if (dup.nonEmpty)
          bad += s"${q.name}: duplicate columns ${dup.mkString(",")}"
        for (f <- schema.fields) f.dataType match {
          case _: ArrayType | _: MapType | _: StructType | NullType |
              BinaryType =>
            bad += s"${q.name}.${f.name}: ${f.dataType.simpleString} " +
              "(driver canon cannot sort/hash it — stringify)"
          case DateType | _: TimestampType | TimestampNTZType =>
            bad += s"${q.name}.${f.name}: ${f.dataType.simpleString} " +
              "(pandas dtype kind differs between Spark parquet and " +
              "DuckDB — emit a formatted string instead)"
          case _ => ()
        }
      } catch {
        case e: Throwable =>
          bad += s"${q.name}: fn threw ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(120)
      }
      CacheRegistry.releaseAll()
      spark.catalog.clearCache()
    }
    assert(bad.isEmpty, "\n" + bad.mkString("\n"))
  }

  test("no broadcast hint whose build side derives from an " +
      "unbounded-key groupBy (per-user/doc/node frames grow with the " +
      "data; a hint forces a driver collect at any size)") {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    for (q <- graft.queries.Registry.all) {
      try {
        val plan = q.fn(spark, dir).queryExecution.analyzed
        bad ++= BroadcastLint.unboundedBroadcasts(plan)
          .map(k => s"${q.name}: broadcast over groupBy($k) — " +
            "unbounded cardinality; drop the hint or bound with top-k")
      } catch { case _: Throwable => () } // fn errors are test #2's job
      CacheRegistry.releaseAll()
      spark.catalog.clearCache()
    }
    assert(bad.isEmpty, "\n" + bad.mkString("\n"))
  }

  test("broadcast lint catches a deliberately-hinted regression") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val perUser = ev.groupBy("user_id").agg(min("ts").as("t1"))
    val joined = ev.join(broadcast(perUser), Seq("user_id"))
    assert(BroadcastLint.unboundedBroadcasts(
      joined.queryExecution.analyzed).nonEmpty)
    // a top-k bound below the hint makes the build side legitimate
    val bounded = ev.join(broadcast(perUser.orderBy("t1").limit(100)),
      Seq("user_id"))
    assert(BroadcastLint.unboundedBroadcasts(
      bounded.queryExecution.analyzed).isEmpty)
  }
}

/** Plan-walk helper for the unbounded-broadcast lint: finds broadcast
  * hints (ResolvedHint with a BROADCAST strategy) whose subtree
  * contains an Aggregate grouping on an unbounded entity key
  * (user/doc/node/customer ids — cardinalities that scale with the
  * data) with no intervening LIMIT to bound the frame. Returns the
  * offending grouping column names.
  */
object BroadcastLint {
  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.catalyst.expressions.AttributeReference

  private val unboundedKeys =
    Set("user_id", "doc_id", "emb_id", "node", "c_custkey", "o_custkey",
      "o_orderkey", "l_orderkey")

  def unboundedBroadcasts(plan: LogicalPlan): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    plan.foreach {
      case h: ResolvedHint if h.hints.strategy.exists(
          _.toString.contains("broadcast")) =>
        out ++= offendingKeys(h.child)
      case _ => ()
    }
    out.toSeq.distinct
  }

  /** Unbounded grouping keys in `p`, not shielded by a Limit. An
    * Aggregate RE-KEYS the frame to its own grouping columns: the
    * broadcast ships one row per outer key, so only the OUTERMOST
    * aggregate on each path determines cardinality — recursion stops
    * there (a global aggregate is 1 row; a bounded-key rollup over a
    * per-user frame ships only the rollup). */
  private def offendingKeys(p: LogicalPlan): Seq[String] = p match {
    case _: GlobalLimit | _: LocalLimit => Nil // bounded below here
    case a: Aggregate =>
      a.groupingExpressions.collect {
        case ar: AttributeReference
            if unboundedKeys.contains(ar.name.toLowerCase) => ar.name
      }
    case other => other.children.flatMap(offendingKeys)
  }
}
