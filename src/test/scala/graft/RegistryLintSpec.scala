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
}
