package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.functions._

/** [[graft.plans.EagerAggregation]]: the Yan–Larson partial-aggregate
  * pushdown must produce identical results to the unpushed plan, and
  * must refuse every shape where the partial algebra doesn't hold. */
class EagerAggregationSpec extends SparkSpec {

  private def withDecl[T](dim: String)(f: => T): T = {
    spark.conf.set("spark.graft.eagerAgg.enabled", "true")
    spark.conf.set("spark.graft.unique.path", dim)
    spark.conf.set("spark.graft.unique.cols", "pk")
    try f
    finally Seq("spark.graft.eagerAgg.enabled",
      "spark.graft.unique.path", "spark.graft.unique.cols")
      .foreach(spark.conf.unset)
  }

  private def pushed(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case Join(jl, jr, _, _, _) =>
        jl.exists(_.isInstanceOf[Aggregate]) ||
          jr.exists(_.isInstanceOf[Aggregate])
      case _ => false
    }

  private def fixture(s: SparkSession): (String, String, java.nio.file.Path) = {
    val tmp = Files.createTempDirectory("graft_eageragg")
    import s.implicits._
    // several fact rows per key, one key (5) unmatched in fact,
    // one fact key (6) absent from dim, plus a NULL fk row
    Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L), (2L, 22L),
      (3L, 30L), (6L, 60L))
      .toDF("fk", "v")
      .union(Seq((Option.empty[Long], Option(99L))).toDF("fk", "v"))
      .write.parquet(s"$tmp/fact")
    Seq((1L, "a"), (2L, "a"), (3L, "b"), (5L, "b"))
      .toDF("pk", "grp").write.parquet(s"$tmp/dim")
    (s"$tmp/fact", s"$tmp/dim", tmp)
  }

  test("pushes partials below the join; results identical to unpushed") {
    val (fact, dim, tmp) = fixture(spark)
    try {
      val f = spark.read.parquet(fact)
      val d = spark.read.parquet(dim)
      def q(): DataFrame = f.join(d, f("fk") === d("pk"))
        .groupBy(col("grp"))
        .agg(sum("v").as("sv"), count(lit(1)).as("n"),
          min("v").as("mn"), max("v").as("mx"), avg("v").as("av"))
        .orderBy("grp")
      val plain = rows(q())
      val eager = withDecl(dim) {
        val out = q()
        assert(pushed(out), "partials should sit below the join")
        rows(out)
      }
      assert(eager == plain)
      // a=10,11 + 20,21,22 (keys 1,2); b=30 (key 3; key 5 unmatched;
      // key 6 and the null row dropped by the inner join)
      assert(eager.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ==
        Seq(("a", 84L, 5L), ("b", 30L, 1L)))
    } finally graft.streaming.StreamingResidue.deleteRecursively(tmp)
  }

  test("grouping by a fact column rides along in the pre-aggregate") {
    val (fact, dim, tmp) = fixture(spark)
    try {
      val f = spark.read.parquet(fact).withColumn("par", col("v") % 2)
      val d = spark.read.parquet(dim)
      def q(): DataFrame = f.join(d, f("fk") === d("pk"))
        .groupBy(col("grp"), col("par"))
        .agg(sum("v").as("sv")).orderBy("grp", "par")
      val plain = rows(q())
      val eager = withDecl(dim) {
        val out = q(); assert(pushed(out)); rows(out)
      }
      assert(eager == plain)
    } finally graft.streaming.StreamingResidue.deleteRecursively(tmp)
  }

  test("global aggregate over an EMPTY join: COUNT stays 0, not NULL") {
    val (fact, dim, tmp) = fixture(spark)
    try {
      val f = spark.read.parquet(fact)
      // dim filter keeps only pk=99 → zero join rows; the global
      // (no GROUP BY) COUNT must survive the Sum-of-partials combine
      val d = spark.read.parquet(dim).filter(col("pk") === 99L)
      def q(): DataFrame = f.join(d, f("fk") === d("pk"))
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val plain = rows(q())
      val eager = withDecl(dim) {
        val out = q()
        assert(pushed(out), "global aggregate should still push")
        // the combined COUNT attribute must remain non-nullable even
        // though it is now built from a (nullable) Sum of partials —
        // checked on the OPTIMIZED plan (the analyzed schema predates
        // the rewrite and would pass vacuously)
        assert(!out.queryExecution.optimizedPlan.output
          .find(_.name == "n").get.nullable)
        rows(out)
      }
      assert(eager == plain)
      assert(eager.head.getLong(0) == 0L && eager.head.isNullAt(1))
    } finally graft.streaming.StreamingResidue.deleteRecursively(tmp)
  }

  test("vetoes: distinct, dim-side measure, decimal sum, disabled") {
    val (fact, dim, tmp) = fixture(spark)
    try {
      val f = spark.read.parquet(fact)
      val d = spark.read.parquet(dim).withColumn("w", col("pk") * 2)
      withDecl(dim) {
        val j = f.join(d, f("fk") === d("pk"))
        // distinct sum can't pre-aggregate per key
        assert(!pushed(j.groupBy(col("grp"))
          .agg(sum_distinct(col("v")).as("sd"))))
        // measure references the DIM side — nothing to push
        assert(!pushed(j.groupBy(col("grp")).agg(sum("w").as("sw"))))
        // decimal sums re-widen their result type on the second pass
        assert(!pushed(j.groupBy(col("grp"))
          .agg(sum(col("v").cast("decimal(20,0)")).as("sdec"))))
      }
      // declaration present but rewrite not enabled
      spark.conf.set("spark.graft.unique.path", dim)
      spark.conf.set("spark.graft.unique.cols", "pk")
      try assert(!pushed(f.join(d, f("fk") === d("pk"))
        .groupBy(col("grp")).agg(sum("v").as("sv"))))
      finally Seq("spark.graft.unique.path", "spark.graft.unique.cols")
        .foreach(spark.conf.unset)
    } finally graft.streaming.StreamingResidue.deleteRecursively(tmp)
  }
}
