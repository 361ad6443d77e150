package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

/** [[graft.plans.FkJoinElim]]: the RI join-elimination rule must fire
  * on exactly the declared PK–FK shape — and, more importantly, must
  * NOT fire on any shape where elimination could change results. */
class FkJoinElimSpec extends SparkSpec {

  private def withDecl[T](fact: String, dim: String)(f: => T): T = {
    spark.conf.set("spark.graft.fk.factPath", fact)
    spark.conf.set("spark.graft.fk.factCol", "fk")
    spark.conf.set("spark.graft.fk.dimPath", dim)
    spark.conf.set("spark.graft.fk.dimCol", "pk")
    try f
    finally Seq("spark.graft.fk.factPath", "spark.graft.fk.factCol",
      "spark.graft.fk.dimPath", "spark.graft.fk.dimCol")
      .foreach(spark.conf.unset)
  }

  private def hasJoin(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.isInstanceOf[Join])

  private def fixture(s: SparkSession): (String, String, java.nio.file.Path) = {
    val tmp = Files.createTempDirectory("graft_fkelim")
    import s.implicits._
    // fact: fk 1..4 plus a NULL fk row (must be dropped by the join
    // AND by the rewrite); dim: pk 1..5 unique
    Seq((1L, 10L), (2L, 20L), (2L, 21L), (3L, 30L), (4L, 40L))
      .toDF("fk", "v")
      .union(Seq((Option.empty[Long], Option(99L))).toDF("fk", "v"))
      .write.parquet(s"$tmp/fact")
    (1L to 5L).map(k => (k, s"d$k")).toDF("pk", "name")
      .write.parquet(s"$tmp/dim")
    (s"$tmp/fact", s"$tmp/dim", tmp)
  }

  test("fires on the declared shape; results match the real join") {
    val (fact, dim, tmp) = fixture(spark)
    try withDecl(fact, dim) {
      val f = spark.read.parquet(fact)
      val d = spark.read.parquet(dim)
      def q(): DataFrame = f.join(d, f("fk") === d("pk"))
        .select(f("fk"), col("v"), d("pk")).orderBy("v")
      val out = q()
      assert(!hasJoin(out), "join should be eliminated")
      val got = rows(out).map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got == Seq((1L, 10L, 1L), (2L, 20L, 2L), (2L, 21L, 2L),
        (3L, 30L, 3L), (4L, 40L, 4L)))
      // null fk row dropped, pk column rebound to fk values
    } finally graft.streaming.StreamingResidue.deleteRecursively(tmp)
  }

  test("vetoes: consumed dim column, dim filter, outer join, undeclared") {
    val (fact, dim, tmp) = fixture(spark)
    try {
      val f = spark.read.parquet(fact)
      val d = spark.read.parquet(dim)
      withDecl(fact, dim) {
        // a non-key dim column is consumed
        assert(hasJoin(f.join(d, f("fk") === d("pk"))
          .select(col("v"), col("name"))))
        // dim-side filter on a NON-KEY column removes fact rows in a
        // way fk can't reproduce — elimination must veto
        assert(hasJoin(f.join(d.where(col("name") =!= "d2"),
          f("fk") === d("pk")).select(col("v"))))
        // left outer join keeps unmatched fact rows — different algebra
        assert(hasJoin(f.join(d, f("fk") === d("pk"), "left")
          .select(col("v"))))
      }
      // no declaration at all
      assert(hasJoin(f.join(d, f("fk") === d("pk")).select(col("v"))))
      // declaration names a DIFFERENT dim relation
      withDecl(fact, s"$tmp/other") {
        assert(hasJoin(f.join(d, f("fk") === d("pk")).select(col("v"))))
      }
    } finally graft.streaming.StreamingResidue.deleteRecursively(tmp)
  }

  test("vetoes a same-named fk that is not the scan's own attribute") {
    val (fact, dim, tmp) = fixture(spark)
    try withDecl(fact, dim) {
      val d = spark.read.parquet(dim)
      // fk is REDERIVED (pmod rewrites values): RI provenance fails
      // and the join must stay. (fk+0 would NOT do here: constant
      // folding proves it the scan attribute, and eliminating is then
      // correct.)
      val mangled = spark.read.parquet(fact)
        .select(pmod(col("fk"), lit(3L)).as("fk"), col("v"))
      assert(hasJoin(mangled.join(d, mangled("fk") === d("pk"))
        .select(col("v"))))
    } finally graft.streaming.StreamingResidue.deleteRecursively(tmp)
  }

  test("fires under an Aggregate directly on the join; dim group vetoes") {
    val (fact, dim, tmp) = fixture(spark)
    try withDecl(fact, dim) {
      val f = spark.read.parquet(fact)
      val d = spark.read.parquet(dim)
      // grouping by the dim KEY itself substitutes to fk
      val out = f.join(d, f("fk") === d("pk"))
        .groupBy(d("pk")).agg(sum("v").as("sv")).orderBy("pk")
      assert(!hasJoin(out), "rollup join should be eliminated")
      assert(rows(out).map(r => (r.getLong(0), r.getLong(1))) ==
        Seq((1L, 10L), (2L, 41L), (3L, 30L), (4L, 40L)))
      // grouping by a non-key dim column consumes the dim — veto
      assert(hasJoin(f.join(d, f("fk") === d("pk"))
        .groupBy(col("name")).agg(sum("v").as("sv"))))
    } finally graft.streaming.StreamingResidue.deleteRecursively(tmp)
  }

  test("transfers pk-only dim predicates onto the fact key") {
    val (fact, dim, tmp) = fixture(spark)
    try withDecl(fact, dim) {
      val f = spark.read.parquet(fact)
      val d = spark.read.parquet(dim).where(col("pk") =!= 2L)
      val out = f.join(d, f("fk") === d("pk")).select(col("v")).orderBy("v")
      assert(!hasJoin(out), "pk-range dim filter should transfer, not veto")
      assert(col1(out, "v") == Seq(10L, 30L, 40L))
    } finally graft.streaming.StreamingResidue.deleteRecursively(tmp)
  }
}
