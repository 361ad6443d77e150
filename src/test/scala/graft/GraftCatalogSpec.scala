package graft

import java.nio.file.Files

/** [[graft.sources.GraftCatalog]]: the full SQL DML surface against a
  * custom DSv2 TableCatalog — CREATE/INSERT/SELECT round trip,
  * copy-on-write DELETE / UPDATE / MERGE INTO through
  * SupportsRowLevelOperations, TRUNCATE-overwrite, value fidelity
  * (tabs/newlines/nulls/exact doubles), and staged-file hygiene. */
class GraftCatalogSpec extends SparkSpec {

  private lazy val root = {
    val r = Files.createTempDirectory("graft_catalog_spec")
    spark.conf.set("spark.sql.catalog.graftrl",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftrl.root", r.toString)
    r
  }

  private def sqlRows(q: String): Seq[Seq[Any]] =
    spark.sql(q).collect().toSeq.map(_.toSeq)

  test("create / insert / select round trip with hostile values") {
    root
    spark.sql("CREATE TABLE graftrl.db.rt (k BIGINT, s STRING, v DOUBLE)")
    spark.sql("INSERT INTO graftrl.db.rt VALUES " +
      "(1, 'plain', 1.5), " +
      "(2, 'tab\there', 0.1), " +
      "(3, 'line\nbreak', -0.0), " +
      "(4, NULL, CAST('NaN' AS DOUBLE)), " +
      "(5, 'back\\\\slash', 3.141592653589793)")
    val got = sqlRows("SELECT k, s, v FROM graftrl.db.rt ORDER BY k")
    assert(got(0) == Seq(1L, "plain", 1.5))
    assert(got(1) == Seq(2L, "tab\there", 0.1))
    // NOTE: Spark itself normalizes -0.0 to 0.0 on the insert path
    // (NormalizeFloatingNumbers), so bit-sign preservation cannot be
    // asserted end-to-end; the storage codec is bit-exact (hex bit
    // pattern), which the NaN row below proves
    assert(got(2) == Seq(3L, "line\nbreak", -0.0))
    assert(got(3)(1) == null &&
      got(3)(2).asInstanceOf[Double].isNaN)
    assert(got(4) == Seq(5L, "back\\slash", 3.141592653589793))
    // second INSERT appends, never clobbers
    spark.sql("INSERT INTO graftrl.db.rt VALUES (6, 'more', 6.0)")
    assert(sqlRows("SELECT count(*) FROM graftrl.db.rt").head.head == 6L)
    // INSERT OVERWRITE truncates then writes
    spark.sql("INSERT OVERWRITE graftrl.db.rt VALUES (9, 'only', 9.0)")
    assert(sqlRows("SELECT k, s FROM graftrl.db.rt") ==
      Seq(Seq(9L, "only")))
  }

  test("row-level DELETE / UPDATE / MERGE INTO (copy-on-write)") {
    root
    spark.sql("CREATE TABLE graftrl.db.acct (k BIGINT, seg STRING, v BIGINT)")
    spark.sql("INSERT INTO graftrl.db.acct VALUES " +
      "(1, 'a', 10), (2, 'a', 20), (3, 'b', 30), (4, 'b', 40)")
    // DELETE with a non-trivial predicate → the group is rewritten
    spark.sql("DELETE FROM graftrl.db.acct WHERE seg = 'a' AND v > 15")
    assert(sqlRows("SELECT k FROM graftrl.db.acct ORDER BY k")
      .map(_.head) == Seq(1L, 3L, 4L))
    // UPDATE with expression assignment
    spark.sql("UPDATE graftrl.db.acct SET v = v + 100 WHERE seg = 'b'")
    assert(sqlRows("SELECT k, v FROM graftrl.db.acct ORDER BY k") ==
      Seq(Seq(1L, 10L), Seq(3L, 130L), Seq(4L, 140L)))
    // MERGE: update a matched row, insert an unmatched one, delete on
    // a matched condition — all three WHEN arms in one statement
    spark.sql("CREATE TABLE graftrl.db.delta (k BIGINT, seg STRING, v BIGINT)")
    spark.sql("INSERT INTO graftrl.db.delta VALUES " +
      "(3, 'b', 7), (4, 'b', -1), (5, 'c', 50)")
    spark.sql("""
      MERGE INTO graftrl.db.acct t USING graftrl.db.delta s ON t.k = s.k
      WHEN MATCHED AND s.v < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = t.v + s.v
      WHEN NOT MATCHED THEN INSERT (k, seg, v) VALUES (s.k, s.seg, s.v)
    """)
    assert(sqlRows("SELECT k, seg, v FROM graftrl.db.acct ORDER BY k") ==
      Seq(Seq(1L, "a", 10L), Seq(3L, "b", 137L), Seq(5L, "c", 50L)))
    // no staged/commit residue in either table dir after all
    // operations — only the live file, the schema, and the immutable
    // version snapshots each commit retains for time travel
    for (t <- Seq("acct", "delta")) {
      val files = root.resolve("db").resolve(t).toFile.listFiles()
        .map(_.getName).sorted
      assert(files.forall(f => f == "data.tsv" || f == "schema.json" ||
        f.matches("data\\.v\\d+\\.tsv")),
        s"residue in $t: ${files.mkString(",")}")
    }
  }

  test("time travel: VERSION AS OF addresses every committed snapshot") {
    root
    spark.sql("CREATE TABLE graftrl.db.tt (k BIGINT, seg STRING, v BIGINT)")
    spark.sql("INSERT INTO graftrl.db.tt VALUES (1, 'a', 10), (2, 'a', 20)")
    spark.sql("UPDATE graftrl.db.tt SET v = v * 2 WHERE k = 2")
    spark.sql("DELETE FROM graftrl.db.tt WHERE k = 1")
    def at(v: Int): Seq[(Long, Long)] =
      sqlRows(s"SELECT k, v FROM graftrl.db.tt VERSION AS OF $v ORDER BY k")
        .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]))
    assert(at(0) == Seq())                          // created empty
    assert(at(1) == Seq((1L, 10L), (2L, 20L)))      // after insert
    assert(at(2) == Seq((1L, 10L), (2L, 40L)))      // after update
    assert(at(3) == Seq((2L, 40L)))                 // after delete
    // the live table equals the newest snapshot
    assert(sqlRows("SELECT k, v FROM graftrl.db.tt ORDER BY k")
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]))
      == at(3))
    // a version that was never committed refuses loudly
    intercept[Exception] {
      spark.sql("SELECT * FROM graftrl.db.tt VERSION AS OF 9").collect()
    }
  }

  test("catalog hygiene: duplicate create refuses, drop removes, " +
      "unsupported types refused") {
    root
    spark.sql("CREATE TABLE graftrl.db.h (k BIGINT, s STRING, v DOUBLE)")
    intercept[Exception] {
      spark.sql("CREATE TABLE graftrl.db.h (k BIGINT, s STRING, v DOUBLE)")
    }
    assert(sqlRows("SHOW TABLES IN graftrl.db").map(_(1)).contains("h"))
    spark.sql("DROP TABLE graftrl.db.h")
    assert(!sqlRows("SHOW TABLES IN graftrl.db").map(_(1)).contains("h"))
    intercept[Exception] {
      spark.sql("CREATE TABLE graftrl.db.bad (k BIGINT, arr ARRAY<INT>)")
    }
  }
}
