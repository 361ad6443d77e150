package graft

/** MERGE commit protocol edge the incremental-MV pattern (q396)
  * exposed: a MERGE whose row-level scan planned and read ZERO groups
  * — empty target table, or every group pruned away — stages pure
  * NOT-MATCHED inserts, and the commit must degenerate to an APPEND
  * (replace nothing, add the staged file). The old protocol refused
  * any zero-group replace outright, which made the very first
  * additive upsert into a fresh rollup table fail; the refusal is
  * reserved for a scan that was never consulted at all. */
class RepeatMergeSpec extends SparkSpec {
  test("additive MERGE upserts into a fresh catalog table: the " +
      "empty-target first merge appends, later merges accumulate") {
    val root = java.nio.file.Files.createTempDirectory("graft_rm")
    spark.conf.set("spark.sql.catalog.grm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grm.root", root.toString)
    try {
      spark.sql("CREATE TABLE grm.db.mv (seg STRING, n BIGINT)")
      import spark.implicits._
      for (i <- 1 to 4) {
        Seq(("a", 1L), ("b", 2L)).toDF("seg", "n")
          .createOrReplaceTempView("rm_delta")
        spark.sql("""
          MERGE INTO grm.db.mv m USING rm_delta d ON m.seg = d.seg
          WHEN MATCHED THEN UPDATE SET n = m.n + d.n
          WHEN NOT MATCHED THEN INSERT (seg, n) VALUES (d.seg, d.n)
        """)
        val got = spark.sql("SELECT seg, n FROM grm.db.mv ORDER BY seg")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        assert(got == Seq(("a", i.toLong), ("b", 2L * i)),
          s"merge $i drifted: $got")
      }
      // a MERGE whose source misses every group (static pruning drops
      // all files) is the same zero-group shape: insert-only append
      Seq(("zz", 100L)).toDF("seg", "n")
        .createOrReplaceTempView("rm_delta")
      spark.sql("""
        MERGE INTO grm.db.mv m USING rm_delta d ON m.seg = d.seg
        WHEN MATCHED THEN UPDATE SET n = m.n + d.n
        WHEN NOT MATCHED THEN INSERT (seg, n) VALUES (d.seg, d.n)
      """)
      assert(spark.sql("SELECT n FROM grm.db.mv WHERE seg = 'zz'")
        .collect().map(_.getLong(0)).toSeq == Seq(100L))
      spark.catalog.dropTempView("rm_delta")
    } finally {
      spark.conf.unset("spark.sql.catalog.grm")
      spark.conf.unset("spark.sql.catalog.grm.root")
      graft.streaming.StreamingResidue.deleteRecursively(root)
    }
  }
}
