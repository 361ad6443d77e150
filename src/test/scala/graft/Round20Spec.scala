package graft

import java.nio.file.{Files, Path}

import graft.sources.{GraftCatalogTestHook => Hook}

/** Round-20 catalog hardening: streaming txn markers SURVIVE snapshot
  * retention (the Delta setTransaction discipline — an expire while a
  * stream is stopped must not re-open the exactly-once window), the
  * zombie-epoch race is closed for every interleaving (the marker
  * re-check is pinned AFTER the base-version read, inside the retry
  * loop), OPTIMIZE commits through the file-disjoint rebase (a
  * concurrent append no longer discards a whole compaction run), and
  * SQL procedures refuse path-traversal table names. */
class Round20Spec extends SparkSpec {

  private lazy val root = {
    val r = Files.createTempDirectory("graft_r20_spec")
    spark.conf.set("spark.sql.catalog.g20", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g20.root", r.toString)
    r
  }

  private def sqlRows(q: String): Seq[Seq[Any]] =
    spark.sql(q).collect().toSeq.map(_.toSeq)

  private def dir(t: String): Path = root.resolve("db").resolve(t)

  private def copyTree(from: Path, to: Path): Unit =
    scala.util.Using.resource(Files.walk(from)) { s =>
      s.forEach { p =>
        val d = to.resolve(from.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(d)
        else { Files.createDirectories(d.getParent); Files.copy(p, d) }
      }
    }

  test("exactly-once survives retention: expire_snapshots folds the " +
      "txn high-water mark into the sidecar, and a stale-checkpoint " +
      "replay after the expire still appends nothing twice") {
    root
    import org.apache.spark.sql.streaming.Trigger
    spark.sql("CREATE TABLE g20.db.rsrc (k BIGINT, v BIGINT)")
    spark.sql("CREATE TABLE g20.db.rsink (k BIGINT, v BIGINT)")
    val ck = Files.createTempDirectory("graft_r20_ck")
    def drain(fromCk: Path): Unit = {
      val q = spark.readStream.table("g20.db.rsrc")
        .writeStream.option("checkpointLocation", fromCk.toString)
        .trigger(Trigger.AvailableNow())
        .toTable("g20.db.rsink")
      try q.awaitTermination() finally q.stop()
    }
    val sink = dir("rsink")
    spark.sql("INSERT INTO g20.db.rsrc SELECT id, id * 3 FROM range(0, 6)")
    drain(ck) // epoch 0 commits with its txn marker
    // the stale copy knows epoch 0 but not epoch 1: restarting from
    // it re-plans epoch 1 with the same data (the classic replay)
    val ckStale = Files.createTempDirectory("graft_r20_ck_stale")
    copyTree(ck, ckStale)
    spark.sql("INSERT INTO g20.db.rsrc SELECT id, id * 3 FROM range(6, 9)")
    drain(ck) // epoch 1, live
    val txn = Hook.manifestMeta(sink, Hook.manifestVersions(sink).max)("txn")
    val qid = txn.take(txn.lastIndexOf(':'))
    assert(Hook.lastTxnEpoch(sink, qid).contains(1L))
    // batch commits pile on top, then retention drops every manifest
    // but the newest — including every txn-bearing one
    spark.sql("INSERT INTO g20.db.rsink VALUES (100, 100), (101, 101)")
    spark.sql("INSERT INTO g20.db.rsink VALUES (102, 102)")
    val res = Hook.expireSnapshots(sink, retainLast = 1)
    assert(res.expiredVersions.nonEmpty, s"nothing expired: $res")
    assert(Hook.manifestVersions(sink).forall(v =>
      !Hook.manifestMeta(sink, v).contains("txn")),
      "precondition: no retained manifest still carries the marker")
    // the sidecar carries the high-water mark the expired manifests held
    assert(Hook.readTxnSidecar(sink) == Map(qid -> 1L),
      s"sidecar must hold the expired high-water mark: " +
        s"${Hook.readTxnSidecar(sink)}")
    assert(Hook.lastTxnEpoch(sink, qid).contains(1L),
      "lastTxnEpoch must resolve from the sidecar after the expire")
    // the e2e proof: replaying epoch 1 from the stale checkpoint now
    // (post-expire) must be swallowed by the sidecar mark — without
    // it, rows 6..8 would land twice
    drain(ckStale)
    assert(sqlRows("SELECT count(*) FROM g20.db.rsink").head.head == 12L,
      "replayed epoch after expire must not double-append")
    assert(sqlRows("SELECT k FROM g20.db.rsink ORDER BY k").flatten ==
      ((0L until 9L) ++ Seq(100L, 101L, 102L)))
    graft.streaming.StreamingResidue.deleteRecursively(ck)
    graft.streaming.StreamingResidue.deleteRecursively(ckStale)
  }

  test("zombie-epoch race: a twin committing the same epoch between " +
      "the base-version read and the publish is detected on the " +
      "rebase re-check — the epoch lands exactly once") {
    root
    import org.apache.spark.sql.streaming.Trigger
    spark.sql("CREATE TABLE g20.db.zsrc (k BIGINT)")
    spark.sql("CREATE TABLE g20.db.zsink (k BIGINT)")
    val ck = Files.createTempDirectory("graft_r20_zck")
    val sink = dir("zsink")
    def drain(): Unit = {
      val q = spark.readStream.table("g20.db.zsrc")
        .writeStream.option("checkpointLocation", ck.toString)
        .trigger(Trigger.AvailableNow())
        .toTable("g20.db.zsink")
      try q.awaitTermination() finally q.stop()
    }
    spark.sql("INSERT INTO g20.db.zsrc SELECT id FROM range(0, 4)")
    drain() // epoch 0: learn the query id from its marker
    val txn = Hook.manifestMeta(sink, Hook.manifestVersions(sink).max)("txn")
    val qid = txn.take(txn.lastIndexOf(':'))
    spark.sql("INSERT INTO g20.db.zsrc SELECT id FROM range(10, 13)")
    // the zombie twin: at the racy instant (base version pinned,
    // marker scanned clean, publish not yet attempted) it commits
    // epoch 1 itself — our publish must lose the link race and the
    // re-loop must see the marker and stand down
    @volatile var fired = false
    Hook.setBeforeEpochPublish { () =>
      if (!fired) {
        fired = true
        val cur = Hook.manifestVersions(sink).max
        assert(Hook.republishWithMeta(sink, cur, cur + 1,
          Map("txn" -> s"$qid:1")), "zombie publish must win")
      }
    }
    try drain()
    finally Hook.clearPublishHooks()
    assert(fired, "the racy instant was never reached")
    // the zombie's commit (rows-free in this simulation) is the
    // authoritative epoch-1 commit; the real writer must append
    // NOTHING on top of it
    assert(sqlRows("SELECT k FROM g20.db.zsink ORDER BY k").flatten ==
      (0L until 4L), "epoch 1 must not be appended on top of the twin's")
    assert(Hook.lastTxnEpoch(sink, qid).contains(1L))
    // the loser's staged files were deleted, not orphaned
    val referenced = Hook.manifestVersions(sink)
      .flatMap(v => Hook.manifestFiles(sink, v)).toSet
    val onDisk = Option(sink.toFile.listFiles()).get
      .map(_.getName).filter(_.startsWith("data-")).toSet
    assert(onDisk == referenced, s"orphans: ${onDisk -- referenced}")
    graft.streaming.StreamingResidue.deleteRecursively(ck)
  }

  test("OPTIMIZE rebases past a concurrent append (compaction and " +
      "appends commute); a concurrent DV attach on a compacted input " +
      "is a real conflict and aborts with staged files cleaned") {
    root
    spark.sql("CREATE TABLE g20.db.oreb (k BIGINT, v BIGINT)")
    for (i <- 0 until 4)
      spark.sql(s"INSERT INTO g20.db.oreb SELECT id, id FROM " +
        s"range(${i * 10}, ${i * 10 + 10}, 1, 1)")
    val t = dir("oreb")
    // the racy append lands after the bins are rewritten, before the
    // compaction publishes — it must survive INTO the rebased manifest
    Hook.setBeforeOptimizePublish { () =>
      spark.sql("INSERT INTO g20.db.oreb SELECT id, id FROM " +
        "range(1000, 1005, 1, 1)")
    }
    val r = try Hook.optimizeTable(t, targetRows = 20L)
    finally Hook.clearPublishHooks()
    assert(r.removedFiles.size == 4 && r.addedFiles.size == 2,
      s"4 fragments into 2 bins: $r")
    val files = Hook.manifestFiles(t, Hook.manifestVersions(t).max)
    assert(files.size == 3,
      s"rebased manifest = 2 packed + 1 concurrent append: $files")
    assert(sqlRows("SELECT count(*) FROM g20.db.oreb").head.head == 45L,
      "both the compacted rows and the concurrent append must survive")
    // real conflict: a DELETE attaches a DV to a file the compaction
    // just rewrote — folding would silently resurrect the row; abort
    spark.sql("CREATE TABLE g20.db.oconf (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('delete.mode' = 'merge-on-read')")
    for (i <- 0 until 4)
      spark.sql(s"INSERT INTO g20.db.oconf SELECT id, id FROM " +
        s"range(${i * 10}, ${i * 10 + 10}, 1, 1)")
    val c = dir("oconf")
    Hook.setBeforeOptimizePublish { () =>
      spark.sql("DELETE FROM g20.db.oconf WHERE k = 5")
    }
    val ex = try intercept[java.util.ConcurrentModificationException] {
      Hook.optimizeTable(c, targetRows = 20L)
    } finally Hook.clearPublishHooks()
    assert(ex.getMessage.contains("OPTIMIZE"))
    assert(sqlRows("SELECT count(*) FROM g20.db.oconf").head.head == 39L,
      "the conflicting DELETE must be the surviving commit")
    // abort hygiene: every on-disk data file is manifest-bound
    val referenced = Hook.manifestVersions(c)
      .flatMap(v => Hook.manifestFiles(c, v)).toSet
    val onDisk = Option(c.toFile.listFiles()).get
      .map(_.getName).filter(_.startsWith("data-")).toSet
    assert(onDisk == referenced,
      s"aborted OPTIMIZE leaked packed files: ${onDisk -- referenced}")
  }

  test("multi-column Z-order OPTIMIZE: interleaved 2-D fragments " +
      "re-cut along the Morton curve — point predicates on EACH " +
      "dimension prune through the real scan, contents bit-stable, " +
      "re-run a no-op") {
    root
    spark.sql("CREATE TABLE g20.db.zo (x BIGINT, y BIGINT, v BIGINT)")
    // 32 era fragments, EACH spanning the full (x, y) domain — the
    // sustained-ingest shape where neither dimension can prune
    for (r <- 0 until 32)
      spark.sql("INSERT INTO g20.db.zo SELECT id % 64 AS x, " +
        "pmod(hash(id), 64) AS y, id AS v " +
        s"FROM range(${r * 64}, ${r * 64 + 64}, 1, 1)")
    val t = dir("zo")
    def keptGroups(pred: String): Int =
      spark.sql(s"SELECT x, y, v FROM g20.db.zo WHERE $pred")
        .rdd.getNumPartitions // one InputPartition per kept group
    assert(keptGroups("x = 7") == 32 && keptGroups("y = 9") == 32,
      "interleaved fragments must defeat pruning on both dims (premise)")
    val pre = sqlRows("SELECT x, y, v FROM g20.db.zo").toSet
    // 2048 rows at targetRows=128 → 16 full Z-range files (an even
    // interleave depth, so the implied grid is square 4×4; full
    // chunks hold ≥ targetRows rows, so they leave candidacy and the
    // re-run below is a no-op by construction)
    val r1 = Hook.optimizeTableZorderedDistributed(spark, t, 128L,
      Seq("x", "y"))
    assert(r1.removedFiles.size == 32, s"all fragments re-cut: $r1")
    assert(r1.addedFiles.size >= 14 && r1.addedFiles.size <= 18,
      s"~16 Z-range files expected: ${r1.addedFiles.size}")
    assert(sqlRows("SELECT x, y, v FROM g20.db.zo").toSet == pre,
      "Z-ordering changed table contents")
    // the Morton payoff: EACH dimension alone prunes to ~√F files
    // (the z-curve bound — chunk cuts straddle grid cells, so the
    // practical bound is ≤ F/2 per dim vs ALL F before), and a
    // conjunctive point predicate — the actual 100 TB access
    // pattern multi-dim clustering exists for — prunes to ~1 cell
    val f = r1.addedFiles.size
    val keptX = keptGroups("x = 7")
    val keptY = keptGroups("y = 9")
    assert(keptX <= f / 2 && keptY <= f / 2,
      s"Z-order must restore pruning on both dims: x→$keptX y→$keptY of $f")
    val keptXY = keptGroups("x = 7 AND y = 9")
    assert(keptXY <= 3 && keptXY < keptX && keptXY < keptY,
      s"conjunctive point predicate must prune to ~1 cell: $keptXY of $f")
    // idempotence: a second pass finds nothing to re-cut
    val r2 = Hook.optimizeTableZorderedDistributed(spark, t, 65L,
      Seq("x", "y"))
    assert(r2.removedFiles.isEmpty && r2.addedFiles.isEmpty,
      s"Z-order OPTIMIZE must be idempotent: $r2")
  }

  test("bounded clustered-rewrite buffer: a range larger than " +
      "maxBinBytes splits across fragment subsets — multiple " +
      "range-tight sorted files, bit-stable contents") {
    root
    spark.sql("CREATE TABLE g20.db.cap (k BIGINT, v BIGINT)")
    // one hot key with many duplicates: range boundaries collapse, so
    // without the cap one bin would buffer all 400 rows
    for (r <- 0 until 4)
      spark.sql("INSERT INTO g20.db.cap SELECT 42 AS k, id AS v " +
        s"FROM range(${r * 100}, ${r * 100 + 100}, 1, 1)")
    val t = dir("cap")
    val pre = sqlRows("SELECT k, v FROM g20.db.cap").toSet
    // cap ≈ one fragment's bytes → the single collapsed range must
    // split into one bin per fragment subset
    val oneFileBytes = java.nio.file.Files.size(
      t.resolve(Hook.manifestFiles(t, Hook.manifestVersions(t).max).head))
    val res = Hook.optimizeTableClusteredCapped(t, targetRows = 1000L,
      sortCol = "k", maxBinBytes = oneFileBytes + 1)
    assert(res.removedFiles.size == 4, s"all fragments consumed: $res")
    assert(res.addedFiles.size >= 2,
      s"oversized range must split into multiple files: $res")
    assert(sqlRows("SELECT k, v FROM g20.db.cap").toSet == pre,
      "cap split changed table contents")
    // every packed file is range-tight on the sort key (same single
    // key here — stats must agree) and live == rows (no DVs)
    assert(Hook.groupOccupancy(t).forall { case (_, r, l) => r == l })
    // the uncapped default would have packed ONE file; prove the cap
    // was load-bearing by re-running with the default: the split
    // files merge back (they are < targetRows fragments again)
    val merged = Hook.optimizeTable(t, targetRows = 1000L)
    assert(merged.addedFiles.size == 1,
      s"default-cap re-pack should merge: $merged")
    assert(sqlRows("SELECT k, v FROM g20.db.cap").toSet == pre)
  }

  test("change data feed: a MOR DELETE+UPDATE+MERGE lifecycle drains " +
      "as typed change rows with pre/post images, batch and " +
      "streaming agree, rewrite commits refuse unless skipped") {
    root
    spark.sql("CREATE TABLE g20.db.cdc (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('delete.mode'='merge-on-read'," +
      "'update.mode'='merge-on-read','merge.mode'='merge-on-read')")
    spark.sql(
      "INSERT INTO g20.db.cdc SELECT id, id * 10 FROM range(0, 5, 1, 1)")
    spark.sql(
      "INSERT INTO g20.db.cdc SELECT id, id * 10 FROM range(5, 8, 1, 1)")
    spark.sql("DELETE FROM g20.db.cdc WHERE k = 3")              // v3
    spark.sql("UPDATE g20.db.cdc SET v = 999 WHERE k = 6")       // v4
    spark.sql("MERGE INTO g20.db.cdc t USING (SELECT 7 AS k, " +
      "70007 AS v UNION ALL SELECT 100, 1000) s ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)")   // v5
    val expected = Seq(
      (0L, 0L, "insert", 1L), (1L, 10L, "insert", 1L),
      (2L, 20L, "insert", 1L), (3L, 30L, "insert", 1L),
      (4L, 40L, "insert", 1L),
      (5L, 50L, "insert", 2L), (6L, 60L, "insert", 2L),
      (7L, 70L, "insert", 2L),
      (3L, 30L, "delete", 3L),
      (6L, 60L, "update_preimage", 4L),
      (6L, 999L, "update_postimage", 4L),
      (7L, 70L, "update_preimage", 5L),
      (7L, 70007L, "update_postimage", 5L),
      (100L, 1000L, "update_postimage", 5L))
    def asTuples(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).sortBy(t => (t._4, t._3, t._1))
    def norm(ts: Seq[(Long, Long, String, Long)]) =
      ts.sortBy(t => (t._4, t._3, t._1))
    val batch = spark.sql("SELECT k, v, _change_type, " +
      "_commit_version FROM g20.db.`cdc$changes`").collect().toSeq
    assert(asTuples(batch) == norm(expected))
    // startingVersion bounds the replay (incremental backfill shape)
    val fromV3 = spark.read.option("startingVersion", "3")
      .table("g20.db.`cdc$changes`")
      .select("k", "v", "_change_type", "_commit_version")
      .collect().toSeq
    assert(asTuples(fromV3) == norm(expected.filter(_._4 >= 3L)))
    // streaming: the SAME slice planner serves micro-batches; a
    // drained AvailableNow run equals the batch feed exactly
    import org.apache.spark.sql.streaming.Trigger
    val ck = Files.createTempDirectory("graft_r20_cdcck")
    val q = spark.readStream.option("maxVersionsPerBatch", "2")
      .table("g20.db.`cdc$changes`")
      .writeStream.option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow()).format("memory")
      .queryName("cdc_feed_r20").start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.sql("SELECT k, v, _change_type, " +
      "_commit_version FROM cdc_feed_r20").collect().toSeq
    assert(asTuples(streamed) == norm(expected),
      "streaming feed must equal the batch feed")
    // a rewrite commit (OPTIMIZE folds the DVs) is not representable
    // from a manifest diff: refuse loudly, or skip wholesale on
    // explicit opt-in — and OPTIMIZE is content-preserving, so the
    // skipped feed is still the exact change history
    val res = Hook.optimizeTable(dir("cdc"), targetRows = 1000L)
    assert(res.removedFiles.nonEmpty, s"expected a rewrite: $res")
    val ex = intercept[Exception] {
      spark.sql("SELECT count(*) FROM g20.db.`cdc$changes`").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("REWRITES group")),
      s"rewrite commit must refuse: ${msgs(ex)}")
    val skipped = spark.read.option("skipRewrites", "true")
      .table("g20.db.`cdc$changes`")
      .select("k", "v", "_change_type", "_commit_version")
      .collect().toSeq
    assert(asTuples(skipped) == norm(expected),
      "skipRewrites must serve the pre-rewrite history unchanged")
    graft.streaming.StreamingResidue.deleteRecursively(ck)
  }

  test("branch/WAP: write to a branch, audit on the branch, publish " +
      "fast-forwards main atomically; main readers never see " +
      "intermediate states and a moved main refuses the publish") {
    root
    spark.sql("CREATE TABLE g20.db.wap (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('delete.mode'='merge-on-read')")
    spark.sql(
      "INSERT INTO g20.db.wap SELECT id, id * 10 FROM range(0, 8, 1, 1)")
    val t = dir("wap")
    val fork = graft.sources.GraftCatalog.createBranch(t, "audit")
    assert(fork == 1L)
    // the backfill lands ON THE BRANCH: an insert and a MOR delete
    // (the delete attaches a DV to a MAIN data file through the
    // branch's ../ reference — nothing in main's log moves)
    spark.sql("INSERT INTO g20.db.`wap$branch$audit` " +
      "SELECT id, id * 10 FROM range(100, 103, 1, 1)")
    spark.sql("DELETE FROM g20.db.`wap$branch$audit` WHERE k = 3")
    // audit query reads the branch; main readers see NOTHING of it
    assert(sqlRows("SELECT count(*) FROM g20.db.`wap$branch$audit`")
      .head.head == 10L)
    assert(sqlRows("SELECT k FROM g20.db.wap ORDER BY k").flatten ==
      (0L until 8L), "main must not see unpublished branch work")
    assert(Hook.manifestVersions(t).max == 1L,
      "branch commits must not advance the main manifest log")
    // publish = ONE atomic main advance to the audited state
    val v = graft.sources.GraftCatalog.publishBranch(t, "audit")
    assert(v == 2L)
    assert(sqlRows("SELECT k FROM g20.db.wap ORDER BY k").flatten ==
      ((0L until 8L).filterNot(_ == 3L) ++ Seq(100L, 101L, 102L)))
    // time travel still serves the pre-publish state
    assert(spark.sql("SELECT count(*) FROM g20.db.wap VERSION AS OF 1")
      .collect().head.getLong(0) == 8L)
    // WAP refusal: main moved since the fork → the audit is stale
    graft.sources.GraftCatalog.createBranch(t, "stale")
    spark.sql("INSERT INTO g20.db.wap VALUES (999, 999)")
    val ex = intercept[java.util.ConcurrentModificationException] {
      graft.sources.GraftCatalog.publishBranch(t, "stale")
    }
    assert(ex.getMessage.contains("moved"))
  }

  test("partition evolution: a new spec era applies to new writes " +
      "only, old files keep their layout, pruning works across " +
      "mixed eras, and the key-grouped claim stands down safely") {
    root
    spark.sql("CREATE TABLE g20.db.pev (p1 BIGINT, p2 BIGINT, " +
      "v BIGINT) PARTITIONED BY (p1)")
    // era 0: three p1 partitions, p2 scattered within each
    spark.sql("INSERT INTO g20.db.pev SELECT id % 3, id % 5, id " +
      "FROM range(0, 30, 1, 1)")
    val t = dir("pev")
    val eraFiles = Hook.manifestFiles(t, Hook.manifestVersions(t).max)
    assert(eraFiles.size == 3, s"3 p1 partitions expected: $eraFiles")
    // evolve: writes from now on cluster by p2 (SQL surface)
    val era = spark.sql(
      "CALL g20.system.evolve_partition('db.pev', 'p2')").collect()
    assert(era.head.getLong(0) == 1L && era.head.getString(1) == "p2")
    spark.sql("INSERT INTO g20.db.pev SELECT id % 3, id % 5, id " +
      "FROM range(30, 60, 1, 1)")
    val allFiles = Hook.manifestFiles(t, Hook.manifestVersions(t).max)
    val newFiles = allFiles.filterNot(eraFiles.contains)
    assert(newFiles.size == 5,
      s"new era must cluster by p2 (5 values): ${newFiles.size}")
    def keptGroups(pred: String): Int =
      spark.sql(s"SELECT p1, p2, v FROM g20.db.pev WHERE $pred")
        .rdd.getNumPartitions
    // mixed-era pruning: a p1 point keeps 1 old file + all 5 new;
    // a p2 point keeps 1 new file + all 3 old — each era prunes by
    // its own layout through the per-file stats
    assert(keptGroups("p1 = 1") == 1 + 5, s"p1 pruning across eras")
    assert(keptGroups("p2 = 2") == 3 + 1, s"p2 pruning across eras")
    // contents correct across eras
    assert(sqlRows("SELECT sum(v), count(*) FROM g20.db.pev").head ==
      Seq((0L until 60L).sum, 60L))
    // evolution is spec-validated and era-monotonic
    val ex = intercept[Exception] {
      spark.sql("CALL g20.system.evolve_partition('db.pev', 'nope')")
        .collect()
    }
    def msgs(e: Throwable): Seq[String] =
      if (e == null) Nil else Option(e.getMessage).toSeq ++ msgs(e.getCause)
    assert(msgs(ex).exists(_.contains("must be an existing")))
    // dropping partitioning is era 2
    val dropped = spark.sql(
      "CALL g20.system.evolve_partition('db.pev', NULL)").collect()
    assert(dropped.head.getLong(0) == 2L && dropped.head.isNullAt(1))
  }

  test("SQL procedures refuse path-traversal table names: '..', " +
      "empty segments, and separator-bearing segments never touch " +
      "the filesystem outside the catalog root") {
    root
    spark.sql("CREATE TABLE g20.db.safe (k BIGINT)")
    // a real table outside the catalog root that '..' would reach
    val outside = root.getParent.resolve(
      root.getFileName.toString + "_outside")
    Files.createDirectories(outside)
    Files.writeString(outside.resolve("schema.json"),
      Files.readString(dir("safe").resolve("schema.json")))
    for (bad <- Seq(s"../${outside.getFileName}", "db..safe",
        "/etc.passwd", "db./safe")) {
      val ex = intercept[Exception] {
        spark.sql(s"CALL g20.system.expire_snapshots('$bad', 1)").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(m => m.contains("malformed table name") ||
        m.contains("escapes the catalog root")),
        s"'$bad' must be refused by validation, got: ${msgs(ex)}")
    }
    // the legitimate two-segment form still resolves
    assert(spark.sql("CALL g20.system.history('db.safe')").collect()
      .nonEmpty)
  }
}
