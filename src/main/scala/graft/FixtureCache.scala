package graft

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

/** Stage-once cache for the connector-family test layouts (sorted
  * keyed CSV shards, replay segments): q375–q379 each re-derive a
  * disk layout from the corpus before the operator under test runs,
  * and at profiling SFs that staging write dominated the measured
  * time (r16 verdict: q379's 26× sf10 ratio was ~all staging) — so
  * layouts are staged once per (corpus fingerprint, layout key) into
  * a shared cache directory and reused read-only by every later run
  * in the same round.
  *
  *  - The FINGERPRINT is the (name, size, mtime) set of the corpus
  *    parquet files: a regenerated corpus gets a fresh cache entry,
  *    a stale one can never be served.
  *  - Publication is crash/race-safe: staging happens in a temp dir
  *    that is ATOMICALLY renamed into place only after a `.complete`
  *    marker is written inside it; concurrent stagers (parallel
  *    Verify workers) serialize in-JVM on a per-key lock, and a
  *    cross-JVM loser simply adopts the winner's directory.
  *  - Entries live under `SPARK_GRAFT_FIXTURE_CACHE` (if set) or the
  *    system temp dir; they are plain derived data, safe to delete
  *    any time no query is mid-run.
  *
  * Callers must treat the returned directory as READ-ONLY; per-run
  * mutable state (checkpoints, sink outputs) stays in per-run temp
  * dirs exactly as before.
  */
object FixtureCache {
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Count of layouts STAGED FRESH by this JVM (cache misses). Bench
    * snapshots it around each query so a re-fixture is labeled
    * `staged` in the artifact instead of reading as a plan
    * regression (q379/q390, round 18). */
  private val stagedFresh = new java.util.concurrent.atomic.AtomicInteger(0)
  def stagedSoFar: Int = stagedFresh.get()

  private def cacheRoot: Path = {
    val root = sys.env.get("SPARK_GRAFT_FIXTURE_CACHE").map(Paths.get(_))
      .getOrElse(Paths.get(sys.props("java.io.tmpdir"),
        s"graft-fixture-cache-${sys.props.getOrElse("user.name", "u")}"))
    Files.createDirectories(root)
    root
  }

  /** Corpus fingerprint: stable while the sf dir's parquet files are
    * byte-identical, different the moment any is regenerated. */
  private def fingerprint(sfDir: String): String = {
    val files = Option(new java.io.File(sfDir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val sig = files.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(sig.getBytes("UTF-8")).take(6)
      .map(b => f"$b%02x").mkString
  }

  /** Return the cached layout directory for (sfDir, key), staging it
    * via `stage` exactly once per corpus generation. */
  def staged(sfDir: String, key: String)(stage: Path => Unit): Path = {
    require(key.matches("[A-Za-z0-9_.-]+"), s"bad fixture key '$key'")
    val target = cacheRoot.resolve(s"$key-${fingerprint(sfDir)}")
    if (Files.exists(target.resolve(".complete"))) return target
    val lock = locks.computeIfAbsent(target.toString, _ => new Object)
    lock.synchronized {
      if (Files.exists(target.resolve(".complete"))) return target
      val tmp = Files.createTempDirectory(cacheRoot, s".stage-$key-")
      stagedFresh.incrementAndGet()
      try {
        stage(tmp)
        Files.writeString(tmp.resolve(".complete"), "")
        try Files.move(tmp, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: FileAlreadyExistsException |
               _: java.nio.file.DirectoryNotEmptyException =>
            // cross-JVM race: the winner's entry serves everyone
            graft.streaming.StreamingResidue.deleteRecursively(tmp)
            require(Files.exists(target.resolve(".complete")),
              s"fixture cache $target exists but is incomplete — " +
                "delete it and re-run")
        }
      } catch {
        case e: Throwable =>
          graft.streaming.StreamingResidue.deleteRecursively(tmp)
          throw e
      }
      target
    }
  }
}
