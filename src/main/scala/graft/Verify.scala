package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd+ args: restrict to named queries (local dev loop);
    // the driver always invokes with exactly (sfDir, outDir) → full run
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args.drop(2).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // extension surface installed exactly as a production deployment
      // would (spark.sql.extensions): SQL-function registry + the
      // conf-gated RangeJoinRewrite rule (off unless a query opts in)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val declared = SparkEntry.queries.keySet
      .filter(name => only.forall(_.contains(name)))
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release operator-internal caches between queries (same hygiene
      // as Bench: a 56-query session must not accumulate blocks)
      CacheRegistry.releaseAll()
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Declared-vs-reported audit (round-9 lesson): an erroring query is
    // simply ABSENT from the correctness file, so a shrinking registry
    // can read as all-green. Diff the declared query set against what
    // was actually written and shout any gap — on BOTH stdout and
    // stderr, so it survives either stream being filtered.
    val written = declared -- failed
    val missing = (declared -- written).toSeq.sorted
    val noOracle = (declared -- SparkEntry.oracleSql.keySet).toSeq.sorted
    val audit = s"[verify] AUDIT: declared=${declared.size} " +
      s"written=${written.size} failed=${missing.size}" +
      (if (missing.nonEmpty) s" MISSING=${missing.mkString(",")}" else "") +
      (if (noOracle.nonEmpty) s" rows-only(no oracle)=${noOracle.mkString(",")}" else "")
    println(audit)
    if (missing.nonEmpty) System.err.println(audit)
    // session-hygiene evidence: after the whole registry ran with
    // per-query releaseAll, nothing may remain pinned in the JVM —
    // the r4 bench band came from exactly this kind of residue
    println(s"[verify] residue: tracked=${CacheRegistry.trackedCount} " +
      s"persistentRdds=${spark.sparkContext.getPersistentRDDs.size}")
    spark.stop()
  }
}
