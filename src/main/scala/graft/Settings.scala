package graft

import java.time.{Clock, ZoneId, ZonedDateTime}
import java.time.format.DateTimeFormatter
import graft.functions.ValuationThresholds

/** Typed run configuration, mirroring the reference's env-backed
  * dataclass (`/root/reference/one_one_one_rule/settings.py:22-114`):
  * string/bool/double fields with defaults, parsed from a key-value
  * map (.env equivalent). Drive-upload keys (`DRIVE_FOLDER_ID`,
  * `DRIVE_CONVERT_TO_SHEETS`) are consumed from the merged env by
  * [[UploadCli]] against the S5 analog `sources.LocalDrive` ([[Job]]
  * takes its drive root as a parameter); they are not part of this
  * typed core.
  */
final case class Settings(
    timezone: String = "Asia/Bangkok",          // settings.py:56
    outputDir: String = "data",                 // settings.py:57
    latestName: String = "nasdaq100_valuations_latest.csv",
    writeDatedCopy: Boolean = true,             // pipeline_job.py:130-142
    logDir: Option[String] = None,              // settings.py:49, pipeline_job.py:98
    logFilePrefix: String = "pipeline",         // settings.py:50
    thresholds: ValuationThresholds = ValuationThresholds())

object Settings {

  /** Parse from an env-style map; malformed numerics fall back to the
    * default (the reference's lenient load, `settings.py:66-114`). */
  def fromEnv(env: Map[String, String]): Settings = {
    def d(key: String, default: Double): Double =
      env.get(key).flatMap(_.toDoubleOption).getOrElse(default)
    // the reference's truthy set (`settings.py:14-19`)
    def b(key: String, default: Boolean): Boolean =
      env.get(key).map(v =>
        Set("1", "true", "yes", "y", "on")
          .contains(v.trim.toLowerCase(java.util.Locale.ROOT)))
        .getOrElse(default)
    Settings(
      timezone = env.getOrElse("PIPELINE_TZ", "Asia/Bangkok"),
      outputDir = env.getOrElse("OUTPUT_DIR", "data"),
      latestName = env.getOrElse("LATEST_NAME", "nasdaq100_valuations_latest.csv"),
      writeDatedCopy = b("WRITE_DATED_COPY", default = true),
      logDir = env.get("LOG_DIR").filter(_.nonEmpty),
      logFilePrefix = env.getOrElse("LOG_FILE_PREFIX", "pipeline"),
      thresholds = ValuationThresholds(
        undervalued = d("UNDERVALUED_THRESHOLD", 0.90),
        overvalued = d("OVERVALUED_THRESHOLD", 1.10),
        pegMax = d("PEG_MAX", 1.0),
        peSectorMaxMult = d("PE_SECTOR_MAX_MULT", 1.0),
        marginOfSafetyMin = d("MARGIN_OF_SAFETY_MIN", 0.0)))
  }

  /** E11 — business date in the configured timezone
    * (`pipeline_job.py:85-89`): the calendar date where the market
    * pipeline runs, not UTC. Clock injected for determinism
    * (SURVEY.md §7.3 risk 6 — never wall-clock in tested paths). */
  def businessDate(s: Settings, clock: Clock): String =
    ZonedDateTime.now(clock.withZone(ZoneId.of(s.timezone)))
      .format(DateTimeFormatter.ISO_LOCAL_DATE)

  /** E11 — run timestamp: UTC, second precision, `Z` suffix
    * (`pipeline_job.py:90-95`). */
  def runTsUtc(clock: Clock): String =
    ZonedDateTime.now(clock.withZone(ZoneId.of("UTC")))
      .format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'"))

  /** Dated copy filename (`pipeline_job.py:136-140`). */
  def datedName(businessDate: String): String =
    s"nasdaq100_valuations_$businessDate.csv"

  /** .env file parser (the reference loads `config/.env` via
    * python-dotenv with `override=False`, `settings.py:5-10`):
    * KEY=VALUE lines; blank lines and `#` comments ignored; optional
    * `export ` prefix; single/double quotes stripped; malformed lines
    * skipped. Returns only the file's pairs — compose with the real
    * environment via [[fromEnvFile]]. */
  def parseDotEnv(content: String): Map[String, String] =
    content.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map(_.stripPrefix("export ").trim)
      .flatMap { l =>
        val i = l.indexOf('=')
        val k = l.take(i).trim
        var v = l.drop(i + 1).trim
        if (v.length >= 2 &&
            ((v.head == '"' && v.last == '"') ||
              (v.head == '\'' && v.last == '\'')))
          v = v.substring(1, v.length - 1)
        if (k.nonEmpty) Some(k -> v) else None
      }.toMap

  /** Load settings from a .env file, with `override=False` semantics:
    * pairs already present in `env` (the process environment) win over
    * the file's (`settings.py:10`). A missing file contributes
    * nothing, like python-dotenv. */
  def fromEnvFile(path: java.nio.file.Path,
      env: Map[String, String] = sys.env): Settings =
    fromEnv(envWithDotEnv(path, env))

  /** The merged raw key-value view (.env pairs overlaid by the process
    * environment, `override=False`) — for keys outside the typed core,
    * e.g. `DRIVE_FOLDER_ID` in [[UploadCli]]. */
  def envWithDotEnv(path: java.nio.file.Path,
      env: Map[String, String] = sys.env): Map[String, String] = {
    val fileVars =
      if (java.nio.file.Files.exists(path))
        parseDotEnv(java.nio.file.Files.readString(path))
      else Map.empty[String, String]
    fileVars ++ env
  }
}
