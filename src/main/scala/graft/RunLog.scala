package graft

import java.nio.file.{Files, Path, Paths}
import java.time.{Clock, ZonedDateTime}
import java.time.format.DateTimeFormatter

/** S6 (file half) — the reference's per-run dated log sink
  * (`/root/reference/one_one_one_rule/pipeline_job.py:65-79,98-101`):
  * one file per business date at `<logDir>/<prefix>_<asOfDate>.log`,
  * each line `<asctime> | <LEVEL> | <message>` (Python logging's
  * default asctime rendering, comma-millis), mirrored to the console
  * like the reference's stream handler. Clock injected so lines are
  * deterministic in tests (SURVEY.md §7.3 risk 6).
  */
final class RunLog(val path: Path, clock: Clock, echo: Boolean = true) {

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss,SSS")

  private def write(level: String, msg: String): Unit = {
    val line =
      s"${ZonedDateTime.now(clock).format(fmt)} | $level | $msg"
    Files.writeString(path, line + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    if (echo) println(line)
  }

  def info(msg: String): Unit = write("INFO", msg)
  def warning(msg: String): Unit = write("WARNING", msg)
  def error(msg: String): Unit = write("ERROR", msg)
}

object RunLog {

  /** `_setup_logger` + the dated-name construction
    * (`pipeline_job.py:98-101`): creates the log dir, returns a logger
    * appending to `<prefix>_<asOfDate>.log`. */
  def dated(logDir: String, prefix: String, asOfDate: String,
      clock: Clock, echo: Boolean = true): RunLog = {
    val dir = Paths.get(logDir)
    Files.createDirectories(dir)
    new RunLog(dir.resolve(s"${prefix}_$asOfDate.log"), clock, echo)
  }

  /** Settings-driven optional construction: None when no logDir is
    * configured (file logging off, console perf lines only). */
  def fromSettings(s: Settings, asOfDate: String, clock: Clock,
      echo: Boolean = true): Option[RunLog] =
    s.logDir.map(dated(_, s.logFilePrefix, asOfDate, clock, echo))
}
