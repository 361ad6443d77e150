package graft

import java.time.{Clock, Instant, ZoneId}
import org.scalatest.funsuite.AnyFunSuite

/** Settings parsing + E11 date derivation (no Spark needed). */
class SettingsSpec extends AnyFunSuite {

  test("env parsing: defaults, overrides, malformed → default") {
    val s = Settings.fromEnv(Map(
      "PIPELINE_TZ" -> "America/New_York",
      "UNDERVALUED_THRESHOLD" -> "0.85",
      "PEG_MAX" -> "not_a_number",
      "WRITE_DATED_COPY" -> "false"))
    assert(s.timezone == "America/New_York")
    assert(s.thresholds.undervalued == 0.85)
    assert(s.thresholds.pegMax == 1.0) // malformed falls back
    assert(!s.writeDatedCopy)
    assert(Settings.fromEnv(Map.empty).timezone == "Asia/Bangkok")
  }

  test("E11: business date follows the configured tz, run ts is UTC/Z") {
    // 2026-08-12 23:30 UTC = 2026-08-13 06:30 in Bangkok (UTC+7)
    val clock = Clock.fixed(Instant.parse("2026-08-12T23:30:00Z"), ZoneId.of("UTC"))
    val bkk = Settings(timezone = "Asia/Bangkok")
    val utc = Settings(timezone = "UTC")
    assert(Settings.businessDate(bkk, clock) == "2026-08-13")
    assert(Settings.businessDate(utc, clock) == "2026-08-12")
    assert(Settings.runTsUtc(clock) == "2026-08-12T23:30:00Z")
    assert(Settings.datedName("2026-08-13") == "nasdaq100_valuations_2026-08-13.csv")
  }
}
