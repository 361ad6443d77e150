package graft.queries

import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.streaming.StreamingOps

/** Streaming query inventory. Each runs a real Structured Streaming
  * query to completion (Trigger.AvailableNow) and returns the final
  * result table; the oracle is the equivalent batch SQL — streaming
  * and batch must agree exactly.
  */
object StreamingQueries {

  /** q40 — streaming hourly window aggregation == batch q14. */
  val q40 = QuerySpec("q40_stream_hourly",
    (s, dir) => StreamingOps.hourlyEventStats(s, dir)
      .orderBy("hour", "event_type"),
    Some("""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS total_value,
  CAST(round(sum(CAST(value AS DECIMAL(28,10))) / count(*), 6) AS DOUBLE) AS avg_value
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""))

  val all: Seq[QuerySpec] = Seq(q40)
}
