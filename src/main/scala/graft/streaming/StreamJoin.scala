package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the remaining streaming
  * primitive after aggregation, sessionization, and dedup: correlate
  * two live event streams (view→purchase, request→response,
  * impression→click) where the right event must follow the left
  * within a time window.
  *
  * State design (what makes this runnable forever): both sides carry
  * watermarks and the join condition bounds `r.ts` to
  * [l.ts, l.ts + window], so Spark derives state-eviction watermarks
  * for BOTH sides — a left row is dropped from state once the right
  * watermark passes l.ts + window (no right match can arrive anymore),
  * and symmetrically. Without the time-range bound the state grows
  * forever; with it, state is proportional to the window, not the
  * stream history.
  */
object StreamJoin {

  /** Inner interval join: rows (l, r) with equal `keyCol` and
    * `r.ts` in [l.ts, l.ts + window]. Both inputs need a `ts`
    * timestamp column; output carries the key, both timestamps and
    * both payload ids. */
  def within(left: DataFrame, right: DataFrame, keyCol: String,
      window: String, watermarkDelay: String): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay).alias("l")
    val r = right.withWatermark("ts", watermarkDelay).alias("r")
    l.join(r,
      expr(s"l.$keyCol = r.$keyCol AND " +
        s"r.ts >= l.ts AND r.ts <= l.ts + INTERVAL $window"))
      .select(col(s"l.$keyCol").as(keyCol),
        col("l.event_id").as("left_id"), col("l.ts").as("left_ts"),
        col("r.event_id").as("right_id"), col("r.ts").as("right_ts"))
  }
}
