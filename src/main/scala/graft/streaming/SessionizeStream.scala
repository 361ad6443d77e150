package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState: the
  * custom-state path for semantics the built-in session_window can't
  * express (per-session derived fields, conditional emission, custom
  * merge logic).
  *
  * State = the open session per user; an event beyond the gap closes
  * and emits the previous session. EventTimeTimeout + watermark evict
  * state for idle users (bounded memory at scale — the state store
  * holds one OpenSession per active user, not per event).
  */
object SessionizeStream {

  final case class Event(user_id: Long, event_id: Long, ts_us: Long, value: Double)
  final case class OpenSession(start_us: Long, end_us: Long, n: Long, total: Double)
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, total_value: Double)

  val gapUs: Long = 1800L * 1000000L

  /** Process one user's new events against open-session state. Events
    * within a micro-batch are sorted by (ts, event_id) — streaming
    * gives no intra-batch order. */
  def updateUser(userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(Session(userId, s.start_us, s.end_us, s.n, s.total))
    }
    val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_us - s.end_us <= gapUs =>
          open = Some(OpenSession(s.start_us, e.ts_us, s.n + 1, s.total + e.value))
        case Some(s) =>
          closed += Session(userId, s.start_us, s.end_us, s.n, s.total)
          open = Some(OpenSession(e.ts_us, e.ts_us, 1L, e.value))
        case None =>
          open = Some(OpenSession(e.ts_us, e.ts_us, 1L, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      if (state.getOption.isDefined && eventTimeWatermarkSet(state))
        state.setTimeoutTimestamp(s.end_us / 1000 + gapUs / 1000)
    }
    closed.result().iterator
  }

  private def eventTimeWatermarkSet(state: GroupState[_]): Boolean =
    try { state.getCurrentWatermarkMs(); true } catch { case _: Throwable => false }

  /** Wire a streaming Dataset[Event] through the stateful sessionizer.
    * Caller supplies the stream (file source, MemoryStream in tests). */
  def sessions(events: Dataset[Event]): Dataset[Session] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros($"ts_us"))
      .withWatermark("ts", "1 hour")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(updateUser)
  }
}
