package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-user inter-event gap telemetry on the Spark 4.x
  * `transformWithState` operator — the NEW arbitrary-stateful API
  * (StatefulProcessor + typed state variables) rather than the
  * classic `flatMapGroupsWithState` the rest of the streaming tier
  * uses. Two state variables, both essential across micro-batches:
  *
  *  - `prev: ValueState[Long]` — the user's latest event time; the
  *    first event of every later batch computes its gap against THIS,
  *    so batch-boundary gaps are decided by checkpointed state.
  *  - `seen: MapState[String, Long]` — per-(user, event_type) counts;
  *    the "first event of its type for this user" flag must consult
  *    cross-batch history or later batches would re-flag.
  *
  * Output is per-(user, type) PARTIALS per micro-batch (the q276
  * lesson: never per-event rows through a memory sink), aggregated by
  * the caller with sum/sum/sum/max — all merge-safe across batches.
  * State is 8 bytes + one long per distinct type per user regardless
  * of history length — the unbounded-stream shape. Requires the
  * RocksDB state store provider (a transformWithState constraint —
  * and the backend a 100 TB deployment runs anyway).
  */
object GapStream {

  case class Ev(user_id: Long, event_id: Long, event_type: String,
      ts_us: Long)
  case class Partial(user_id: Long, event_type: String, n_events: Long,
      n_gaps: Long, sum_gap_us: Long, max_gap_us: Long, n_first: Long)

  /** Accumulates gap stats for one user's sorted batch slice. */
  class GapProcessor extends StatefulProcessor[Long, Ev, Partial] {
    @transient private var prev: ValueState[Long] = _
    @transient private var seen: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      prev = getHandle.getValueState[Long]("prev", Encoders.scalaLong,
        TTLConfig.NONE)
      seen = getHandle.getMapState[String, Long]("seen", Encoders.STRING,
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Partial] = {
      // micro-batch iterators carry no order; the caller stages input
      // event-time-monotone across batches (see q277), so sorting
      // WITHIN the batch restores the global per-user order
      val evs = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      var last = if (prev.exists()) prev.get() else Long.MinValue
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, (Long, Long, Long, Long, Long)]
      evs.foreach { e =>
        val isFirstOfType =
          !acc.contains(e.event_type) && !seen.containsKey(e.event_type)
        val (n, g, s, m, f) =
          acc.getOrElse(e.event_type, (0L, 0L, 0L, 0L, 0L))
        val (g2, s2, m2) =
          if (last == Long.MinValue) (g, s, m)
          else (g + 1, s + (e.ts_us - last), math.max(m, e.ts_us - last))
        val f2 = if (isFirstOfType) f + 1 else f
        acc.update(e.event_type, (n + 1, g2, s2, m2, f2))
        last = e.ts_us
      }
      evs.groupBy(_.event_type).foreach { case (tpe, es) =>
        val prior = if (seen.containsKey(tpe)) seen.getValue(tpe) else 0L
        seen.updateValue(tpe, prior + es.size)
      }
      if (last != Long.MinValue) prev.update(last)
      acc.iterator.map { case (tpe, (n, g, s, m, f)) =>
        Partial(user, tpe, n, g, s, m, f)
      }
    }
  }

  def gapStats(events: Dataset[Ev]): Dataset[Partial] = {
    implicit val outEnc: Encoder[Partial] = Encoders.product[Partial]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new GapProcessor, TimeMode.None(),
        OutputMode.Append())
  }
}
