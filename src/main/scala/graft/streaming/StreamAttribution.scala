package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** Streaming last-touch attribution — the continuous twin of the batch
  * `x57_attribution` readout: each purchase is credited, the moment it
  * arrives, to the latest PRECEDING non-purchase event by the same user
  * within a lookback horizon.
  *
  * Semantics contract (the reference engine's per-key processing model —
  * records of one key are folded in offset order): state is ONE
  * (channel, ts) pair per user, updated by every non-purchase event;
  * a purchase emits an [[Attribution]] row iff a source exists within
  * the lookback, and never mutates the state (two purchases in a row
  * both credit the same source, exactly as the batch window's
  * unbounded-to-−1 frame does). Rows inside a micro-batch are folded in
  * (ts, event_id) order, so intra-batch disorder cannot fork the
  * stream from the batch replay; cross-batch order is the arrival
  * order, as in the reference.
  *
  * Scale: state is one tiny tuple per live user — no growth with event
  * count; emission is append-only and join-free, so the operator
  * composes with any downstream windowed aggregation (e.g. per-channel
  * micro-unit sums, the x57 rollup) without re-shuffling: the output is
  * already keyed by the purchase row.
  */
object StreamAttribution {

  /** One event in the user activity stream (epoch-second event time). */
  case class ActivityEvent(user_id: Long, event_id: Long, ts_sec: Long,
                           event_type: String, value: Double)

  /** One credited purchase: `channel` is the attributed source type. */
  case class Attribution(user_id: Long, event_id: Long, channel: String,
                         src_ts: Long, ts_sec: Long, value: Double)

  private[streaming] case class LastSrc(channel: String, ts_sec: Long)

  private[streaming] class LastTouch(lookbackSec: Long)
      extends StatefulProcessor[Long, ActivityEvent, Attribution] {
    @transient private var last: ValueState[LastSrc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[LastSrc]("last",
        Encoders.product[LastSrc], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ActivityEvent],
                                 timers: TimerValues): Iterator[Attribution] = {
      // read-once / write-once (the StreamZScore discipline): fold the
      // latest source in a local, one state put per key per batch
      var src: Option[LastSrc] = if (last.exists()) Some(last.get()) else None
      val entry = src
      val out = Seq.newBuilder[Attribution]
      rows.toSeq.sortBy(r => (r.ts_sec, r.event_id)).foreach { r =>
        if (r.event_type != "purchase") src = Some(LastSrc(r.event_type, r.ts_sec))
        else src.foreach { s =>
          // gap >= 0 guards cross-batch disorder: a late purchase must
          // not credit a source that FOLLOWS it in event time (the batch
          // frame's unbounded-to-−1 shape makes src_ts <= ts_sec a
          // structural guarantee; the stream asserts it explicitly)
          val gap = r.ts_sec - s.ts_sec
          if (gap >= 0 && gap <= lookbackSec)
            out += Attribution(key, r.event_id, s.channel, s.ts_sec,
              r.ts_sec, r.value)
        }
      }
      if (src != entry) src.foreach(last.update)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Attribution] =
      Iterator.empty
  }

  /** Credit purchases against the latest preceding non-purchase event
    * within `lookbackSec` (default 7 days, the x57 window). */
  def lastTouch(input: Dataset[ActivityEvent],
                lookbackSec: Long = 604800L): Dataset[Attribution] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.groupByKey(_.user_id)
      .transformWithState(new LastTouch(lookbackSec),
        TimeMode.None(), OutputMode.Append())
  }
}
