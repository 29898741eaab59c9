package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming event-type transition extraction — the continuous twin of
  * the batch `x54_markov_transitions` pair generator: every event emits
  * the (from, to) adjacent-type pair with its predecessor in the same
  * user's stream, the moment it arrives. Downstream, a standard
  * update-mode `groupBy(from_type, to_type).count()` maintains the
  * live transition matrix (the x54 readout) — the pair extraction is
  * the only stateful step, so the matrix aggregation composes with any
  * windowing the monitor wants.
  *
  * Per-key processing order is the reference engine's contract: rows
  * inside a micro-batch fold in (ts, event_id) order; cross-batch order
  * is arrival order (the StreamAttribution discipline, incl. one state
  * read + at most one write per key per batch).
  *
  * Scale: state is ONE (type, ts) tuple per live user — identical
  * asymptotics to the batch query's user-partitioned `lead()` window. */
object StreamTransitions {

  /** One event of the monitored stream. */
  case class UserEvent(user_id: Long, event_id: Long, ts_sec: Long,
                       event_type: String)

  /** One observed transition: `to_event_id` is the event that completed
    * the pair (its predecessor's type is `from_type`). */
  case class Transition(user_id: Long, from_type: String, to_type: String,
                        to_event_id: Long, ts_sec: Long)

  private[streaming] case class LastEv(event_type: String, ts_sec: Long)

  private[streaming] class Extractor
      extends StatefulProcessor[Long, UserEvent, Transition] {
    @transient private var last: ValueState[LastEv] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[LastEv]("last",
        Encoders.product[LastEv], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timers: TimerValues): Iterator[Transition] = {
      var prev: Option[LastEv] = if (last.exists()) Some(last.get()) else None
      val entry = prev
      val out = Seq.newBuilder[Transition]
      rows.toSeq.sortBy(r => (r.ts_sec, r.event_id)).foreach { r =>
        prev.foreach { p =>
          out += Transition(key, p.event_type, r.event_type, r.event_id, r.ts_sec)
        }
        prev = Some(LastEv(r.event_type, r.ts_sec))
      }
      if (prev != entry) prev.foreach(last.update)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Transition] =
      Iterator.empty
  }

  /** Adjacent-type transition pairs per user, in processing order. */
  def transitions(input: Dataset[UserEvent]): Dataset[Transition] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.groupByKey(_.user_id)
      .transformWithState(new Extractor, TimeMode.None(), OutputMode.Append())
  }
}
