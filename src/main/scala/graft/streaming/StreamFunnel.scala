package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming conversion funnel — the continuous twin of the batch
  * `x43_funnel` stages: per user, stage k completes at the FIRST event
  * of its type with ts STRICTLY after stage k−1's completion (stage 0 at
  * the user's first event of the entry type). A `StageReached` row is
  * emitted the moment each stage first completes; a per-stage count
  * aggregate downstream is x43's live `n_users` column.
  *
  * Per-key processing order is the contract shared with the other
  * stateful twins (StreamAttribution, StreamZScore): rows inside a
  * micro-batch fold in (ts_sec, event_id) order; cross-batch order is
  * arrival order. Under time-ordered arrival the fold is EXACTLY the
  * batch fixpoint — "first view" is min(view ts), "first click after
  * t0" is the first qualifying click the ordered scan meets — and the
  * equivalence is spec-pinned against x43 on the harness replay. (A
  * batch engine can rewind when a pre-t0 view arrives late; a bounded
  * stream cannot, which is why order is a contract, not best-effort.)
  *
  * Scale: state is ≤ |stages| longs per live user — no event buffer,
  * no per-stage sets; TTL/retention policy can bound the live-user set
  * the same way the other per-user twins do. */
object StreamFunnel {

  /** One funnel-relevant event. */
  case class FunnelEvent(user_id: Long, event_type: String, ts_sec: Long,
                         event_id: Long)

  /** Stage `stage` (1-based label like "1_view") first completed for
    * `user_id` at `ts_sec`. */
  case class StageReached(user_id: Long, stage: String, ts_sec: Long)

  private[streaming] class Tracker(stages: IndexedSeq[String])
      extends StatefulProcessor[Long, FunnelEvent, StageReached] {
    @transient private var reached: ValueState[Array[Long]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      reached = getHandle.getValueState[Array[Long]]("reached",
        Encoders.kryo[Array[Long]], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
                                 timers: TimerValues): Iterator[StageReached] = {
      // ts of each completed stage; -1 = not reached
      val ts = if (reached.exists()) reached.get()
               else Array.fill(stages.length)(-1L)
      val out = Seq.newBuilder[StageReached]
      rows.toSeq.sortBy(r => (r.ts_sec, r.event_id)).foreach { r =>
        val next = ts.indexOf(-1L)
        if (next >= 0 && r.event_type == stages(next) &&
            (next == 0 || r.ts_sec > ts(next - 1))) {
          ts(next) = r.ts_sec
          out += StageReached(key, s"${next + 1}_${stages(next)}", r.ts_sec)
        }
      }
      reached.update(ts)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[StageReached] =
      Iterator.empty
  }

  /** Track first-completion of each funnel stage per user; defaults
    * mirror x43's view → click → purchase ladder. */
  def stages(input: Dataset[FunnelEvent],
             ladder: Seq[String] = Seq("view", "click", "purchase")): Dataset[StageReached] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.groupByKey(_.user_id)
      .transformWithState(new Tracker(ladder.toIndexedSeq),
        TimeMode.None(), OutputMode.Append())
  }
}
