package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming OVER-window aggregation — the continuous twin of the batch
  * `x94_rolling_range` time-interval frame (Flink's
  * `OVER RANGE ... PRECEDING` on a stream; Spark has no native per-event
  * trailing-frame operator): every event emits, at arrival, the count
  * and exact micro-unit sum of the key's events inside the trailing
  * `horizonSec` frame `[ts − horizon, ts]` — including its same-second
  * peers, exactly the batch RANGE frame's peer rule.
  *
  * Ordering contract (shared with StreamFunnel/StreamZScore): per-key
  * event time is monotone ACROSS batches and same-second peers arrive
  * in ONE batch; inside a batch, (ts_sec, event_id) sorts. Under that
  * contract the emission for every event EQUALS the batch x94 row —
  * spec-pinned on the harness replay. (A RANGE frame includes peers, so
  * a same-second peer split across batches would need a retraction a
  * bounded stream cannot express; the contract is the price of
  * append-only output, same as the other twins.)
  *
  * State per live key: only the events inside the trailing horizon
  * (rate × horizon, pruned on every batch) — never the key's history. */
object StreamOverWindow {

  /** One event's trailing-frame readout at its arrival. */
  case class FrameAgg(user_id: Long, event_id: Long, ts_sec: Long,
                      cnt: Long, sum_micro: Long)

  /** One buffered event: (ts_sec, micro). */
  private[streaming] case class Ev(ts: Long, id: Long, micro: Long)

  private[streaming] class Roller(horizonSec: Long)
      extends StatefulProcessor[Long, (Long, Long, Long, Long), FrameAgg] {
    @transient private var buf: ValueState[Array[Ev]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getValueState[Array[Ev]]("buf",
        Encoders.kryo[Array[Ev]], TTLConfig.NONE)

    override def handleInputRows(key: Long,
                                 rows: Iterator[(Long, Long, Long, Long)],
                                 timers: TimerValues): Iterator[FrameAgg] = {
      val prev: Array[Ev] = if (buf.exists()) buf.get() else Array.empty
      val batch = rows.toSeq.sortBy(r => (r._3, r._2))
        .map(r => Ev(r._3, r._2, r._4))
      // one merged time-ordered view: frames read from it by two cursors
      val all = (prev ++ batch).sortBy(e => (e.ts, e.id))
      val out = Seq.newBuilder[FrameAgg]
      batch.foreach { e =>
        var cnt = 0L; var sum = 0L
        var i = 0
        while (i < all.length) {
          val x = all(i)
          if (x.ts >= e.ts - horizonSec && x.ts <= e.ts) { cnt += 1; sum += x.micro }
          i += 1
        }
        out += FrameAgg(key, e.id, e.ts, cnt, sum)
      }
      val maxTs = all.last.ts
      buf.update(all.filter(_.ts > maxTs - horizonSec))
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[FrameAgg] =
      Iterator.empty
  }

  /** Per-event trailing-`horizonSec` count + micro-sum per user.
    * Input tuple: (user_id, event_id, ts_sec, micro). */
  def rollingTotals(input: Dataset[(Long, Long, Long, Long)],
                    horizonSec: Long = 3600L): Dataset[FrameAgg] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.groupByKey(_._1)
      .transformWithState(new Roller(horizonSec),
        TimeMode.None(), OutputMode.Append())
  }
}
