package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Emit-on-close tumbling windows via '''event-time timers''' — the
  * reference's `emitStrategy(EmitStrategy.onWindowClose())` /
  * `suppress(untilWindowCloses)` (reference
  * `apps/WindowedGroupAtClose.scala:33`, `TopologiesTest.scala:522,542`;
  * SURVEY.md §2.4 W4/W5) reproduced with its exact trigger mechanics:
  *
  * each (key, window) registers a timer at the window end; the timer
  * fires when the '''watermark''' passes it, which with watermark delay =
  * grace is precisely the reference's close rule "stream time > window
  * end + grace" (`apps/WindowedGrouping.scala:25-37`). One emission per
  * window, containing the final count; state is freed in the same step.
  *
  * The built-in `window() + append-mode` path ([[WindowedStreams]])
  * reaches the same output through Spark's aggregate eviction; this
  * operator exists for aggregates the built-in can't express (emit-time
  * side effects, composite non-algebraic state) and as the direct
  * TWS-timer embodiment of the reference's close semantics — the two are
  * spec-asserted to agree.
  *
  * Scale: state is one counter + one timer per live (key, window),
  * hash-spread; both are freed at close, so state size tracks the live
  * window horizon, not history.
  */
object TimerWindows {

  /** One closed window's final count. */
  case class WindowCount(key: String, win_start: Long, cnt: Long)

  private[streaming] case class EvRec(key: String, ts: Long, seq: Long,
                                      ets: java.sql.Timestamp)

  private[streaming] class CloseEmitCount(sizeMs: Long)
      extends StatefulProcessor[(String, Long), EvRec, WindowCount] {
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (String, Long), rows: Iterator[EvRec],
                                 timers: TimerValues): Iterator[WindowCount] = {
      if (!cnt.exists()) getHandle.registerTimer(key._2 + sizeMs)
      cnt.update((if (cnt.exists()) cnt.get() else 0L) + rows.size)
      Iterator.empty
    }

    override def handleExpiredTimer(key: (String, Long), timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[WindowCount] = {
      val c = if (cnt.exists()) cnt.get() else 0L
      cnt.clear()
      if (c == 0) Iterator.empty else Iterator.single(WindowCount(key._1, key._2, c))
    }
  }

  /** Tumbling per-key counts emitted once, at window close (watermark
    * passes window end; `grace` = watermark delay = allowed lateness). */
  def tumblingCountsOnClose(input: Dataset[Rec], sizeMs: Long,
                            grace: String): Dataset[WindowCount] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", grace)
      .as[EvRec]
      .groupByKey(r => (r.key, r.ts - math.floorMod(r.ts, sizeMs)))
      .transformWithState(new CloseEmitCount(sizeMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
