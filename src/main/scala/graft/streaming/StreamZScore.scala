package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming rolling z-score anomaly monitor — the continuous twin of
  * the batch `x53_rolling_zscore` readout: each arriving event is
  * scored against the mean/std of the 20 PRECEDING same-type events,
  * and |z| > 3 emits an alert the moment the event lands.
  *
  * Arithmetic is the x53 closed form verbatim: variance from explicit
  * (Σv, Σv²) sums ROUNDED AT 6 before the sqrt/divide, z rounded at 4 —
  * so a batch replay of the same record order produces the identical
  * alert set (spec-pinned). The window excludes the current event (it
  * must not shift its own baseline), and EVERY event enters the buffer
  * afterwards — anomalies included, exactly like the batch frame.
  *
  * Per-key processing order is the reference engine's contract: rows
  * inside a micro-batch fold in (ts, event_id) order; cross-batch order
  * is arrival order.
  *
  * Scale: state is a ≤ 20-value ring per event TYPE — type cardinality
  * bounds both state and parallelism, matching the batch query's
  * type-partitioned window. */
object StreamZScore {

  /** One event of the monitored stream. */
  case class TypedValue(event_type: String, event_id: Long, ts_sec: Long,
                        value: Double)

  /** One anomaly alert: `z` is the rounded score that tripped. */
  case class Anomaly(event_type: String, event_id: Long, ts_sec: Long,
                     value: Double, z: Double)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private[streaming] class Scorer(windowSize: Int, threshold: Double)
      extends StatefulProcessor[String, TypedValue, Anomaly] {
    @transient private var buf: ListState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[Double]("buf",
        Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TypedValue],
                                 timers: TimerValues): Iterator[Anomaly] = {
      var window = buf.get().toVector
      val out = Seq.newBuilder[Anomaly]
      rows.toSeq.sortBy(r => (r.ts_sec, r.event_id)).foreach { r =>
        if (window.size == windowSize) {
          // the x53 closed form, identical rounding points
          val sv = window.sum
          val sv2 = window.map(v => v * v).sum
          val mean = sv / windowSize
          val varr = round6(sv2 / windowSize - mean * mean)
          if (varr > 0) {
            val z = round4((r.value - mean) / math.sqrt(varr))
            if (math.abs(z) > threshold)
              out += Anomaly(key, r.event_id, r.ts_sec, r.value, z)
          }
        }
        window = (window :+ r.value).takeRight(windowSize)
      }
      buf.put(window.toArray)
      out.result().iterator
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Anomaly] =
      Iterator.empty
  }

  /** Score a typed value stream; defaults mirror x53 (20-event baseline,
    * |z| > 3). */
  def anomalies(input: Dataset[TypedValue], windowSize: Int = 20,
                threshold: Double = 3.0): Dataset[Anomaly] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.groupByKey(_.event_type)
      .transformWithState(new Scorer(windowSize, threshold),
        TimeMode.None(), OutputMode.Append())
  }
}
