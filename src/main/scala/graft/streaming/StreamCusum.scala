package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming CUSUM mean-shift monitor — the continuous twin of the batch
  * `x65_cusum` series: each arriving point extends the standardized
  * cumulative deviation S = Σ(x − μ)/σ for its series, emitted the
  * moment the point lands, with an alarm when |S| crosses the decision
  * threshold.
  *
  * (μ, σ) are REFERENCE parameters per series (fit on history — x65's
  * stats aggregate, or a calibration window), passed in as a plain map:
  * an online detector scores against a frozen baseline; refitting the
  * baseline on the data being monitored would let a slow drift tune
  * itself invisible.
  *
  * Stream ≡ batch is EXACT, not approximate: the state carries the raw
  * running Σ(x − μ) and the division by σ + round-at-6 happen only at
  * emission — the identical double sequence as the batch day-ordered
  * cumulative window, provided points arrive in the batch's (ts, seq)
  * order (intra-batch rows are folded in that order; cross-batch order
  * is arrival order, the reference engine's contract). Spec-pinned
  * against a replay of the x65 daily series.
  *
  * Scale: state is ONE double per live series — cardinality of the
  * series key bounds state; no window buffer exists at all (CUSUM is
  * the constant-memory changepoint detector, which is why it is the
  * streaming-native choice over batch windows). */
object StreamCusum {

  /** One observed point of a monitored series. */
  case class Point(series: String, seq_id: Long, ts_sec: Long, value: Double)

  /** The extended CUSUM series: `s` is the standardized cumulative
    * deviation after this point; `alarm` fires on |s| > threshold. */
  case class CusumPoint(series: String, seq_id: Long, ts_sec: Long,
                        value: Double, s: Double, alarm: Boolean)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private[streaming] class Monitor(params: Map[String, (Double, Double)],
                                   threshold: Double)
      extends StatefulProcessor[String, Point, CusumPoint] {
    @transient private var acc: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[Double]("acc",
        Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Point],
                                 timers: TimerValues): Iterator[CusumPoint] =
      params.get(key) match {
        case None => Iterator.empty // unconfigured series: not monitored
        case Some((mu, sigma)) =>
          var sum = if (acc.exists()) acc.get() else 0.0
          val out = Seq.newBuilder[CusumPoint]
          rows.toSeq.sortBy(r => (r.ts_sec, r.seq_id)).foreach { r =>
            sum += r.value - mu
            val s = round6(sum / sigma)
            out += CusumPoint(key, r.seq_id, r.ts_sec, r.value, s,
              math.abs(s) > threshold)
          }
          acc.update(sum)
          out.result().iterator
      }

    override def handleExpiredTimer(key: String, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[CusumPoint] =
      Iterator.empty
  }

  /** Monitor a point stream against frozen per-series (μ, σ) baselines;
    * series without parameters are passed through unmonitored. */
  def monitor(input: Dataset[Point], params: Map[String, (Double, Double)],
              threshold: Double = 5.0): Dataset[CusumPoint] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.groupByKey(_.series)
      .transformWithState(new Monitor(params, threshold),
        TimeMode.None(), OutputMode.Append())
  }
}
