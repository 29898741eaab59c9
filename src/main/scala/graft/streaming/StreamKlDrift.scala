package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming language-drift monitor — the continuous twin of the batch
  * `x78_source_kl` diagnostic: per monitored group (source, language,
  * tenant …), fold each arriving document's tokens into the group's
  * running unigram counts and emit KL(p_observed ‖ q_baseline) after
  * every document, with an alarm once the divergence crosses the
  * threshold. The baseline q is a FROZEN reference distribution (the
  * corpus model x78 computes, or a calibration window) passed in as a
  * plain map — scoring live data against a model refit on that same
  * live data would let drift tune itself invisible (the StreamCusum
  * frozen-baseline contract).
  *
  * Stream ≡ batch is EXACT: the emitted KL after document d equals the
  * batch KL over the group's full token prefix through d, because the
  * state carries raw integer counts and the divergence is recomputed
  * from them at emission in SORTED word order (map iteration order
  * would fork the double sum), rounded at 6 only on the way out.
  * Spec-pinned against a plain-Scala prefix replay.
  *
  * Scale: state per group is its observed vocabulary's (word, count)
  * map — vocabulary-bounded, not stream-bounded (the x78 scale
  * argument); emission cost is one pass over that vocabulary, so this
  * monitor suits group counts in the thousands with vocabularies in the
  * tens of thousands, not per-user keys (use StreamCusum/StreamZScore
  * for high-cardinality scalar monitors). Unknown words score against
  * `oovProb` (the baseline's smoothed unseen mass) so a vocabulary
  * shift — the classic drift signature — raises KL instead of crashing
  * the log. */
object StreamKlDrift {

  /** One tokenized document of a monitored group. */
  case class TokDoc(group: String, seq_id: Long, ts_sec: Long,
                    tokens: Seq[String])

  /** The divergence trajectory: `kl` is KL(observed ‖ baseline) after
    * folding this document; `alarm` fires on kl > threshold. */
  case class KlPoint(group: String, seq_id: Long, ts_sec: Long,
                     n_tokens: Long, kl: Double, alarm: Boolean)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Plain-Scala KL over integer counts vs the baseline — shared by the
    * processor and the spec replay so the definition cannot fork. */
  private[streaming] def klOf(counts: Iterable[(String, Long)], total: Long,
                              baseline: Map[String, Double],
                              oovProb: Double): Double = {
    val n = total.toDouble
    counts.toSeq.sortBy(_._1).iterator.map { case (w, c) =>
      val p = c / n
      p * math.log(p / baseline.getOrElse(w, oovProb))
    }.sum
  }

  private[streaming] class Monitor(baseline: Map[String, Double],
                                   oovProb: Double, threshold: Double)
      extends StatefulProcessor[String, TokDoc, KlPoint] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var total: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      total = getHandle.getValueState[Long]("total",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[TokDoc],
                                 timers: TimerValues): Iterator[KlPoint] = {
      var n = if (total.exists()) total.get() else 0L
      val out = Seq.newBuilder[KlPoint]
      rows.toSeq.sortBy(r => (r.ts_sec, r.seq_id)).foreach { r =>
        r.tokens.foreach { w =>
          counts.updateValue(w,
            (if (counts.containsKey(w)) counts.getValue(w) else 0L) + 1L)
        }
        n += r.tokens.size
        val kl =
          if (n == 0L) 0.0
          else klOf(counts.iterator().toSeq, n, baseline, oovProb)
        out += KlPoint(key, r.seq_id, r.ts_sec, n, round6(kl),
          round6(kl) > threshold)
      }
      total.update(n)
      out.result().iterator
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[KlPoint] =
      Iterator.empty
  }

  /** Monitor a tokenized-document stream against a frozen baseline
    * unigram distribution (word → probability); words outside the
    * baseline score against `oovProb`. */
  def monitor(input: Dataset[TokDoc], baseline: Map[String, Double],
              oovProb: Double, threshold: Double = 0.5): Dataset[KlPoint] = {
    require(oovProb > 0.0 && oovProb < 1.0, s"oovProb in (0,1), got $oovProb")
    val spark = input.sparkSession
    import spark.implicits._
    input.groupByKey(_.group)
      .transformWithState(new Monitor(baseline, oovProb, threshold),
        TimeMode.None(), OutputMode.Append())
  }
}
