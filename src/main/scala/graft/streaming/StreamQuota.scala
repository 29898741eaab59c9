package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming per-source ingestion quota — the continuous twin of the
  * batch `x69_source_cap` idea at the point where it actually has to
  * live in an ingest pipeline: an arriving document passes while its
  * source is under quota and is dropped once the cap is reached. The
  * batch cap ranks by quality because it sees the whole corpus; a
  * stream cannot rank what it has not seen, so the streaming contract
  * is ARRIVAL-order admission (first `cap` per source) — the honest
  * online counterpart, spec-pinned equal to a batch replay of the same
  * rule (row_number over (ts, doc_id) per source ≤ cap).
  *
  * Per-key processing order is the stateful-twin contract shared with
  * StreamZScore/StreamFunnel: rows inside a micro-batch fold in
  * (ts_sec, doc_id) order; cross-batch order is arrival order.
  *
  * Scale: state is ONE long per source — the admitted count. Source
  * cardinality bounds both state and parallelism, the same shape as
  * the batch query's hash(source) exchange; no document text ever
  * enters state. */
object StreamQuota {

  /** One arriving document (text rides elsewhere; the gate only needs
    * identity, origin, and order). */
  case class Arrival(source: String, doc_id: Long, ts_sec: Long)

  /** An admitted document and its 1-based admission rank within the
    * source's quota. */
  case class Admitted(source: String, doc_id: Long, ts_sec: Long, rank: Long)

  private[streaming] class Gate(cap: Int)
      extends StatefulProcessor[String, Arrival, Admitted] {
    @transient private var admitted: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admitted = getHandle.getValueState[Long]("admitted",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Arrival],
                                 timers: TimerValues): Iterator[Admitted] = {
      var n = if (admitted.exists()) admitted.get() else 0L
      val out = Seq.newBuilder[Admitted]
      rows.toSeq.sortBy(r => (r.ts_sec, r.doc_id)).foreach { r =>
        if (n < cap) {
          n += 1
          out += Admitted(key, r.doc_id, r.ts_sec, n)
        }
      }
      admitted.update(n)
      out.result().iterator
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Admitted] =
      Iterator.empty
  }

  /** Admit the first `cap` arrivals per source; everything after is
    * dropped (the stream analogue of a corpus-level origin cap). */
  def admit(input: Dataset[Arrival], cap: Int = 10): Dataset[Admitted] = {
    require(cap > 0, s"cap must be positive, got $cap")
    val spark = input.sparkSession
    import spark.implicits._
    input.groupByKey(_.source)
      .transformWithState(new Gate(cap), TimeMode.None(), OutputMode.Append())
  }
}
