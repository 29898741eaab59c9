package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** '''Event-time temporal table join''' — every event joins the dimension
  * version that was valid AT THE EVENT'S TIMESTAMP, not at arrival
  * (Flink's `FOR SYSTEM_TIME AS OF` event-time temporal join; the
  * event-time face of the reference's KStream⋈KTable enrichment,
  * `TopologiesTest.scala:421-435`). [[StreamTableJoin]] resolves "as of"
  * by arrival order, which is only correct when delivery is time-ordered
  * across the two streams; this operator is correct under ANY
  * interleaving the watermark admits — a dimension update that arrives
  * AFTER an event but carries an earlier timestamp still wins.
  *
  * Version rule: the matching version for an event at `t` is the change
  * with the largest `ts <= t` (half-open validity `[from, next)`, the
  * exact [[graft.operators.Changelog.scd2]] / `k5_scd2_asof` convention;
  * same-ts change applies, `seq` breaks same-ts dim ties). Events before
  * the first version emit a null dimension value (left semantics).
  *
  * Mechanics (one stateful operator over the tagged union, keyed by the
  * join key, `TimeMode.EventTime`):
  *  - dim changes append to a per-key version list;
  *  - an event with `ts <= watermark` at arrival is emitted IMMEDIATELY —
  *    the watermark already promises no dim change at or before it can
  *    still arrive, so the join is decided (this is the entire hot path
  *    under time-ordered delivery: zero event buffering);
  *  - an event ahead of the watermark buffers with a timer at its `ts`;
  *    when the watermark passes, the timer drains every buffered event
  *    now decided.
  *
  * State bound: buffered events only ever span `(watermark, max event ts
  * seen]` — under delay `d` that is O(events in the last `d` window) per
  * key — and each timer fire compacts the version list to the latest
  * version at-or-before the watermark plus newer ones (versions older
  * than that can never match a future event, since every undecided event
  * has `ts > watermark`). Both sides are hash-spread on the join key; no
  * global state, no full-history retention. */
object StreamTemporalJoin {

  /** One joined event: the event row plus the dim version valid at its
    * event time (`dim_value`/`dim_from` null/-1 when none existed yet). */
  case class TemporalJoined(key: String, event_value: String, event_ts: Long,
                            event_seq: Long, dim_value: String, dim_from: Long)

  private[streaming] case class Tagged(side: Int, key: String, value: String,
                                       ts: Long, seq: Long,
                                       ets: java.sql.Timestamp)

  /** A dim version (`side == 0` rows); ordered by (ts, seq). */
  private[streaming] case class Version(ts: Long, seq: Long, value: String)

  private[streaming] class Joiner
      extends StatefulProcessor[String, Tagged, TemporalJoined] {
    @transient private var versions: ListState[Version] = _
    @transient private var pending: ListState[Tagged] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      versions = getHandle.getListState[Version]("versions",
        Encoders.product[Version], TTLConfig.NONE)
      pending = getHandle.getListState[Tagged]("pending",
        Encoders.product[Tagged], TTLConfig.NONE)
    }

    /** Latest version with ts <= t ((ts, seq)-max); null fields if none. */
    private def asOf(sorted: IndexedSeq[Version], t: Long): Version = {
      var lo = 0; var hi = sorted.length - 1; var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (sorted(mid).ts <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (ans < 0) Version(-1L, -1L, null) else sorted(ans)
    }

    private def sortedVersions(): IndexedSeq[Version] =
      versions.get().toIndexedSeq.sortBy(v => (v.ts, v.seq))

    override def handleInputRows(key: String, rows: Iterator[Tagged],
                                 timers: TimerValues): Iterator[TemporalJoined] = {
      val wm = timers.getCurrentWatermarkInMs()
      val (dims, events) = rows.toSeq.partition(_.side == 0)
      if (dims.nonEmpty) versions.appendList(dims.map(d =>
        Version(d.ts, d.seq, d.value)).toArray)
      val out = Seq.newBuilder[TemporalJoined]
      if (events.nonEmpty) {
        // strict <: at ts == wm a same-ts dim change could still be
        // admitted, so such events take the timer path instead
        val (decided, ahead) = events.partition(_.ts < wm)
        if (decided.nonEmpty) {
          val vs = sortedVersions()
          decided.sortBy(e => (e.ts, e.seq)).foreach { e =>
            val v = asOf(vs, e.ts)
            out += TemporalJoined(key, e.value, e.ts, e.seq, v.value, v.ts)
          }
        }
        if (ahead.nonEmpty) {
          pending.appendList(ahead.toArray)
          ahead.foreach(e => getHandle.registerTimer(e.ts))
        }
      }
      out.result().iterator
    }

    /** Watermark passed `info.getExpiryTimeInMs`: drain every buffered
      * event now decided, then compact versions no future event can use. */
    override def handleExpiredTimer(key: String, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[TemporalJoined] = {
      val cut = info.getExpiryTimeInMs()
      val buf = pending.get().toSeq
      val (ready, still) = buf.partition(_.ts <= cut)
      if (ready.isEmpty) return Iterator.empty
      val vs = sortedVersions()
      val out = ready.sortBy(e => (e.ts, e.seq)).map { e =>
        val v = asOf(vs, e.ts)
        TemporalJoined(key, e.value, e.ts, e.seq, v.value, v.ts)
      }
      if (still.isEmpty) pending.clear() else {
        pending.clear(); pending.appendList(still.toArray)
      }
      // keep the latest version at-or-before the cut + all newer ones;
      // every still-buffered event has ts > cut, so older versions are dead
      val keepFrom = asOf(vs, cut)
      if (keepFrom.ts >= 0) {
        val kept = vs.dropWhile(v => (v.ts, v.seq) != ((keepFrom.ts, keepFrom.seq)))
        if (kept.length < vs.length) {
          versions.clear(); versions.appendList(kept.toArray)
        }
      }
      out.iterator
    }
  }

  /** Join `events` against the `dim` change stream as of each event's
    * event time. `delay` is the shared watermark delay (allowed
    * out-of-orderness ACROSS both streams); rows later than it are
    * dropped by the watermark, exactly the reference's grace rule —
    * including the boundary: a row whose event time does not EXCEED the
    * current watermark is late (so at-ts-zero rows fall to the initial
    * watermark of 0). */
  def joinAsOf(events: Dataset[Rec], dim: Dataset[Rec],
               delay: String = "10 seconds"): Dataset[TemporalJoined] = {
    val spark = events.sparkSession
    import spark.implicits._
    def tag(ds: Dataset[Rec], side: Int): Dataset[Tagged] =
      ds.withColumn("side", lit(side))
        .withColumn("ets", timestamp_millis(col("ts")))
        .as[Tagged]
    tag(dim, 0).unionByName(tag(events, 1))
      .withWatermark("ets", delay)
      .groupByKey(_.key)
      .transformWithState(new Joiner, TimeMode.EventTime(), OutputMode.Append())
  }
}
