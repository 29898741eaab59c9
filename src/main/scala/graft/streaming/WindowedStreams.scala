package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming windowed aggregation shapes (reference SURVEY.md §2.4 W1–W5).
  *
  * Emit strategy mapping (the reference's three emission modes):
  *  - continuous changelog (default KTable emission, commit interval 0) →
  *    run the returned aggregation with `outputMode("update")`;
  *  - `EmitStrategy.onWindowClose` / `suppress(untilWindowCloses)` →
  *    `outputMode("append")`: rows emit once the watermark passes window
  *    end — Spark's suppression buffer is the state store itself.
  *
  * Grace period maps to `withWatermark(ts, grace)`: a record older than
  * (max event time − grace) is dropped by the stateful operator, the
  * reference's late-record drop (`apps/WindowedGrouping.scala:20-37`).
  * Divergence note (SURVEY.md §2.4): Spark's watermark is global
  * per-query, not per-topic — single-input aggregations match the
  * reference modulo micro-batch granularity; the reference's per-topic
  * stream-time join anomaly is deliberately not reproduced.
  */
object WindowedStreams {

  /** Tumbling count per key (reference WindowedGrouping topology). */
  def tumblingCounts(input: DataFrame, tsCol: String, width: String,
                     grace: String, keyCols: Column*): DataFrame =
    input.withWatermark(tsCol, grace)
      .groupBy(window(col(tsCol), width) +: keyCols: _*)
      .count()

  /** Tumbling sum over a value column (reference `reduce(IntegerAdd)`,
    * `TopologiesTest.scala:355-367`). */
  def tumblingSum(input: DataFrame, tsCol: String, width: String,
                  grace: String, valueCol: String, keyCols: Column*): DataFrame =
    input.withWatermark(tsCol, grace)
      .groupBy(window(col(tsCol), width) +: keyCols: _*)
      .agg(sum(valueCol).as("total"))

  /** Sliding (hopping) count per key — the reference's
    * `advanceBy < size` case (`TimeWindows...advanceBy`, SURVEY.md §2.4
    * W2 note): each event lands in size/slide overlapping windows; state
    * per live (key, window) as with tumbling, ×(size/slide) windows. */
  def slidingCounts(input: DataFrame, tsCol: String, width: String,
                    slide: String, grace: String, keyCols: Column*): DataFrame =
    input.withWatermark(tsCol, grace)
      .groupBy(window(col(tsCol), width, slide) +: keyCols: _*)
      .count()

  /** Session-window count per key (reference
    * `SessionWindows.ofInactivityGapWithNoGrace`, `TopologiesTest.scala:413`).
    *
    * Merge semantics: an event landing EXACTLY on a session's end
    * (gap seconds after the previous event) still merges — a new session
    * needs a strictly greater gap. Matches Kafka Streams' inclusive
    * inactivity-gap comparison. */
  def sessionCounts(input: DataFrame, tsCol: String, gap: String,
                    grace: String, keyCols: Column*): DataFrame =
    input.withWatermark(tsCol, grace)
      .groupBy(session_window(col(tsCol), gap) +: keyCols: _*)
      .count()

  /** Session windows with a PER-EVENT inactivity gap — the streaming
    * twin of the batch `w5_session_dynamic` query (beyond the
    * reference's fixed gap: each record proposes its own expiry).
    *
    * Spark-first: `session_window` accepts a gap COLUMN
    * (CalendarInterval, evaluated per event) in Structured Streaming
    * too, merging overlapping [ts, ts+gap) intervals in the session
    * state store — so no custom TWS state or timers are needed; append
    * mode emits a merged session once the watermark passes its end
    * (max over members of ts+gap), update mode emits the continuous
    * changelog. Merge is gap-inclusive, as in [[sessionCounts]].
    *
    * Scale: state per key is the OPEN sessions only (closed ones are
    * evicted by the watermark), hash-spread on the grouping key. */
  def dynamicSessionCounts(input: DataFrame, tsCol: String, gap: Column,
                           grace: String, keyCols: Column*): DataFrame =
    input.withWatermark(tsCol, grace)
      .groupBy(session_window(col(tsCol), gap) +: keyCols: _*)
      .count()

  /** Session PATHS per user at window close — the streaming twin of
    * the batch x55 readout: each closed session emits its event count
    * and the ">"-joined event-type path in (ts_sec, event_id) order
    * (the same sorted-struct trick as the batch query, so intra-batch
    * and cross-batch disorder cannot change a path). Spark-first:
    * `session_window` merging + an order-carrying `collect_list` — no
    * custom state or timers; append mode emits once the watermark
    * passes the session end. A downstream `groupBy(path).count()` is
    * the live x55 table.
    *
    * Scale: state per (user, open session) is that session's event
    * structs — bounded by session length, evicted at close; the
    * grouping key hash-spreads users. */
  def sessionPaths(input: DataFrame, tsCol: String, gap: String,
                   grace: String, userCol: String, typeCol: String,
                   tsSecCol: String, seqCol: String): DataFrame =
    input.withWatermark(tsCol, grace)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(array_sort(collect_list(
        struct(col(tsSecCol), col(seqCol), col(typeCol)))).as("evs"))
      .select(col("session_window"), col(userCol),
        size(col("evs")).as("n_events"),
        concat_ws(">", transform(col("evs"), e => e.getField(typeCol)))
          .as("path"))

  /** Flatten the window struct to the reference's `"$key-$windowStart"`
    * output key (`apps/WindowedGrouping.scala:47`). */
  def flattenWindowKey(df: DataFrame, keyCol: String): DataFrame =
    df.withColumn("out_key",
      concat(col(keyCol), lit("-"), (col("window.start").cast("long") * 1000).cast("string")))
}
