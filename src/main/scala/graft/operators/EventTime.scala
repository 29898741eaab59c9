package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Event-time windowing helpers (reference SURVEY.md §2.4).
  *
  * Batch-checkable shapes; the streaming forms (watermark = grace, emit
  * modes) live in [[graft.streaming]]. All helpers expose window bounds as
  * **epoch seconds** (long) — integer-exact across engines, unlike raw
  * ns/us timestamps.
  */
object EventTime {

  /** Tumbling window (reference `TimeWindows.ofSizeAndGrace`,
    * `apps/WindowedGrouping.scala:44`): Spark's built-in `window()`, which
    * Catalyst turns into a single projection (no explode for tumbling). */
  def tumble(ts: Column, width: String): Column = window(ts, width)

  /** Sliding window (`advanceBy < size` in the reference DSL): each event
    * lands in size/slide windows — Spark expands via its window generator. */
  def slide(ts: Column, width: String, step: String): Column = window(ts, width, step)

  /** Session window (reference `SessionWindows.ofInactivityGapWithNoGrace`,
    * `TopologiesTest.scala:413`). Input should be pre-truncated to whole
    * seconds (see [[graft.Tables.events]]) so gap comparisons are exact
    * across engines. */
  def session(ts: Column, gap: String): Column = session_window(ts, gap)

  /** A window struct's start/end as epoch seconds. */
  def startSec(win: Column): Column = win.getField("start").cast("long")
  def endSec(win: Column): Column   = win.getField("end").cast("long")

  /** Flattened window key `"$key-$windowStartSec"` (reference `selectKey`
    * flattening, `apps/WindowedGrouping.scala:47`). */
  def flatKey(key: Column, win: Column): Column =
    concat(key.cast("string"), lit("-"), startSec(win).cast("string"))
}
