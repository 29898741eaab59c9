package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the same key
  * and the greatest right-time ≤ left-time (classic enrich-with-latest —
  * prices, slowly-changing dimensions, "previous order per customer").
  * Spark has no built-in.
  *
  * Implementation is the merge-scan shape, not a pair join: both sides
  * are unioned into one keyed timeline (right rows = "events", left rows
  * = "probes"), shuffled ONCE on the key, sorted by (time, side,
  * tie-break), and each probe reads the running `last` event via a
  * cumulative window. Cost is O((|left|+|right|) log) with zero pair
  * amplification — a left row never meets more than the one history scan
  * of its key, unlike join+max_by, which materializes |left| × per-key
  * history intermediates before aggregating.
  *
  * At 100 TB this is one Exchange on the key + an in-partition sort —
  * both AQE-managed; a hot key degrades to a linear scan of that key's
  * timeline, not a quadratic pair blowup.
  *
  * Ordering is made total with `(time, side, tieBreak)` so results are
  * deterministic when several right rows share a timestamp: the winner is
  * `max_by(struct(rightTime, rightTieBreak))` among visible events.
  */
object AsOfJoin {

  /** `left` must carry a unique `leftIdCol`. Returns the left id plus the
    * as-of matched right columns (null when no right row precedes).
    * `strict` = match right-time strictly before left-time (e.g. a
    * self-as-of for "previous row per key"). `leftTime` and `rightTime`
    * must be union-compatible types. */
  def asof(left: DataFrame, right: DataFrame, leftKey: Column, rightKey: Column,
           leftTime: Column, rightTime: Column, leftIdCol: String,
           rightPick: Seq[(String, Column)], rightTieBreak: Column,
           strict: Boolean = false): DataFrame = {
    // At equal time: non-strict ⇒ events are visible to the probe (events
    // sort first); strict ⇒ they are not (probes sort first).
    val (eventSide, probeSide) = if (strict) (1, 0) else (0, 1)
    // All picked columns ride in ONE struct per event: `last(ignoreNulls)`
    // must skip probe rows but NOT events whose picked values are null —
    // the struct wrapper is non-null exactly for event rows, and taking
    // every picked column from the same struct also guarantees they all
    // come from the same winning event. Null-key events are dropped (SQL
    // equality never matches NULL = NULL); null-key probes then see an
    // empty partition and null-pad, matching the equi-join they replace.
    // Null-key events can never equi-match; null-TIME events would sort
    // NULLS FIRST and wrongly become every probe's "earliest" match —
    // SQL's rightTime <= leftTime is never true for NULL, so drop both.
    val events = right
      .filter(rightKey.isNotNull && rightTime.isNotNull)
      .select(rightKey.as("__k"), rightTime.as("__t"),
        lit(eventSide).as("__side"), rightTieBreak.as("__tb"),
        struct(rightPick.map { case (name, c) => c.as(name) }: _*).as("__pick"))
    val probes = left.select(
      leftKey.as("__k"), leftTime.as("__t"),
      lit(probeSide).as("__side"), col(leftIdCol))
    val timeline = events.unionByName(probes, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    timeline
      .select(col(leftIdCol), last(col("__pick"), ignoreNulls = true).over(w).as("__asof"))
      .filter(col(leftIdCol).isNotNull)
      .select(col(leftIdCol) +:
        rightPick.map { case (name, _) => col(s"__asof.$name").as(name) }: _*)
  }
}
