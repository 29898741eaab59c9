package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the same key
  * and the greatest right-time ≤ left-time (classic enrich-with-latest —
  * prices, dimensions slowly changing, etc.). Spark has no built-in;
  * this composes an equi-join with a residual time filter and a
  * `max_by` per left row.
  *
  * Plan shape: one shuffle on the key for the join, one aggregation keyed
  * by the left row id with map-side partials. The per-key right history is
  * the only amplification (|left| × avg right-per-key intermediate) — at
  * 100 TB, bucket both sides by key, or pre-reduce the right side to the
  * time-bucketed latest to bound the history each left row meets.
  *
  * Ordering is made total with `(time, tieBreak)` so results are
  * deterministic when several right rows share a timestamp.
  */
object AsOfJoin {

  /** `left` must carry a unique `leftIdCol`. Returns the left id plus the
    * as-of matched right columns (null when no right row precedes).
    * `strict` = match right-time strictly before left-time (e.g. a
    * self-as-of for "previous row per key"). */
  def asof(left: DataFrame, right: DataFrame, keyEq: Column,
           leftTime: Column, rightTime: Column, leftIdCol: String,
           rightPick: Seq[(String, Column)], rightTieBreak: Column,
           strict: Boolean = false): DataFrame = {
    val timeCond = if (strict) rightTime < leftTime else rightTime <= leftTime
    val matched = left.join(right, keyEq && timeCond, "inner")
      .groupBy(col(leftIdCol))
      .agg(rightPick.map { case (name, c) =>
        max_by(c, struct(rightTime, rightTieBreak)).as(name)
      }.head, rightPick.tail.map { case (name, c) =>
        max_by(c, struct(rightTime, rightTieBreak)).as(name)
      }: _*)
    left.select(col(leftIdCol)).distinct()
      .join(matched, Seq(leftIdCol), "left_outer")
  }
}
