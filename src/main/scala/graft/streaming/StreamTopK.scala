package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Continuously-maintained global top-k — the streaming twin of the
  * batch `x2_topk_users` leaderboard (top users by total event value).
  *
  * Two stateful layers, the classic streams-engine decomposition:
  *
  *   1. per-user running totals (`Totals`): keyed state is ONE counter
  *      per live user; each micro-batch emits at most one
  *      [[TotalUpdate]] per user that changed — the downstream feed is
  *      change-sized, never event-sized.
  *   2. a bounded global leaderboard (`Leader`): all updates collapse
  *      onto one key holding exactly k entries. Because per-user totals
  *      are MONOTONE (values accumulate, never retract) and every
  *      change is re-emitted, the greedy insert/evict-min structure is
  *      EXACT: at every batch boundary the k entries are the true top-k
  *      of current totals under the (total desc, user_id asc) order —
  *      an evicted user that later grows re-enters via its next update.
  *      `StreamTopKSpec` pins this equality against a batch replay,
  *      including forced evict-then-re-enter traffic.
  *
  * Totals accumulate as exact BIGINT micro-cents (`round(value·100)`
  * per event), so results are independent of arrival/batch order —
  * the engine-exactness discipline of the x53/x65 twins. (The batch
  * x2 query displays `round(sum(value), 2)` instead; the spec replays
  * the cents contract.)
  *
  * Scale: layer 1 is ordinary hash-distributed keyed state. Layer 2 is
  * a single reducer, but it consumes only CHANGED (user, total) pairs
  * per batch and holds k entries — the same funnel every engine's
  * global top-k ends in. If the change stream itself is too hot, shard
  * layer 2 by `user_id % B` into B independent top-k states and merge
  * the B·k rows at read time; the per-shard argument is unchanged.
  */
object StreamTopK {

  /** One event of the monitored stream. */
  case class UserEvent(user_id: Long, event_id: Long, ts_sec: Long,
                       value: Double)

  /** A changed per-user running total, in exact micro-cents. */
  case class TotalUpdate(user_id: Long, total_cents: Long)

  /** One leaderboard row of the `version`-th emitted snapshot (version
    * increases by 1 per micro-batch that reached the leaderboard). */
  case class RankedEntry(version: Long, rank: Int, user_id: Long,
                         total_cents: Long)

  private[streaming] case class LeaderState(user_ids: Seq[Long],
                                            cents: Seq[Long],
                                            version: Long)

  private[streaming] class Totals
      extends StatefulProcessor[Long, UserEvent, TotalUpdate] {
    @transient private var total: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      total = getHandle.getValueState[Long]("total",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timers: TimerValues): Iterator[TotalUpdate] = {
      var delta = 0L
      rows.foreach { r => delta += math.round(r.value * 100) }
      if (delta == 0L) Iterator.empty
      else {
        val now = (if (total.exists()) total.get() else 0L) + delta
        total.update(now)
        Iterator.single(TotalUpdate(key, now))
      }
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[TotalUpdate] =
      Iterator.empty
  }

  /** `a` outranks `b` under the leaderboard's total order. */
  private def outranks(aCents: Long, aUser: Long, bCents: Long, bUser: Long): Boolean =
    aCents > bCents || (aCents == bCents && aUser < bUser)

  private[streaming] class Leader(k: Int)
      extends StatefulProcessor[Boolean, TotalUpdate, RankedEntry] {
    @transient private var board: ValueState[LeaderState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      board = getHandle.getValueState[LeaderState]("board",
        Encoders.product[LeaderState], TTLConfig.NONE)

    override def handleInputRows(key: Boolean, rows: Iterator[TotalUpdate],
                                 timers: TimerValues): Iterator[RankedEntry] = {
      val st = if (board.exists()) board.get()
               else LeaderState(Vector.empty, Vector.empty, 0L)
      val entries = scala.collection.mutable.LinkedHashMap.from(
        st.user_ids.zip(st.cents))
      // One surviving total per user per batch (updates are monotone,
      // so the max IS the latest); application order across users is
      // irrelevant — each step preserves "entries = top-k of latest
      // emitted totals", the invariant the Scaladoc proof rides on.
      rows.toSeq.groupMapReduce(_.user_id)(_.total_cents)(math.max).foreach {
        case (u, c) =>
          if (entries.contains(u)) entries(u) = c
          else if (entries.size < k) entries(u) = c
          else {
            val (wu, wc) = entries.minBy { case (eu, ec) => (ec, -eu) }
            if (outranks(c, u, wc, wu)) { entries.remove(wu); entries(u) = c }
          }
      }
      val ranked = entries.toSeq
        .sortBy { case (u, c) => (-c, u) }
      val version = st.version + 1
      board.update(LeaderState(ranked.map(_._1).toVector,
        ranked.map(_._2).toVector, version))
      ranked.iterator.zipWithIndex.map { case ((u, c), i) =>
        RankedEntry(version, i + 1, u, c)
      }
    }

    override def handleExpiredTimer(key: Boolean, timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[RankedEntry] =
      Iterator.empty
  }

  /** The change-sized per-user total stream (layer 1 alone, for callers
    * composing their own readout). */
  def totals(input: Dataset[UserEvent]): Dataset[TotalUpdate] = {
    val spark = input.sparkSession
    import spark.implicits._
    input.groupByKey(_.user_id)
      .transformWithState(new Totals, TimeMode.None(), OutputMode.Append())
  }

  /** The live top-k leaderboard: every micro-batch that changes any
    * total appends a fresh versioned k-row snapshot. */
  def topK(input: Dataset[UserEvent], k: Int): Dataset[RankedEntry] = {
    require(k > 0, s"k must be positive, got $k")
    val spark = input.sparkSession
    import spark.implicits._
    totals(input).groupByKey(_ => true)
      .transformWithState(new Leader(k), TimeMode.None(), OutputMode.Append())
  }
}
