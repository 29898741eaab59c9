package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** [[FkJoinStream]] on Spark 4's `transformWithState` — same two-phase
  * FK-join topology, with the state model the operator actually wants:
  *
  *  - Stage 2's subscriber set becomes a '''MapState''' (one state-store
  *    entry per subscriber) instead of a `Map` blob inside one value.
  *    With `flatMapGroupsWithState`, every subscribe/unsubscribe
  *    rewrites the whole map — O(|subscribers|) write amplification per
  *    event, exactly where FK skew hurts (one hot merchant, 10⁸
  *    products). With MapState, a subscription change is one point
  *    write, and only a right-side change iterates the map (which it
  *    must — it re-emits every subscriber).
  *  - Per-subscriber visibility folds into the subscriber entry
  *    (`FkSubEntry(payload, visible)`), halving the bookkeeping.
  *
  * Emission semantics are identical to [[FkJoinStream]] (clean relational
  * changelog; reference bugs 1–4 not reproduced) — asserted by an
  * equivalence spec driving both implementations over directed and
  * randomized scenarios.
  */
object FkJoinStreamTws {

  private[streaming] case class FkSubEntry(payload: String, visible: Boolean)
  private[streaming] case class RightVal(value: String, set: Boolean)

  private[streaming] class SubscriptionProcessor(fkOf: String => String,
                                                 nullFkToSentinel: Boolean)
      extends StatefulProcessor[String, Rec, FkSub] {
    @transient private var leftSt: ValueState[FkJoinStream.LeftState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      leftSt = getHandle.getValueState[FkJoinStream.LeftState]("left",
        Encoders.product[FkJoinStream.LeftState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Rec],
                                 timers: TimerValues): Iterator[FkSub] = {
      val ordered = rows.toSeq.sortBy(_.seq)
      val out = Seq.newBuilder[FkSub]
      var st = if (leftSt.exists()) leftSt.get() else null
      ordered.foreach { r =>
        val rawFk = if (r.value == null) null else fkOf(r.value)
        val newFk =
          if (rawFk == null && r.value != null && nullFkToSentinel)
            FkJoinStream.NullFkSentinel
          else rawFk
        val oldFk = if (st == null) null else st.fk
        if (oldFk != null && oldFk != newFk)
          out += FkSub(oldFk, key, null, op = -1, r.seq)
        if (newFk != null)
          out += FkSub(newFk, key, r.value, op = +1, r.seq)
        st = if (r.value == null) null else FkJoinStream.LeftState(newFk, r.value)
      }
      if (st == null) leftSt.clear() else leftSt.update(st)
      out.result().iterator
    }
  }

  private[streaming] class RespondProcessor(inner: Boolean)
      extends StatefulProcessor[String, FkJoinStreamTwsTagged, FkJoinChange] {
    @transient private var rightSt: ValueState[RightVal] = _
    @transient private var subsSt: MapState[String, FkSubEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      rightSt = getHandle.getValueState[RightVal]("right",
        Encoders.product[RightVal], TTLConfig.NONE)
      subsSt = getHandle.getMapState[String, FkSubEntry]("subs",
        Encoders.STRING, Encoders.product[FkSubEntry], TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[FkJoinStreamTwsTagged],
                                 timers: TimerValues): Iterator[FkJoinChange] = {
      val ordered = rows.toSeq.sortBy(t => (t.seq, t.op))
      val out = Seq.newBuilder[FkJoinChange]
      var right = if (rightSt.exists()) rightSt.get() else RightVal(null, set = false)
      ordered.foreach { t =>
        if (t.side == 0 && t.op == +1) {
          // subscribe / payload update: ONE point write
          val visible = !inner || right.set
          subsSt.updateValue(t.leftKey, FkSubEntry(t.payload, visible))
          if (visible)
            out += FkJoinChange(t.leftKey, t.payload,
              if (right.set) right.value else null, deleted = false, t.seq)
        } else if (t.side == 0 && t.op == -1) {
          // unsubscribe: one point read + one point delete
          val wasVisible = subsSt.containsKey(t.leftKey) &&
            subsSt.getValue(t.leftKey).visible
          subsSt.removeKey(t.leftKey)
          if (wasVisible)
            out += FkJoinChange(t.leftKey, null, null, deleted = true, t.seq)
        } else {
          // right-side change: iterate subscribers (unavoidable — each is
          // re-joined), sorted for deterministic emission order
          val tombstone = t.payload == null
          right = RightVal(t.payload, set = !tombstone)
          subsSt.iterator().toSeq.sortBy(_._1).foreach { case (lk, entry) =>
            if (!tombstone) {
              out += FkJoinChange(lk, entry.payload, t.payload, deleted = false, t.seq)
              if (!entry.visible)
                subsSt.updateValue(lk, entry.copy(visible = true))
            } else if (inner) {
              if (entry.visible)
                out += FkJoinChange(lk, null, null, deleted = true, t.seq)
              subsSt.updateValue(lk, entry.copy(visible = false))
            } else {
              out += FkJoinChange(lk, entry.payload, null, deleted = false, t.seq)
            }
          }
        }
      }
      if (!right.set) rightSt.clear() else rightSt.update(right)
      out.result().iterator
    }
  }

  /** Stage 1 on transformWithState. */
  def subscriptions(left: Dataset[Rec], fkOf: String => String,
                    nullFkToSentinel: Boolean = false): Dataset[FkSub] = {
    val spark = left.sparkSession
    import spark.implicits._
    left.groupByKey(_.key)
      .transformWithState(new SubscriptionProcessor(fkOf, nullFkToSentinel),
        TimeMode.None(), OutputMode.Append())
  }

  /** Stage 2 on transformWithState (MapState subscriber index). */
  def respond(subs: Dataset[FkSub], right: Dataset[Rec], how: String): Dataset[FkJoinChange] = {
    require(how == "inner" || how == "left", s"unsupported join type: $how")
    val spark = subs.sparkSession
    import spark.implicits._
    val s = subs.map(e => FkJoinStreamTwsTagged(0, e.fk, e.leftKey, e.payload, e.op, e.seq))
    val r = right.map(rec => FkJoinStreamTwsTagged(1, rec.key, null, rec.value, 0, rec.seq))
    s.union(r)
      .groupByKey(_.key)
      .transformWithState(new RespondProcessor(how == "inner"),
        TimeMode.None(), OutputMode.Append())
  }

  /** Full FK join, both stages on the state-v2 API. */
  def join(left: Dataset[Rec], right: Dataset[Rec], fkOf: String => String,
           how: String = "left"): Dataset[FkJoinChange] =
    respond(subscriptions(left, fkOf, nullFkToSentinel = how == "left"), right, how)
}

/** Stage-2 input row (top-level for encoder derivation). */
case class FkJoinStreamTwsTagged(side: Int, key: String, leftKey: String,
                                 payload: String, op: Int, seq: Long)
