package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KStream⋈KTable enrichment (reference
  * `TopologiesTest.scala:421-435`, SURVEY.md §2.5 J3): every stream event
  * joins the table's value *as of that event* — table updates affect only
  * later events, and stream events themselves are never stored.
  *
  * One stateful operator over the tagged union, keyed by the join key:
  * state is the table's latest value (O(|table keys|)); stream events
  * flow through unbuffered, so throughput is bounded by the shuffle, not
  * by state growth. Interleaving within a micro-batch is resolved by
  * `seq` order, the Kafka-offset analogue. */
object StreamTableJoin {

  private[streaming] case class Tagged(side: Int, key: String, value: String, seq: Long)

  /** `how`: "inner" drops unmatched events, "left" null-pads them. */
  def enrich(stream: Dataset[Rec], table: Dataset[Rec],
             how: String = "inner"): Dataset[JoinChange] = {
    require(how == "inner" || how == "left", s"unsupported join type: $how")
    val spark = stream.sparkSession
    import spark.implicits._
    val inner = how == "inner"
    val s = stream.map(r => Tagged(0, r.key, r.value, r.seq))
    val t = table.map(r => Tagged(1, r.key, r.value, r.seq))
    s.union(t)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[Tagged], state: GroupState[String]) => {
          val ordered = rows.toSeq.sortBy(r => (r.seq, r.side))
          val out = Seq.newBuilder[JoinChange]
          var cur = state.getOption.orNull
          var curSet = state.exists
          ordered.foreach { r =>
            if (r.side == 1) {
              cur = r.value
              curSet = r.value != null
            } else if (curSet || !inner) {
              out += JoinChange(key, r.value, if (curSet) cur else null,
                deleted = false, r.seq)
            }
          }
          if (curSet) state.update(cur) else state.remove()
          out.result().iterator
        })
  }
}
