package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** KTable emulation for streams: latest-value-per-key state emitting a
  * changelog (reference `builder.table`, SURVEY.md §2 S2/§4.2).
  *
  * One `flatMapGroupsWithState` keyed by record key. State is the key's
  * current value; each input row (in `seq` order) updates it and emits a
  * [[Change]]. Tombstones (`value == null`) clear state and emit a delete
  * change. Output is an append-only *event log of changes* — downstream
  * either consumes it as events (what the reference's `toStream` does) or
  * re-materializes with [[graft.operators.Changelog.latestByKey]].
  *
  * Scale: state is hash-partitioned by key across executors (Spark state
  * store), size O(|live keys|); per-batch work O(batch). With the RocksDB
  * state store provider this is the same layout Kafka Streams uses.
  */
object KTableStream {

  def changes(input: Dataset[Rec]): Dataset[Change] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .filter((r: Rec) => r.key != null) // table sources drop null keys (TopologiesTest.scala:288)
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateKey)
  }

  private def updateKey(key: String, rows: Iterator[Rec],
                        state: GroupState[String]): Iterator[Change] = {
    val ordered = rows.toSeq.sortBy(_.seq)
    val out = Seq.newBuilder[Change]
    var cur = state.getOption.orNull
    ordered.foreach { r =>
      out += Change(key, r.value, cur, r.seq)
      cur = r.value
    }
    if (cur == null) state.remove() else state.update(cur)
    out.result().iterator
  }

  /** Convenience: drop records with a null key before table-ing them —
    * Kafka Streams drops null-key records on table/stream sources
    * (`TopologiesTest.scala:288`). */
  def dropNullKeys(input: Dataset[Rec]): Dataset[Rec] =
    input.filter((r: Rec) => r.key != null)
}
