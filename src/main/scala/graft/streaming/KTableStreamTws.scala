package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

/** [[KTableStream]] on Spark 4's `transformWithState` — the current
  * arbitrary-state API (SPARK-49564 / "state-v2"), which supersedes
  * `flatMapGroupsWithState` with per-state-variable registration, native
  * TTL, and schema-evolvable state.
  *
  * Same changelog contract as [[KTableStream.changes]]: latest value per
  * key, tombstone clears, every input row emits one [[Change]] in `seq`
  * order. Equivalence with the fMGWS implementation is asserted in
  * `KTableStreamTwsSpec` on identical inputs.
  *
  * The `ttl` option maps the reference's store-retention knob
  * (`RocksDbWindowBytesStoreSupplier(name, retention, ...)`, reference
  * `serdes/package.scala:9-16`) onto state TTL: keys idle longer than the
  * retention are evicted by the state store itself — bounding state for
  * 100 TB keyspaces where abandoned keys would otherwise accumulate
  * forever (fMGWS offers only processing-time timeouts wired by hand).
  */
object KTableStreamTws {

  private[streaming] class LatestValueProcessor(ttl: Option[java.time.Duration])
      extends StatefulProcessor[String, Rec, Change] {
    @transient private var latest: ValueState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val ttlConfig = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
      latest = getHandle.getValueState[String]("latest", Encoders.STRING, ttlConfig)
    }

    override def handleInputRows(key: String, inputRows: Iterator[Rec],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Change] = {
      val ordered = inputRows.toSeq.sortBy(_.seq)
      val out = Seq.newBuilder[Change]
      var cur = if (latest.exists()) latest.get() else null
      ordered.foreach { r =>
        out += Change(key, r.value, cur, r.seq)
        cur = r.value
      }
      if (cur == null) latest.clear() else latest.update(cur)
      out.result().iterator
    }
  }

  /** Latest-per-key changelog; `ttl` evicts keys idle longer than the
    * given retention (None = keep forever, the reference default). */
  def changes(input: Dataset[Rec], ttl: Option[java.time.Duration] = None): Dataset[Change] = {
    val spark = input.sparkSession
    import spark.implicits._
    input
      .filter((r: Rec) => r.key != null) // table sources drop null keys (TopologiesTest.scala:288)
      .groupByKey(_.key)
      .transformWithState(new LatestValueProcessor(ttl), TimeMode.None(), OutputMode.Append())
  }
}
