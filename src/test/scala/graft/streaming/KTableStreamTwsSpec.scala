package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** `transformWithState` KTable — same changelog contract as the
  * `flatMapGroupsWithState` implementation, asserted by running both
  * operators over identical inputs. The state-v2 API requires the
  * RocksDB state store provider (set per-session here), which is also
  * the production provider for large keyspaces. */
class KTableStreamTwsSpec extends SparkSpec {

  private val feed = Seq(
    Rec("key1", "a", 0, 1),
    Rec("key1", "b", 0, 2),  // overwrite → old = a
    Rec("key2", "x", 0, 3),
    Rec("key1", null, 0, 4), // tombstone → delete change
    Rec(null, "dropped", 0, 5), // null key dropped at the table source
    Rec("key1", "c", 0, 6))  // re-insert after tombstone → old = null

  private def drive(name: String, f: org.apache.spark.sql.Dataset[Rec]
      => org.apache.spark.sql.Dataset[Change]): List[Change] = {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val prev = s.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Rec]
      val q = f(in.toDS()).writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        feed.foreach { r => in.addData(r); q.processAllAvailable() }
        s.table(name).as[Change].collect().sortBy(_.seq).toList
      } finally q.stop()
    } finally {
      if (prev.nonEmpty) s.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
      else s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState changelog matches the flatMapGroupsWithState one") {
    val expected = List(
      Change("key1", "a", null, 1),
      Change("key1", "b", "a", 2),
      Change("key2", "x", null, 3),
      Change("key1", null, "b", 4),
      Change("key1", "c", null, 6))
    val tws = drive("ktable_tws", ds => KTableStreamTws.changes(ds))
    assert(tws == expected)
    val fmgws = drive("ktable_fmgws", ds => KTableStream.changes(ds))
    assert(fmgws == expected)
  }
}
