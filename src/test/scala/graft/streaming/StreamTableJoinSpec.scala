package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** KStream⋈KTable enrichment: events see the table as of their arrival;
  * table updates affect only later events (reference topology
  * `TopologiesTest.scala:421-435`). */
class StreamTableJoinSpec extends SparkSpec {

  test("events join the table's current value; updates and tombstones take effect in order") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stream = MemoryStream[Rec]
    val table = MemoryStream[Rec]
    val q = StreamTableJoin.enrich(stream.toDS(), table.toDS(), "inner")
      .writeStream.format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      stream.addData(Rec("u1", "e1", 0, 1))     // before table value → dropped (inner)
      table.addData(Rec("u1", "gold", 0, 2))
      q.processAllAvailable()
      stream.addData(Rec("u1", "e2", 0, 3))     // → (e2, gold)
      q.processAllAvailable()
      table.addData(Rec("u1", "silver", 0, 4))
      stream.addData(Rec("u1", "e3", 0, 5))     // same batch, after update → (e3, silver)
      q.processAllAvailable()
      table.addData(Rec("u1", null, 0, 6))      // tombstone
      stream.addData(Rec("u1", "e4", 0, 7))     // table deleted → dropped
      q.processAllAvailable()
      val out = s.table("enrich_out").as[JoinChange].collect().sortBy(_.seq).toList
      assert(out == List(
        JoinChange("u1", "e2", "gold", deleted = false, 3),
        JoinChange("u1", "e3", "silver", deleted = false, 5)))
    } finally q.stop()
  }

  test("left enrichment null-pads unmatched events instead of dropping them") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val stream = MemoryStream[Rec]
    val table = MemoryStream[Rec]
    val q = StreamTableJoin.enrich(stream.toDS(), table.toDS(), "left")
      .writeStream.format("memory").queryName("enrich_left").outputMode("append").start()
    try {
      stream.addData(Rec("u1", "early", 0, 1))
      table.addData(Rec("u1", "gold", 0, 2))
      stream.addData(Rec("u1", "late", 0, 3))
      q.processAllAvailable()
      val out = s.table("enrich_left").as[JoinChange].collect().sortBy(_.seq).toList
      assert(out == List(
        JoinChange("u1", "early", null, deleted = false, 1),
        JoinChange("u1", "late", "gold", deleted = false, 3)))
    } finally q.stop()
  }
}
