package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.util.Random

/** The transformWithState FK join must emit exactly what the
  * flatMapGroupsWithState one emits — directed scenarios from the
  * reference's edge-case catalog plus seeded random update sequences,
  * driven one micro-batch per record so cross-side order is pinned. */
class FkJoinStreamTwsSpec extends SparkSpec {

  private val fkOf: String => String = v => {
    val fk = v.substring(0, v.indexOf('|'))
    if (fk.isEmpty) null else fk
  }

  private var n = 0
  private def drive(tws: Boolean, how: String, feed: Seq[(Int, Rec)]): List[FkJoinChange] = {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    n += 1
    val name = s"fk_eq_$n"
    val prev = s.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    if (tws) s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val left = MemoryStream[Rec]
      val right = MemoryStream[Rec]
      val joined: Dataset[FkJoinChange] =
        if (tws) FkJoinStreamTws.join(left.toDS(), right.toDS(), fkOf, how)
        else FkJoinStream.join(left.toDS(), right.toDS(), fkOf, how)
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        feed.foreach { case (side, r) =>
          (if (side == 0) left else right).addData(r)
          q.processAllAvailable()
        }
        s.table(name).as[FkJoinChange].collect()
          .sortBy(c => (c.seq, c.deleted)).toList
      } finally q.stop()
    } finally {
      if (prev.nonEmpty) s.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
      else s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def assertEquivalent(how: String, feed: Seq[(Int, Rec)]): Unit = {
    val expected = drive(tws = false, how, feed)
    val actual = drive(tws = true, how, feed)
    assert(actual == expected, s"how=$how feed=$feed")
  }

  test("directed: FK change, right update fan-out, tombstones, null FK — both joins agree") {
    val directed = Seq(
      (0, Rec("p1", "f1|p1", 0, 1)), (1, Rec("f1", "r1", 0, 2)),
      (0, Rec("p2", "f1|p2", 0, 3)),  // second subscriber
      (1, Rec("f1", "r2", 0, 4)),     // right update re-joins both
      (0, Rec("p1", "f2|p1", 0, 5)),  // FK change f1→f2 (unmatched)
      (1, Rec("f1", null, 0, 6)),     // right tombstone
      (0, Rec("p2", null, 0, 7)),     // left tombstone
      (0, Rec("p3", "|p3", 0, 8)))    // null FK from the start
    assertEquivalent("left", directed)
    assertEquivalent("inner", directed)
  }

  test("randomized update sequences — both joins agree (seeds 1, 2)") {
    for (seed <- 1 to 2; how <- Seq("left", "inner")) {
      val rnd = new Random(seed * 31 + how.length)
      val keys = Seq("a", "b")
      val fks = Seq("f1", "f2", "")
      val feed = (1 to 14).map { i =>
        if (rnd.nextInt(3) < 2) {
          val k = keys(rnd.nextInt(keys.length))
          val v = if (rnd.nextInt(5) == 0) null
            else s"${fks(rnd.nextInt(fks.length))}|$k-v$i"
          (0, Rec(k, v, 0, i.toLong))
        } else {
          val fk = Seq("f1", "f2")(rnd.nextInt(2))
          val v = if (rnd.nextInt(4) == 0) null else s"rv$i"
          (1, Rec(fk, v, 0, i.toLong))
        }
      }
      assertEquivalent(how, feed)
    }
  }
}
