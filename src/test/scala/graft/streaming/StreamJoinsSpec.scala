package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Stream-stream windowed joins (fixtures 8–10: self-join band, left-outer
  * expiry, null-key drop; reference `TopologiesTest.scala:255-292`). */
class StreamJoinsSpec extends SparkSpec {

  private val base = 1700000000L
  private def ts(offsetSec: Long) = new Timestamp((base + offsetSec) * 1000)

  case class KV(key: String, value: String, ts: Timestamp)

  test("inner band join: records join within the window, including same-key self pairs") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val l = MemoryStream[KV]
    val r = MemoryStream[KV]
    val q = StreamJoins.bandJoin(l.toDF(), r.toDF(), 10L, "0 seconds")
      .selectExpr("l_key", "l_value", "r_value")
      .writeStream.format("memory").queryName("band_inner").outputMode("append").start()
    try {
      l.addData(KV("key1", "L", ts(0)))
      r.addData(KV("key1", "R0", ts(5)), KV("key1", "R1", ts(9)),
        KV("key1", "R2", ts(11)), KV("key2", "other", ts(0)))
      q.processAllAvailable()
      val got = s.table("band_inner").as[(String, String, String)].collect().toSet
      // |0-11| > 10 excludes R2; key2 never matches
      assert(got == Set(("key1", "L", "R0"), ("key1", "L", "R1")))
    } finally q.stop()
  }

  test("left-outer band join: unmatched left emits (left, null) after the watermark expires the window") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val l = MemoryStream[KV]
    val r = MemoryStream[KV]
    val q = StreamJoins.bandJoin(l.toDF(), r.toDF(), 10L, "0 seconds", "leftOuter")
      .selectExpr("l_key", "l_value", "r_value")
      .writeStream.format("memory").queryName("band_left").outputMode("append").start()
    try {
      l.addData(KV("key1", "matched", ts(0)), KV("key3", "lonely", ts(0)))
      r.addData(KV("key1", "R", ts(1)))
      q.processAllAvailable()
      // push both watermarks far past the band so "lonely" provably has no match
      l.addData(KV("zzz", "wm", ts(100)))
      r.addData(KV("zzz2", "wm", ts(100)))
      q.processAllAvailable()
      l.addData(KV("zzz", "wm2", ts(200)))
      r.addData(KV("zzz2", "wm2", ts(200)))
      q.processAllAvailable()
      val got = s.table("band_left").as[(String, String, String)].collect().toSet
      assert(got.contains(("key1", "matched", "R")))
      assert(got.contains(("key3", "lonely", null)), "expired unmatched left must null-pad")
    } finally q.stop()
  }

  test("full-outer band join: both unmatched sides null-pad after expiry") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val l = MemoryStream[KV]
    val r = MemoryStream[KV]
    val q = StreamJoins.bandJoin(l.toDF(), r.toDF(), 10L, "0 seconds", "fullOuter")
      .selectExpr("l_value", "r_value")
      .writeStream.format("memory").queryName("band_full").outputMode("append").start()
    try {
      l.addData(KV("key1", "matched-l", ts(0)), KV("key3", "lonely-l", ts(0)))
      r.addData(KV("key1", "matched-r", ts(1)), KV("key4", "lonely-r", ts(0)))
      q.processAllAvailable()
      l.addData(KV("zzz", "wm", ts(100)))
      r.addData(KV("zzz2", "wm", ts(100)))
      q.processAllAvailable()
      l.addData(KV("zzz", "wm2", ts(200)))
      r.addData(KV("zzz2", "wm2", ts(200)))
      q.processAllAvailable()
      val got = s.table("band_full").as[(String, String)].collect().toSet
      assert(got.contains(("matched-l", "matched-r")))
      assert(got.contains(("lonely-l", null)), "unmatched left must null-pad")
      assert(got.contains((null, "lonely-r")), "unmatched right must null-pad")
    } finally q.stop()
  }

  test("null-key records are dropped before joining (reference TopologiesTest.scala:288)") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val l = MemoryStream[KV]
    val r = MemoryStream[KV]
    val q = StreamJoins.bandJoin(l.toDF(), r.toDF(), 10L, "0 seconds")
      .selectExpr("l_key", "l_value", "r_value")
      .writeStream.format("memory").queryName("band_nullkey").outputMode("append").start()
    try {
      l.addData(KV(null, "dropped", ts(0)), KV("k", "kept", ts(0)))
      r.addData(KV("k", "R", ts(0)))
      q.processAllAvailable()
      val got = s.table("band_nullkey").as[(String, String, String)].collect().toSet
      assert(got == Set(("k", "kept", "R")))
    } finally q.stop()
  }
}
