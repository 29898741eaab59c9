package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Streaming exact dedup: one emission per normalized-text fingerprint
  * within the watermark horizon; state evicts with the watermark so a
  * fingerprint can legitimately reappear after the horizon passes. */
class StreamDedupSpec extends SparkSpec {

  private val base = 1700000000L
  private def ts(off: Long) = new Timestamp((base + off) * 1000)
  case class Doc(id: Long, text: String, ts: Timestamp)

  test("duplicates within the horizon collapse; whitespace/case-normalized") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[Doc]
    val q = StreamDedup.firstPerFingerprint(in.toDF(), "text", "ts", "10 minutes")
      .select("id", "text")
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      in.addData(
        Doc(1, "Hello World", ts(0)),
        Doc(2, "hello   world", ts(5)),   // same fingerprint after normalization
        Doc(3, "different", ts(6)))
      q.processAllAvailable()
      in.addData(Doc(4, "HELLO WORLD", ts(60))) // later batch, same horizon → dropped
      q.processAllAvailable()
      val ids = s.table("sdedup").as[(Long, String)].collect().map(_._1).toSet
      assert(ids.size == 2)
      assert(ids.contains(3L))
      assert((ids - 3L).subsetOf(Set(1L, 2L))) // exactly one of the dup pair survives
    } finally q.stop()
  }
}
