package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** [[Joins.intervalJoin]] must work UNCHANGED with a streaming points
  * side against a static interval dimension: the bucket rewrite is a
  * map-side projection + explode + stream-static equi join — stateless,
  * no watermark needed, so a 100 TB/day event firehose can be enriched
  * against promotion/maintenance/session windows without a stateful
  * stream-stream join. Batch ≡ streaming on the same input is the
  * equivalence contract. */
case class Pt(pid: Long, p: Long)

class StreamingIntervalJoinSpec extends SparkSpec {

  test("streaming points ⋈ static intervals ≡ the batch interval join") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val intervals = Seq((10L, 0L, 10L), (20L, 8L, 30L), (30L, 100L, 200L))
      .toDF("iid", "st", "en")
    val pts = Seq(Pt(1, 0), Pt(2, 9), Pt(3, 10), Pt(4, 31), Pt(5, 150))

    val expected = Joins
      .intervalJoin(pts.toDF(), intervals, "p", "st", "en", 16L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

    val in = MemoryStream[Pt]
    val q = Joins.intervalJoin(in.toDF(), intervals, "p", "st", "en", 16L)
      .select("pid", "iid")
      .writeStream.format("memory").queryName("sivj").outputMode("append")
      .start()
    try {
      in.addData(pts: _*)
      q.processAllAvailable()
      val got = s.table("sivj").as[(Long, Long)].collect().toSet
      assert(got == expected, s"streaming $got != batch $expected")
      assert(got == Set((1L, 10L), (2L, 10L), (2L, 20L), (3L, 10L), (3L, 20L), (5L, 30L)))
    } finally q.stop()
  }
}
