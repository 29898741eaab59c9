package graft.streaming

import graft.SparkSpec
import graft.functions.Aggregators
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous heavy hitters: the bounded [[Aggregators.spaceSaving]]
  * sketch in an update-mode streaming aggregation — term-frequency
  * monitoring over an unbounded stream with state capped at `capacity`
  * entries per group, the streaming twin of the x26 batch query. */
class StreamingHeavyHittersSpec extends SparkSpec {

  test("update-mode heavy hitters track counts with bounded state") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val hh = udaf(Aggregators.spaceSaving(4), Encoders.STRING)
    val in = MemoryStream[(String, String)] // (source, word)
    val hot = in.toDF().toDF("source", "word")
      .groupBy("source")
      .agg(hh(col("word")).as("sk"))
      .select(col("source"), explode(col("sk.hits")).as("h"))
      .select(col("source"), col("h.item").as("word"),
        col("h.cnt").as("cnt"), col("h.err").as("err"))
    val q = hot.writeStream.format("memory").queryName("hot")
      .outputMode("update").start()
    try {
      in.addData(Seq("a", "a", "a", "b", "b", "c").map("web" -> _): _*)
      q.processAllAvailable()
      in.addData(Seq("a", "d", "d", "d", "e", "f").map("web" -> _): _*)
      q.processAllAvailable()
      val rows = s.table("hot").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      // capacity bound holds in every emitted snapshot
      val latest = rows.groupBy(_._1).map { case (w, v) => w -> v.maxBy(_._2) }
      assert(latest.size <= 6 && rows.nonEmpty)
      // the true heavies (a=4, d=3) survive with valid bounds
      val truth = Map("a" -> 4L, "b" -> 2L, "c" -> 1L, "d" -> 3L, "e" -> 1L, "f" -> 1L)
      Seq("a", "d").foreach { w =>
        val (_, cnt, err) = latest(w)
        assert(truth(w) <= cnt && cnt - err <= truth(w),
          s"$w: true ${truth(w)} outside [${cnt - err}, $cnt]")
      }
    } finally q.stop()
  }
}
