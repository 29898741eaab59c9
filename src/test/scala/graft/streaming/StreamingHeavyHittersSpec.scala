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
      // 8 distinct words against capacity 4: the batch-1 emission IS the
      // sketch content, so its row count is the falsifiable state bound
      in.addData(Seq("a", "a", "a", "a", "b", "b", "c", "d", "e", "f", "g", "h")
        .map("web" -> _): _*)
      q.processAllAvailable()
      val batch1 = s.table("hot").collect()
      assert(batch1.length <= 4 && batch1.nonEmpty,
        s"sketch state exceeded capacity: ${batch1.length} rows emitted")

      in.addData(Seq("a", "d", "d", "d", "d").map("web" -> _): _*)
      q.processAllAvailable()
      val rows = s.table("hot").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      // ≤ capacity rows per batch emission, two batches
      assert(rows.length <= 8, s"emissions exceed per-batch capacity: $rows")
      // the true heavies (a=5, d=5) survive with valid SpaceSaving bounds
      val truth = Map("a" -> 5L, "d" -> 5L)
      val latest = rows.groupBy(_._1).map { case (w, v) => w -> v.maxBy(_._2) }
      Seq("a", "d").foreach { w =>
        assert(latest.contains(w), s"heavy item $w evicted: $latest")
        val (_, cnt, err) = latest(w)
        assert(truth(w) <= cnt && cnt - err <= truth(w),
          s"$w: true ${truth(w)} outside [${cnt - err}, $cnt]")
      }
    } finally q.stop()
  }
}
