package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-vs-batch equivalence (SURVEY.md §5.2 #3): replaying the harness
  * `events` table through the streaming windowed aggregation, in event-time
  * order across several micro-batches, must reproduce the batch answer
  * exactly — the Dataflow-model correctness check for our windowing. */
case class ReplayEv(user_id: Long, value: Double, ts: Timestamp)

class StreamBatchEquivalenceSpec extends SparkSpec {

  test("replayed hourly tumbling counts equal the batch computation (sf0.001)") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext

    val events = Tables.events(s, "/root/testdata/sf0.001")
      .select(col("user_id"), col("value"), col("ts"))
      .as[ReplayEv].collect().sortBy(_.ts.getTime)

    val in = MemoryStream[ReplayEv]
    val agg = WindowedStreams.tumblingCounts(in.toDF(), "ts", "1 hour", "1 hour",
      col("user_id"))
    val q = agg.select(col("window.start").cast("long").as("win_start"),
        col("user_id"), col("count"))
      .writeStream.format("memory").queryName("replay").outputMode("update").start()
    try {
      // replay in 4 event-time-ordered chunks = watermark advances between
      // batches, late-but-within-grace data still lands correctly
      events.grouped(events.length / 4 + 1).foreach { chunk =>
        in.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val streamed = s.table("replay")
        .groupBy("win_start", "user_id").agg(max("count").as("cnt"))
        .as[(Long, Long, Long)].collect().toSet

      val batch = Tables.events(s, "/root/testdata/sf0.001")
        .groupBy(window(col("ts"), "1 hour").as("win"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("win.start").cast("long"), col("user_id"), col("cnt"))
        .as[(Long, Long, Long)].collect().toSet

      assert(streamed == batch,
        s"stream/batch divergence: onlyStream=${(streamed -- batch).take(5)} " +
          s"onlyBatch=${(batch -- streamed).take(5)}")
    } finally q.stop()
  }
}
