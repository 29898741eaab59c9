package graft.streaming

import graft.{SparkSpec, Tables}
import graft.functions.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The x39 HLL sketch ported to streaming: the register table
  * (group, bucket, max rho) IS the streaming state — an update-mode
  * aggregation whose per-group footprint is ≤ 2^b one-byte registers,
  * never the value set. Finalizing the latest emission with the SAME
  * [[Sketches.hllEstimate]] the batch path uses must reproduce the
  * batch x39 output exactly (register max is order- and
  * batching-insensitive, so incremental arrival changes nothing). */
class StreamingHllSpec extends SparkSpec {

  test("streamed registers finalize to the exact batch estimate (sf0.001)") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext

    val dir = "/root/testdata/sf0.001"
    val rows = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"))
      .as[(String, Long)].collect()

    val in = MemoryStream[(String, Long)]
    val regs = Sketches.hllRegisters(
      in.toDF().toDF("event_type", "user_id"), Seq("event_type"), "user_id")
    val q = regs.writeStream.format("memory").queryName("hllregs")
      .outputMode("update").start()
    try {
      rows.grouped(rows.length / 4 + 1).foreach { chunk =>
        in.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // latest value per (group, bucket) = the final register table;
      // state is register-sized, strictly below the event count
      val finalRegs = s.table("hllregs")
        .groupBy("event_type", "__b").agg(max("__m").as("__m"))
      assert(finalRegs.count() < rows.length,
        "register table did not compress the stream")

      val streamed = Sketches.hllEstimate(finalRegs, Seq("event_type"),
          outCol = "est_users")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val batch = graft.SparkEntry.queries("x39_hll_distinct")(s, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(streamed == batch,
        s"stream/batch divergence: stream=$streamed batch=$batch")
    } finally q.stop()
  }
}
