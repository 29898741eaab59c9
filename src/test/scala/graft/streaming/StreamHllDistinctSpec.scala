package graft.streaming

import graft.SparkSpec
import graft.functions.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream and batch share one sketch definition, so closed-window
  * registers — and therefore estimates — are EXACTLY the batch sketch
  * of the same rows, while open windows stay silent. */
class StreamHllDistinctSpec extends SparkSpec {

  private val SizeMs = 10000L

  private def drive(feed: Seq[Seq[Rec]]): Seq[(Long, String, Long, Int)] = {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[Rec]
    val name = s"hll${System.nanoTime()}"
    val q = StreamHllDistinct.windowedRegisters(in.toDS(), SizeMs, "0 seconds")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      feed.foreach { b => in.addData(b); q.processAllAvailable() }
      s.table(name).as[(Long, String, Long, Int)].collect().toSeq
    } finally q.stop()
  }

  private val feed = Seq(
    Seq(Rec("a", "u1", 1000, 1), Rec("a", "u2", 2000, 2),
        Rec("a", "u1", 3000, 3), Rec("b", "u1", 4000, 4)),
    Seq(Rec("a", "u3", 8000, 5), Rec("b", "u1", 9000, 6)),
    Seq(Rec("a", "u9", 15000, 7)),                       // closes [0, 10s)
    Seq(Rec("a", "u9", 95000, 8))                        // closes [10s, 20s)
  )

  test("closed-window registers equal the batch sketch exactly") {
    val s = spark
    import s.implicits._
    val out = drive(feed)
    assert(out.nonEmpty && out.forall(_._1 < 20000L), "only closed windows emit")

    val all = feed.flatten.toDS()
      .withColumn("win_start", (col("ts") - col("ts") % SizeMs))
      .filter(col("win_start") < 20000L) // the windows the stream closed
    val batch = Sketches.hllRegisters(all.toDF(), Seq("win_start", "key"), "value")
      .as[(Long, String, Long, Int)].collect().toSeq
    assert(out.sorted == batch.sorted)
  }

  test("finalized estimates equal the batch x39 readout exactly") {
    val s = spark
    import s.implicits._
    val regs = drive(feed).toDF("win_start", "key", "__b", "__m")
    val streamEst = StreamHllDistinct.estimates(regs)
      .as[(Long, String, Long, Double)].collect().toSeq.sorted

    val all = feed.flatten.toDS()
      .withColumn("win_start", (col("ts") - col("ts") % SizeMs))
      .filter(col("win_start") < 20000L)
    val batchEst = Sketches.hllDistinct(all.toDF(), Seq("win_start", "key"), "value")
      .as[(Long, String, Long, Double)].collect().toSeq.sorted
    assert(streamEst == batchEst)
    // tiny windows sit in the linear-counting regime: estimates are exact
    assert(streamEst.map(e => ((e._1, e._2), math.round(e._4))).toMap ==
      Map((0L, "a") -> 3L, (0L, "b") -> 1L, (10000L, "a") -> 1L))
  }
}
