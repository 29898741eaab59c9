package graft.streaming

import graft.SparkSpec
import graft.functions.TimeSeries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The incrementally-maintained daily-cell table equals the batch
  * (group, day) aggregation after every prefix, the changepoint readout
  * over the VIEW equals the batch changepoint over raw events (one
  * shared function — `changepointFromCells`), redelivered batches
  * converge (absolute-value upsert), and the maintained sums survive a
  * checkpoint restart. */
case class DailyEv(g: String, ts_sec: Long, milli: Long)

class StreamDailyCellsSpec extends SparkSpec {

  import graft.streaming.{DailyEv => Ev}
  private val Ev = DailyEv

  private def freshDirs(): (String, String) = (
    Files.createTempDirectory("cells_t").toString + "/table",
    Files.createTempDirectory("cells_c").toString)

  // a step series per group: low regime then high, plus a flat group
  private val fixture: Seq[Ev] =
    (0 until 20).map(d => Ev("step", d * 86400L + 17, if (d < 12) 2000L else 9000L)) ++
    (0 until 20).flatMap(d => Seq(
      Ev("noisy", d * 86400L + 3600, (d % 5) * 700L),
      Ev("noisy", d * 86400L + 7200, 100L + (d % 3) * 50L)))

  private def batchCells(rows: Seq[Ev]): Map[(String, Long), Long] =
    rows.groupBy(e => (e.g, e.ts_sec / 86400)).view
      .mapValues(_.map(_.milli).sum).toMap

  test("maintained cells ≡ batch aggregation after every prefix; view readout ≡ batch") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val (table, ckpt) = freshDirs()
    val in = MemoryStream[Ev]
    val q = StreamDailyCells.start(in.toDS().toDF(), table, ckpt)
    try {
      val batches = fixture.grouped(23).toSeq
      var seen = Seq.empty[Ev]
      batches.foreach { b =>
        in.addData(b); q.processAllAvailable()
        seen ++= b
        val got = StreamDailyCells.cells(s, table)
          .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(got == batchCells(seen), s"cells diverged after ${seen.size} events")
      }
      // readout over the view ≡ batch changepoint over the raw events,
      // via the ONE shared function
      val view = TimeSeries.changepointFromCells(
        StreamDailyCells.cells(s, table).withColumnRenamed("g", "grp"), "grp")
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
      val batch = TimeSeries.changepoint(
        fixture.toDF("grp", "ts", "m").select(col("grp"), col("ts"),
          (col("m").cast("double") / 1000.0).as("v")),
        "grp", "ts", "v")
        .collect().map(r => (r.getString(0), r.getLong(2))).toMap
      assert(view == batch, s"view readout $view must equal batch $batch")
      assert(view("step") == 11L, s"the step split must land on day 11: $view")
      // and the x132 wavelet readout rides the same shared-function
      // theorem: haarFromCells(view) ≡ haarTopDetails(raw events)
      val viewHaar = TimeSeries.haarFromCells(
        StreamDailyCells.cells(s, table).withColumnRenamed("g", "grp"), "grp")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
          r.getInt(3), r.getLong(4))).toSet
      val batchHaar = TimeSeries.haarTopDetails(
        fixture.toDF("grp", "ts", "m").select(col("grp"), col("ts"),
          (col("m").cast("double") / 1000.0).as("v")),
        "grp", "ts", "v")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
          r.getInt(3), r.getLong(4))).toSet
      assert(viewHaar == batchHaar,
        s"wavelet view readout $viewHaar must equal batch $batchHaar")
    } finally q.stop()
  }

  test("redelivered batch converges: absolute-value upsert is idempotent") {
    val s = spark
    import s.implicits._
    val (table, _) = freshDirs()
    val b1 = fixture.take(15).toDF("g", "ts_sec", "milli")
      .groupBy(col("g"), expr("ts_sec div 86400").as("day"))
      .agg(sum("milli").as("m"))
    // apply the same batch twice through the private upsert path via
    // two starts of the same data — the store must hold ONE copy
    val m = classOf[StreamDailyCells.type].getDeclaredMethods
      .find(_.getName == "upsert").get
    m.setAccessible(true)
    m.invoke(StreamDailyCells, b1, table)
    m.invoke(StreamDailyCells, b1, table)
    val got = StreamDailyCells.cells(s, table)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == batchCells(fixture.take(15)), s"double-apply must converge: $got")
  }

  test("checkpoint restart: sums carry over, post-restart events extend them") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val (table, ckpt) = freshDirs()
    val (first, rest) = fixture.splitAt(25)
    val in1 = MemoryStream[Ev]
    val q1 = StreamDailyCells.start(in1.toDS().toDF(), table, ckpt)
    try { in1.addData(first); q1.processAllAvailable() } finally q1.stop()

    val in2 = MemoryStream[Ev]
    // same checkpoint, fresh MemoryStream (the StreamOverWindowSpec
    // restart pattern): the first leg's data is re-added so the
    // committed offsets replay — the restarted aggregation resumes its
    // exact sums and the absolute-value upsert converges on replay —
    // then the post-restart events extend the same cells
    val q2 = StreamDailyCells.start(in2.toDS().toDF(), table, ckpt)
    try {
      in2.addData(first); q2.processAllAvailable()
      in2.addData(rest); q2.processAllAvailable()
      val got = StreamDailyCells.cells(s, table)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == batchCells(fixture),
        "restarted maintainer must carry pre-restart sums forward")
    } finally q2.stop()
  }
}
