package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Closed streaming session paths equal the batch x55 sessionizer's
  * paths (gap > 300 s starts a new session; path = event types in
  * (ts_sec, event_id) order), including under intra-session disorder. */
class StreamSessionPathsSpec extends SparkSpec {

  case class PEv(user_id: Long, event_id: Long, ts_sec: Long,
                 event_type: String, ts: java.sql.Timestamp)

  private def ev(u: Long, id: Long, sec: Long, t: String): PEv =
    PEv(u, id, sec, t, new java.sql.Timestamp(sec * 1000L))

  private def run(batches: Seq[Seq[PEv]], closeAt: Long): Seq[(Long, Long, String)] = {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[PEv]
    val name = s"spaths${System.nanoTime()}"
    val q = WindowedStreams.sessionPaths(in.toDF(), "ts", "300 seconds",
        "0 seconds", "user_id", "event_type", "ts_sec", "event_id")
      .select(col("user_id"), col("n_events").cast("long").as("n_events"),
        col("path"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      // two sentinel batches push the watermark far past every session
      in.addData(ev(999, 0, closeAt, "x")); q.processAllAvailable()
      in.addData(ev(999, 1, closeAt * 2, "x")); q.processAllAvailable()
      s.table(name).filter(col("user_id") =!= 999)
        .as[(Long, Long, String)].collect().toSeq
    } finally q.stop()
  }

  /** Batch x55 replay: per user (ts, id)-sorted, gap > 300 splits. */
  private def batchPaths(rows: Seq[PEv]): Seq[(Long, Long, String)] =
    rows.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.ts_sec, e.event_id))
      val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
        case (acc, e) =>
          if (e.ts_sec - acc.last.last.ts_sec > 300) acc :+ Vector(e)
          else acc.init :+ (acc.last :+ e)
      }
      sessions.map(ss => (u, ss.size.toLong, ss.map(_.event_type).mkString(">")))
    }

  test("out-of-order arrivals inside a session still produce the ordered path") {
    // disorder INSIDE one batch (with grace 0, cross-batch regression
    // would be watermark-dropped — the w2 late-drop contract)
    val rows = Seq(ev(1, 3, 200, "purchase"), ev(1, 1, 0, "view"), ev(1, 2, 100, "click"))
    val got = run(Seq(rows), 10000)
    assert(got.toSet == Set((1L, 3L, "view>click>purchase")))
  }

  test("gap boundary: 300 s merges (the batch > rule), 301 s splits") {
    val rows = Seq(ev(1, 1, 0, "a"), ev(1, 2, 300, "b"),
      ev(2, 3, 0, "a"), ev(2, 4, 301, "b"))
    val got = run(Seq(rows), 10000)
    assert(got.toSet == Set((1L, 2L, "a>b"), (2L, 1L, "a"), (2L, 1L, "b")))
  }

  test("randomized event streams: closed paths equal the batch x55 replay") {
    val rnd = new scala.util.Random(300)
    for (round <- 1 to 3) {
      val rows = Vector.tabulate(100)(i => ev(1 + rnd.nextInt(5).toLong, i.toLong,
        rnd.nextInt(3000).toLong,
        Seq("view", "click", "purchase")(rnd.nextInt(3))))
      val cut = 30 + rnd.nextInt(40)
      // time-ordered batches: with grace 0 the watermark jumps to the
      // max seen ts, so late rows would be DROPPED (the w2 contract) —
      // ordering keeps the fixture in the no-late regime batch replay models
      val ordered = rows.sortBy(e => (e.ts_sec, e.event_id))
      val got = run(Seq(ordered.take(cut), ordered.drop(cut)), 100000)
      assert(got.sorted == batchPaths(rows).sorted, s"round=$round")
    }
  }
}
