package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Windowed-aggregation semantics (SURVEY.md §2.4): continuous vs
  * emit-on-close emission, grace/late-drop, session merging — the
  * reference's fixtures 2–5 (FIXTURES.md §B). */
class WindowedStreamsSpec extends SparkSpec {

  private val base = 1700000000L // arbitrary epoch seconds
  private def ts(offsetSec: Long) = new Timestamp((base + offsetSec) * 1000)

  case class Ev(key: String, value: Int, ts: Timestamp)

  test("tumbling sum, update mode: continuous per-window changelog (fixture 2)") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[Ev]
    val agg = WindowedStreams.tumblingSum(in.toDF(), "ts", "1 second", "0 seconds",
      "value", col("key"))
    val q = agg.select(col("window.start").cast("long").as("win"), col("key"), col("total"))
      .writeStream.format("memory").queryName("tumsum").outputMode("update").start()
    try {
      in.addData(Ev("hmida", 10, ts(0)), Ev("hmida", 20, ts(0)), Ev("hmida", 15, ts(0)),
        Ev("lambda", 50, ts(1)), Ev("hmida", 30, ts(1)))
      q.processAllAvailable()
      // final value per (window,key) — update mode re-emits, take the last
      val finalRows = s.table("tumsum")
        .groupBy("win", "key").agg(max("total").as("total"))
        .as[(Long, String, Long)].collect().toSet
      assert(finalRows == Set(
        (base, "hmida", 45L), (base + 1, "hmida", 30L), (base + 1, "lambda", 50L)))
    } finally q.stop()
  }

  test("emit-on-close (append mode): window emits only after watermark passes its end (fixture 4)") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[Ev]
    val agg = WindowedStreams.tumblingCounts(in.toDF(), "ts", "10 seconds", "0 seconds",
      col("key"))
    val q = agg.select(col("window.start").cast("long").as("win"), col("key"), col("count"))
      .writeStream.format("memory").queryName("emitclose").outputMode("append").start()
    try {
      in.addData(Ev("key1", 1, ts(0)), Ev("key1", 1, ts(2)), Ev("key1", 1, ts(4)))
      q.processAllAvailable()
      assert(s.table("emitclose").count() == 0, "open window must not emit")

      in.addData(Ev("key1", 1, ts(11)))   // advances max event time to +11
      q.processAllAvailable()
      in.addData(Ev("key1", 1, ts(15)))   // watermark (=11) now closes [0,10)
      q.processAllAvailable()
      val afterClose = s.table("emitclose").as[(Long, String, Long)].collect().toSet
      assert(afterClose == Set((base, "key1", 3L)), "window [0,10) emits exactly once with final count")

      in.addData(Ev("key1", 1, ts(100))) // advances watermark past [10,20)
      q.processAllAvailable()
      in.addData(Ev("key1", 1, ts(101))) // one more batch so the close materializes
      q.processAllAvailable()
      val afterAll = s.table("emitclose").as[(Long, String, Long)].collect().toSet
      assert(afterAll == Set((base, "key1", 3L), (base + 10, "key1", 2L)),
        "final open window [100,110) never emits")
    } finally q.stop()
  }

  test("grace: late record within grace is aggregated, later than grace is dropped (fixture W1/W2)") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[Ev]
    val agg = WindowedStreams.tumblingCounts(in.toDF(), "ts", "10 seconds", "5 seconds",
      col("key"))
    val q = agg.select(col("window.start").cast("long").as("win"), col("key"), col("count"))
      .writeStream.format("memory").queryName("grace").outputMode("update").start()
    try {
      in.addData(Ev("k", 1, ts(1)), Ev("k", 1, ts(12)))
      q.processAllAvailable()
      in.addData(Ev("k", 1, ts(9)))   // watermark = 12-5 = 7 ≤ 9 → accepted
      q.processAllAvailable()
      in.addData(Ev("k", 1, ts(30)))  // watermark → 25
      q.processAllAvailable()
      in.addData(Ev("k", 1, ts(2)))   // 2 < 25 → dropped (window [0,10) closed)
      q.processAllAvailable()
      val finalRows = s.table("grace")
        .groupBy("win", "key").agg(max("count").as("cnt"))
        .as[(Long, String, Long)].collect().toSet
      assert(finalRows == Set((base, "k", 2L), (base + 10, "k", 1L), (base + 30, "k", 1L)),
        "late-within-grace counted (2), late-after-grace dropped")
    } finally q.stop()
  }

  test("sliding windows (advanceBy < size): each event counted in every overlapping window") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[Ev]
    // width 4s, slide 2s: an event at t lands in 2 windows
    val agg = WindowedStreams.slidingCounts(in.toDF(), "ts", "4 seconds", "2 seconds",
      "0 seconds", col("key"))
    val q = agg.select(col("window.start").cast("long").as("win"), col("key"), col("count"))
      .writeStream.format("memory").queryName("slidecnt").outputMode("update").start()
    try {
      in.addData(Ev("k", 1, ts(0)), Ev("k", 1, ts(1)), Ev("k", 1, ts(3)))
      q.processAllAvailable()
      val finalRows = s.table("slidecnt")
        .groupBy("win", "key").agg(max("count").as("cnt"))
        .as[(Long, String, Long)].collect().toSet
      // t=0 -> windows [-2,2) [0,4); t=1 -> same; t=3 -> [0,4) [2,6)
      assert(finalRows == Set(
        (base - 2, "k", 2L), (base, "k", 3L), (base + 2, "k", 1L)))
    } finally q.stop()
  }

  test("session windows, 2s gap: foo splits, bar merges (fixture 3)") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[Ev]
    val agg = WindowedStreams.sessionCounts(in.toDF(), "ts", "2 seconds", "0 seconds",
      col("key"))
    val q = agg.select(col("session_window.start").cast("long").as("start"),
        col("key"), col("count"))
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      in.addData(
        Ev("foo", 1, ts(0)), Ev("foo", 1, ts(1)), Ev("foo", 1, ts(4)),
        Ev("bar", 1, ts(0)), Ev("bar", 1, ts(1)), Ev("bar", 1, ts(2)),
        Ev("bar", 1, ts(4)), Ev("bar", 1, ts(5)))
      q.processAllAvailable()
      // close every session: advance the watermark far past last+gap
      in.addData(Ev("zzz", 1, ts(100)))
      q.processAllAvailable()
      in.addData(Ev("zzz", 1, ts(200)))
      q.processAllAvailable()
      val finalRows = s.table("sess").filter(col("key") =!= "zzz")
        .as[(Long, String, Long)].collect().toSet
      // foo: [0s..] 2 events, gap 3s > 2s → new session at 4s
      // bar: every inter-event gap ≤ 2s → one merged session of 5
      assert(finalRows == Set(
        (base, "foo", 2L), (base + 4, "foo", 1L), (base, "bar", 5L)))
    } finally q.stop()
  }

  test("dynamic-gap sessions: closed stream windows ≡ batch replay (w5 twin)") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    // per-event gap: clicks expire in 5 s, views in 20 s (the w5 rule
    // scaled down); a long-gap event can bridge past a short-gap one
    def gapCol = when(col("typ") === "click",
        expr("make_interval(0,0,0,0,0,0,5)"))
      .otherwise(expr("make_interval(0,0,0,0,0,0,20)"))
    val events = Seq(
      TEv("u", "click", ts(0)),   // [0, 5)
      TEv("u", "view", ts(3)),    // bridges: end -> 23
      TEv("u", "click", ts(10)),  // 10 <= 23 -> merges, end stays 23
      TEv("u", "click", ts(30)),  // past 23 -> new session [30, 35)
      TEv("u", "view", ts(60)))   // new session [60, 80)
    val in = MemoryStream[TEv]
    val agg = WindowedStreams.dynamicSessionCounts(in.toDF(), "ts", gapCol,
      "0 seconds", col("key"))
    val q = agg.select(col("session_window.start").cast("long").as("start"),
        col("session_window.end").cast("long").as("end"),
        col("key"), col("count"))
      .writeStream.format("memory").queryName("dynsess").outputMode("append").start()
    try {
      in.addData(events.take(3): _*)
      q.processAllAvailable()
      in.addData(events.drop(3): _*)
      q.processAllAvailable()
      // close everything: watermark far past the last u-session's end
      in.addData(TEv("zzz", "view", ts(1000)))
      q.processAllAvailable()
      in.addData(TEv("zzz", "view", ts(2000)))
      q.processAllAvailable()
      val stream = s.table("dynsess").filter(col("key") =!= "zzz")
        .as[(Long, Long, String, Long)].collect().toSet
      // hand-computed (merge is end-inclusive, end = max member ts+gap)
      assert(stream == Set(
        (base, base + 23, "u", 3L),
        (base + 30, base + 35, "u", 1L),
        (base + 60, base + 80, "u", 1L)))
      // batch replay of the SAME dynamic-gap operator over the same rows
      val batch = events.toDF()
        .groupBy(session_window(col("ts"), gapCol), col("key"))
        .count()
        .select(col("session_window.start").cast("long"),
          col("session_window.end").cast("long"), col("key"), col("count"))
        .as[(Long, Long, String, Long)].collect().toSet
      assert(stream == batch, "closed streaming sessions must equal the batch replay")
    } finally q.stop()
  }
}

/** Top-level (not nested in the spec) so Spark can build its encoder
  * without an outer-scope instance. */
case class TEv(key: String, typ: String, ts: Timestamp)
