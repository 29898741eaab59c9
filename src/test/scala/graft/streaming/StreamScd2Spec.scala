package graft.streaming

import graft.SparkSpec
import graft.operators.Changelog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** [[StreamScd2]]: the incrementally-maintained interval table must
  * EQUAL [[Changelog.scd2]] replayed over the full event log after
  * every micro-batch — runs extending across batch boundaries, null
  * runs, new keys mid-stream — and batch redelivery must be a no-op. */
class StreamScd2Spec extends SparkSpec {

  private def replay(recs: Seq[Rec]): Set[(String, String, Long, Option[Long], Boolean)] = {
    val s = spark
    import s.implicits._
    Changelog.scd2(recs.toDF(), Seq("key"), col("value"), col("ts"),
        Seq(col("ts"), col("seq")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))).toSet
  }

  private def tableNow(path: String): Set[(String, String, Long, Option[Long], Boolean)] =
    StreamScd2.table(spark, path)
      .collect().map(i => (i.key, i.value, i.valid_from, i.valid_to, i.is_current))
      .toSet

  test("maintained intervals ≡ batch scd2 replay after every micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val table = Files.createTempDirectory("graft_scd2").toString + "/scd2"
    val ckpt = Files.createTempDirectory("graft_scd2_ckpt").toString
    val in = MemoryStream[Rec]
    val q = StreamScd2.start(in.toDS(), table, ckpt)

    val fed = scala.collection.mutable.ArrayBuffer.empty[Rec]
    def feed(recs: Rec*): Unit = {
      fed ++= recs
      in.addData(recs: _*)
      q.processAllAvailable()
      assert(tableNow(table) == replay(fed.toSeq),
        s"intervals diverged from batch replay after seq ${recs.last.seq}")
    }

    try {
      // batch 1: two keys open their first intervals; u1 already changes once
      feed(Rec("u1", "a", 10, 1), Rec("u1", "b", 20, 2), Rec("u2", "x", 15, 3))
      assert(tableNow(table) == Set(
        ("u1", "a", 10L, Some(20L), false), ("u1", "b", 20L, None, true),
        ("u2", "x", 15L, None, true)))
      // batch 2: run EXTENDS across the batch boundary (no new interval),
      // then changes; u3 appears mid-stream
      feed(Rec("u1", "b", 30, 4), Rec("u1", "c", 40, 5), Rec("u3", "m", 35, 6))
      // batch 3: null is a value — u2 enters a null run, u3 extends
      feed(Rec("u2", null, 25, 7), Rec("u3", "m", 45, 8))
      // batch 4: null run continues (no new interval), then closes
      feed(Rec("u2", null, 30, 9), Rec("u2", "y", 50, 10))
      // final cross-check of the full table
      assert(tableNow(table) == replay(fed.toSeq))
      assert(tableNow(table).count(_._5) == 3, "one open interval per key")
    } finally q.stop()
  }

  test("randomized differential: arbitrary batch boundaries ≡ batch replay") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val rng = new scala.util.Random(1137)
    // per-key monotone ts (the CDC contract), random values incl. nulls,
    // random batch boundaries — 3 independent trials
    (1 to 3).foreach { trial =>
      val nextTs = scala.collection.mutable.Map.empty[String, Long]
      var seq = 0L
      val recs = (1 to 120).map { _ =>
        val k = s"k${rng.nextInt(6)}"
        val ts = nextTs.getOrElse(k, 0L) + 1 + rng.nextInt(5)
        nextTs(k) = ts
        seq += 1
        val v = if (rng.nextInt(5) == 0) null else s"v${rng.nextInt(3)}"
        Rec(k, v, ts, seq)
      }
      val table = Files.createTempDirectory(s"graft_scd2_rand$trial").toString + "/t"
      val ckpt = Files.createTempDirectory(s"graft_scd2_rand_ck$trial").toString
      val in = MemoryStream[Rec]
      val q = StreamScd2.start(in.toDS(), table, ckpt)
      try {
        var rest = recs
        while (rest.nonEmpty) {
          val n = 1 + rng.nextInt(25)
          val (batch, tail) = rest.splitAt(n)
          in.addData(batch: _*)
          q.processAllAvailable()
          rest = tail
        }
        assert(tableNow(table) == replay(recs),
          s"trial $trial diverged from batch replay")
      } finally q.stop()
    }
  }

  test("redelivery of an applied batch is a no-op; intervals keep chaining after") {
    val s = spark
    import s.implicits._
    val table = Files.createTempDirectory("graft_scd2_replay").toString + "/scd2"
    val b1 = Seq(Rec("u1", "a", 10, 1), Rec("u1", "b", 20, 2)).toDS()
    StreamScd2.applyBatch(b1, table, batchId = 0)
    val once = tableNow(table)
    // at-least-once redelivery: folding batch 0 again must not re-close
    // the open interval or duplicate rows
    StreamScd2.applyBatch(b1, table, batchId = 0)
    assert(tableNow(table) == once)
    val b2 = Seq(Rec("u1", "c", 30, 3)).toDS()
    StreamScd2.applyBatch(b2, table, batchId = 1)
    assert(tableNow(table) == Set(
      ("u1", "a", 10L, Some(20L), false),
      ("u1", "b", 20L, Some(30L), false),
      ("u1", "c", 30L, None, true)))
  }
}
