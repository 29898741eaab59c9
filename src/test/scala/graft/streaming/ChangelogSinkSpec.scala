package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

/** Changelog → materialized table: upserts overwrite, tombstones delete
  * from the view (but are retained as versioned rows), re-inserts
  * resurrect, and stale batch replays are idempotent — including a stale
  * upsert replayed AFTER the key was deleted. */
class ChangelogSinkSpec extends SparkSpec {

  test("stream of changes materializes to latest-per-key view with deletes applied") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val table = Files.createTempDirectory("graft_sink").toString + "/table"
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString
    val in = MemoryStream[Rec]
    val q = ChangelogSink.start(KTableStream.changes(in.toDS()), table, ckpt)
    try {
      in.addData(Rec("a", "a1", 0, 1), Rec("b", "b1", 0, 2)); q.processAllAvailable()
      in.addData(Rec("a", "a2", 0, 3)); q.processAllAvailable()   // overwrite a
      in.addData(Rec("b", null, 0, 4)); q.processAllAvailable()   // delete b
      in.addData(Rec("c", "c1", 0, 5)); q.processAllAvailable()
      val live = ChangelogSink.view(s, table).as[(String, String, Long)]
        .collect().sortBy(_._1).toList
      assert(live == List(("a", "a2", 3L), ("c", "c1", 5L)))
      // the tombstone row is RETAINED (versioned delete, like a compacted
      // topic before cleanup) — that's what makes post-delete replay safe
      val raw = s.read.parquet(table).as[(String, Option[String], Long)]
        .collect().sortBy(_._1).toList
      assert(raw.contains(("b", None, 4L)))
    } finally q.stop()
  }

  test("batch replay is idempotent: stale seqs never overwrite newer state") {
    val s = spark
    import s.implicits._
    val table = Files.createTempDirectory("graft_sink_replay").toString + "/table"
    ChangelogSink.applyBatch(
      Seq(Change("k", "v2", "v1", 7)).toDS(), table)
    // replay an OLDER change (at-least-once delivery) — must not regress
    ChangelogSink.applyBatch(
      Seq(Change("k", "v1", null, 3)).toDS(), table)
    val rows = ChangelogSink.view(s, table).as[(String, String, Long)].collect().toList
    assert(rows == List(("k", "v2", 7L)))
  }

  test("half-done swap (only .old survives): view reads backup, next batch recovers all keys") {
    val s = spark
    import s.implicits._
    val table = Files.createTempDirectory("graft_sink_crash").toString + "/table"
    ChangelogSink.applyBatch(
      Seq(Change("a", "a1", null, 1), Change("b", "b1", null, 2)).toDS(), table)
    // simulate a crash between rename(target→.old) and rename(tmp→target):
    // the committed table survives only as the backup, plus an orphaned tmp
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(table).getFileSystem(conf)
    assert(fs.rename(new org.apache.hadoop.fs.Path(table),
      new org.apache.hadoop.fs.Path(table + ".old")))
    fs.mkdirs(new org.apache.hadoop.fs.Path(table + ".tmp-orphan"))

    // reads fall back to the backup
    val live = ChangelogSink.view(s, table).as[(String, String, Long)]
      .collect().map(t => t._1 -> t._2).toMap
    assert(live == Map("a" -> "a1", "b" -> "b1"))

    // the next batch merges ON TOP of the backup — no committed key lost —
    // and reclaims the orphaned temp dir
    ChangelogSink.applyBatch(Seq(Change("c", "c1", null, 3)).toDS(), table)
    val after = ChangelogSink.view(s, table).as[(String, String, Long)]
      .collect().map(t => t._1 -> t._2).toMap
    assert(after == Map("a" -> "a1", "b" -> "b1", "c" -> "c1"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(table + ".tmp-orphan")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(table + ".old")))
  }

  test("stale upsert replayed AFTER a delete does not resurrect the key") {
    val s = spark
    import s.implicits._
    val table = Files.createTempDirectory("graft_sink_tomb").toString + "/table"
    ChangelogSink.applyBatch(Seq(Change("k", "v1", null, 1)).toDS(), table)
    ChangelogSink.applyBatch(Seq(Change("k", null, "v1", 4)).toDS(), table) // delete
    ChangelogSink.applyBatch(Seq(Change("k", "v1", null, 1)).toDS(), table) // replay
    assert(ChangelogSink.view(s, table).count() == 0)
    // equal-seq tie resolves upsert-over-tombstone (the FK join's tie rule)
    ChangelogSink.applyBatch(
      Seq(Change("z", null, null, 9), Change("z", "zv", null, 9)).toDS(), table)
    val z = ChangelogSink.view(s, table).as[(String, String, Long)].collect().toList
    assert(z == List(("z", "zv", 9L)))
  }
}
