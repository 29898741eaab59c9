package graft.streaming

import graft.SparkSpec
import org.apache.hadoop.fs.Path

import java.nio.file.Files

/** Bucket-partitioned changelog materializer: same merge semantics as
  * ChangelogSink, but a batch only rewrites the buckets it touches. */
class BucketedChangelogSinkSpec extends SparkSpec {

  test("merge semantics match the whole-table sink on the same change sequence") {
    val s = spark
    import s.implicits._
    val flat = Files.createTempDirectory("graft_bsink_a").toString + "/t"
    val bucketed = Files.createTempDirectory("graft_bsink_b").toString + "/t"
    val batches = Seq(
      Seq(Change("a", "a1", null, 1), Change("b", "b1", null, 2),
        Change("c", "c1", null, 3)),
      Seq(Change("a", "a2", "a1", 4), Change("b", null, "b1", 5)), // upsert + delete
      Seq(Change("d", "d1", null, 6), Change("b", "b2", null, 7)), // resurrect b
      Seq(Change("c", "c0", null, 2)) // stale replay — must lose
    )
    batches.foreach { b =>
      ChangelogSink.applyBatch(b.toDS(), flat)
      BucketedChangelogSink.applyBatch(b.toDS(), bucketed, numBuckets = 4)
    }
    val a = ChangelogSink.view(s, flat)
      .as[(String, String, Long)].collect().sortBy(_._1).toList
    val b = BucketedChangelogSink.view(s, bucketed)
      .as[(String, String, Long)].collect().sortBy(_._1).toList
    assert(a == b)
    assert(a.map(_._1) == List("a", "b", "c", "d"))
  }

  test("a batch rewrites ONLY the buckets it touches") {
    val s = spark
    import s.implicits._
    val table = Files.createTempDirectory("graft_bsink_touch").toString + "/t"
    val n = 8
    // seed every bucket (key per bucket id found by probing the same hash)
    val seed = (0 until 64).map(i => Change(s"k$i", s"v$i", null, i.toLong))
    BucketedChangelogSink.applyBatch(seed.toDS(), table, n)

    val fs = new Path(table).getFileSystem(s.sparkContext.hadoopConfiguration)
    // per-bucket newest-file stamp, tolerant of unseeded buckets
    def stamps(): Map[String, Long] =
      fs.listStatus(new Path(table))
        .filter(st => st.getPath.getName.startsWith("b=") &&
          !st.getPath.getName.contains("."))
        .map(st => st.getPath.getName ->
          fs.listStatus(st.getPath).map(_.getModificationTime).max)
        .toMap
    val before = stamps()
    assert(before.size > 1, s"seed should populate several buckets: $before")

    // one more change for a single key → exactly one bucket's stamp moves
    Thread.sleep(1100) // parquet mtimes are second-granular on some fs
    BucketedChangelogSink.applyBatch(
      Seq(Change("k0", "v0b", "v0", 1000)).toDS(), table, n)
    val after = stamps()
    val changed = (before.keySet ++ after.keySet)
      .count(b => before.get(b) != after.get(b))
    assert(changed == 1, s"expected exactly 1 rewritten bucket, got $changed")

    // and the merge landed
    val live = BucketedChangelogSink.view(s, table)
      .filter($"key" === "k0").as[(String, String, Long)].collect().toList
    assert(live == List(("k0", "v0b", 1000L)))
  }

  test("streaming entry: changes stream materializes through the bucketed sink") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val table = Files.createTempDirectory("graft_bsink_stream").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_bsink_stream_ckpt").toString
    val in = MemoryStream[Rec]
    val q = BucketedChangelogSink.start(
      KTableStream.changes(in.toDS()), table, ckpt, numBuckets = 4)
    try {
      in.addData(Rec("a", "a1", 0, 1), Rec("b", "b1", 0, 2)); q.processAllAvailable()
      in.addData(Rec("a", "a2", 0, 3), Rec("b", null, 0, 4)); q.processAllAvailable()
      val live = BucketedChangelogSink.view(s, table)
        .as[(String, String, Long)].collect().sortBy(_._1).toList
      assert(live == List(("a", "a2", 3L)))
    } finally q.stop()
  }

  test("merge schedules O(1) jobs no matter how many buckets a batch touches") {
    val s = spark
    import s.implicits._
    val table = Files.createTempDirectory("graft_bsink_jobs").toString + "/t"
    val n = 32
    val seed = (0 until 256).map(i => Change(s"k$i", s"v$i", null, i.toLong))
    BucketedChangelogSink.applyBatch(seed.toDS(), table, n)

    // a batch touching every bucket: the earlier per-bucket merge loop
    // scheduled ≥ one write job per touched bucket (≥ 32 here); the
    // single-job merge stays at a handful (touched-list collect + the
    // staged write's AQE stages), independent of the touched count
    val batch = (0 until 256).map(i => Change(s"k$i", s"w$i", s"v$i", 1000L + i))
    s.sparkContext.setJobGroup("bsink-merge-jobs", "bucketed sink merge")
    try BucketedChangelogSink.applyBatch(batch.toDS(), table, n)
    finally s.sparkContext.clearJobGroup()
    val jobs = s.sparkContext.statusTracker.getJobIdsForGroup("bsink-merge-jobs").length
    assert(jobs > 0, "job-group tracking captured nothing")
    assert(jobs <= 10, s"expected O(1) jobs for the merge, got $jobs")

    val live = BucketedChangelogSink.view(s, table)
      .as[(String, String, Long)].collect()
    assert(live.length == 256)
    assert(live.forall(r => r._2 == "w" + r._1.drop(1)), "merge lost updates")
  }

  test("an empty _buckets marker fails with a repair hint, not a parse error") {
    val s = spark
    import s.implicits._
    val table = Files.createTempDirectory("graft_bsink_badmarker").toString + "/t"
    BucketedChangelogSink.applyBatch(
      Seq(Change("a", "a1", null, 1)).toDS(), table, numBuckets = 4)
    val fs = new Path(table).getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(s"$table/_buckets"), true)
    out.close() // simulate a crash between create and write: empty marker
    val e = intercept[IllegalStateException] {
      BucketedChangelogSink.applyBatch(
        Seq(Change("a", "a2", "a1", 2)).toDS(), table, numBuckets = 4)
    }
    assert(e.getMessage.contains("unreadable _buckets marker"), e.getMessage)
  }

  test("reopening with a different bucket count is rejected") {
    val s = spark
    import s.implicits._
    val table = Files.createTempDirectory("graft_bsink_marker").toString + "/t"
    BucketedChangelogSink.applyBatch(
      Seq(Change("a", "a1", null, 1)).toDS(), table, numBuckets = 4)
    val e = intercept[IllegalArgumentException] {
      BucketedChangelogSink.applyBatch(
        Seq(Change("a", "a2", "a1", 2)).toDS(), table, numBuckets = 8)
    }
    assert(e.getMessage.contains("4 buckets"))
  }

  test("per-bucket half-done swap: view falls back to that bucket's backup") {
    val s = spark
    import s.implicits._
    val table = Files.createTempDirectory("graft_bsink_crash").toString + "/t"
    BucketedChangelogSink.applyBatch(
      Seq(Change("a", "a1", null, 1), Change("b", "b1", null, 2)).toDS(),
      table, numBuckets = 2)
    val fs = new Path(table).getFileSystem(s.sparkContext.hadoopConfiguration)
    // crash one bucket between its two renames
    val dirs = fs.listStatus(new Path(table)).map(_.getPath.getName)
      .filter(d => d.startsWith("b=") && !d.contains("."))
    val victim = dirs.head
    assert(fs.rename(new Path(s"$table/$victim"), new Path(s"$table/$victim.old")))
    fs.mkdirs(new Path(s"$table/$victim.tmp-orphan"))

    val live = BucketedChangelogSink.view(s, table)
      .as[(String, String, Long)].collect().map(t => t._1 -> t._2).toMap
    assert(live == Map("a" -> "a1", "b" -> "b1"))
  }
}
