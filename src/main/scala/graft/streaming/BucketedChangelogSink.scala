package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Bucket-partitioned changelog materializer — the O(touched work)
  * refinement of [[ChangelogSink]] on a bare filesystem.
  *
  * [[ChangelogSink.applyBatch]] rewrites the WHOLE table per merge; fine
  * as a semantics contract, wrong at scale when each batch touches a few
  * keys of a huge table. Here the table is laid out as `numBuckets` hash
  * buckets of the key (`b=NNNN/` dirs), a batch's rows route to their
  * buckets, and ONLY the touched buckets are read, merged
  * (same seq/upsert-wins/value total order), and atomically swapped —
  * per-batch work is O(Σ touched-bucket size + batch), not O(table).
  * With buckets sized to row-group-friendly chunks this is the plain-
  * parquet approximation of a row-level MERGE INTO; a transactional
  * table format still improves on it (file-level instead of
  * bucket-level rewrite, snapshot isolation across buckets), but the
  * work bound is now the same shape.
  *
  * Crash safety: [[ChangelogSink]]'s rename-swap protocol applied per
  * bucket (`b=N` ↔ `b=N.old` + unique tmp). A crash mid-batch leaves
  * every bucket individually complete — some merged, some not; the
  * streaming checkpoint replays the batch and the seq comparison makes
  * the re-merge idempotent, so the table converges. Readers resolve each
  * bucket independently (target, else `.old`).
  */
object BucketedChangelogSink {

  private def bucketOf(key: org.apache.spark.sql.Column, numBuckets: Int) =
    pmod(hash(key), lit(numBuckets))

  /** Start materializing `changes` into `tablePath` with `numBuckets`
    * hash buckets. Same contract as [[ChangelogSink.start]]. */
  def start(changes: Dataset[Change], tablePath: String, checkpoint: String,
            numBuckets: Int, outputMode: String = "append"): StreamingQuery =
    changes.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Change], _: Long) =>
        applyBatch(batch, tablePath, numBuckets)
      }
      .start()

  /** One merge step over ONLY the buckets the batch touches.
    *
    * The bucket count is part of the table LAYOUT: it is recorded in a
    * `_buckets` marker on first write and every later batch must pass
    * the same value — merging with a different count would route keys to
    * different buckets than their existing rows and leave duplicate live
    * versions per key (re-bucketing is a full rewrite, not a parameter
    * change).
    *
    * Work bound AND job bound: per-batch data work is O(Σ touched-bucket
    * size + batch) as before, and the merge is ONE Spark write — current
    * rows of every touched bucket union the batch, merge in a single
    * aggregation, and land in a staging dir partitioned by bucket id;
    * the driver then commits each bucket's staged dir with the same
    * per-bucket rename swap. An earlier revision ran one merge job PER
    * touched bucket, so a batch touching hundreds of buckets paid
    * hundreds of driver-scheduled jobs of latency for the same work.
    *
    * Crash safety is unchanged: nothing under `b=N` moves until the
    * staged write has fully succeeded, each bucket's swap is individually
    * atomic, and a crash anywhere (during staging, or between swaps)
    * leaves every bucket complete on one side of its swap; checkpoint
    * replay re-merges idempotently via the seq order. Orphaned staging
    * dirs from crashed batches are reclaimed on the next batch. */
  def applyBatch(batch: Dataset[Change], tablePath: String,
                 numBuckets: Int): Unit = {
    require(numBuckets > 0, s"need numBuckets > 0, got $numBuckets")
    val spark = batch.sparkSession
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tablePath).getFileSystem(conf)

    checkOrRecordLayout(fs, tablePath, numBuckets)

    val routed = batch.select(col("key"), col("value"), col("seq"))
      .withColumn("__b", bucketOf(col("key"), numBuckets))
    // the touched-bucket list is ≤ numBuckets ids — driver-small by
    // construction, the same bound a MERGE planner's touched-file list has
    val touched = routed.select("__b").distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return

    // reclaim debris from crashed predecessors: per-bucket swap temps and
    // whole staging dirs (recovery never reads either)
    touched.foreach(b => SwapDir.cleanStaleTmp(fs, s"$tablePath/b=$b"))
    fs.globStatus(new Path(s"$tablePath/.staging-*")) match {
      case null => ()
      case stale => stale.foreach(st => fs.delete(st.getPath, true))
    }

    // current rows of ALL touched buckets in one scan; the bucket id is
    // recomputed from the key (same layout function, so identical to the
    // directory each row was read from)
    val currentPaths = touched.flatMap(b =>
      SwapDir.resolveCurrent(fs, s"$tablePath/b=$b"))
    val current =
      if (currentPaths.isEmpty)
        Seq.empty[(String, String, Long)].toDF("key", "value", "seq")
          .withColumn("__b", lit(0))
      else spark.read.parquet(currentPaths.toIndexedSeq: _*)
        .withColumn("__b", bucketOf(col("key"), numBuckets))
    // one merge for every touched bucket: keys are unique to a bucket, so
    // grouping by key alone is correct and __b rides through latestByKey
    val merged = graft.operators.Changelog.latestByKey(
      current.unionByName(routed),
      Seq("key"), Seq(col("seq"), col("value").isNotNull, col("value")))

    // ONE staged write, partitioned by bucket — `__b=N` dirs hold exactly
    // the post-merge content of bucket N (partitionBy keeps __b out of
    // the data files, matching the b=N layout: key, value, seq)
    val staging = s"$tablePath/.staging-" + java.util.UUID.randomUUID()
    merged.write.mode(SaveMode.Overwrite).partitionBy("__b").parquet(staging)

    // commit each touched bucket's staged dir via the rename swap; a
    // touched bucket always has ≥1 merged row (latestByKey keeps
    // tombstone rows), so a missing staged dir means lost rows — fail
    // loudly rather than silently dropping the bucket's batch
    touched.foreach { b =>
      val src = new Path(s"$staging/__b=$b")
      if (!fs.exists(src))
        throw new IllegalStateException(
          s"staged output missing for touched bucket $b under $staging")
      SwapDir.commit(fs, s"$tablePath/b=$b", src)
    }
    fs.delete(new Path(staging), true)
  }

  /** Validate the `_buckets` layout marker, recording it on first write.
    * The marker is written to a temp file and renamed into place so a
    * crash can never leave a half-written (empty) marker that poisons
    * every later batch; an unparseable marker fails with a repair hint
    * instead of a bare NumberFormatException. */
  private def checkOrRecordLayout(fs: org.apache.hadoop.fs.FileSystem,
                                  tablePath: String, numBuckets: Int): Unit = {
    val marker = new Path(s"$tablePath/_buckets")
    def validate(): Unit = {
      val in = fs.open(marker)
      val raw = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim finally in.close()
      val recorded = raw.toIntOption.getOrElse(throw new IllegalStateException(
        s"unreadable _buckets marker at $marker (content: '$raw') — " +
          "restore it to the table's original bucket count"))
      require(recorded == numBuckets,
        s"table $tablePath was laid out with $recorded buckets; " +
          s"got numBuckets=$numBuckets — re-bucketing requires a full rewrite")
    }
    if (fs.exists(marker)) validate()
    else {
      val tmp = new Path(s"$tablePath/_buckets.tmp-" + java.util.UUID.randomUUID())
      val out = fs.create(tmp, true)
      try out.write(numBuckets.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
      if (!fs.rename(tmp, marker)) {
        fs.delete(tmp, true)
        // lost a race with (or found debris from) another writer: the
        // marker must exist now — hold it to the same validation
        validate()
      }
    }
  }

  /** Live rows across all buckets (tombstones filtered), each bucket
    * resolved to its surviving side of the swap independently. */
  def view(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(tablePath)))
      return Seq.empty[(String, String, Long)].toDF("key", "value", "seq")
        .filter(col("value").isNotNull)
    val dirs = fs.listStatus(new Path(tablePath)).map(_.getPath.getName)
    val live = dirs.filter(d => d.startsWith("b=") && !d.contains(".")).toSet
    val fallback = dirs.filter(_.endsWith(".old"))
      .map(_.stripSuffix(".old")).filterNot(live).toSet
    val paths = (live ++ fallback.map(_ + ".old")).toSeq.sorted
      .map(d => s"$tablePath/$d")
    if (paths.isEmpty)
      Seq.empty[(String, String, Long)].toDF("key", "value", "seq")
        .filter(col("value").isNotNull)
    else spark.read.parquet(paths: _*).filter(col("value").isNotNull)
  }
}
