package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Materializes a [[Change]] log into a queryable table — the
  * "update mode + MERGE-style sink" half of the KTable story (SURVEY.md
  * §2.5 J4 note, §4.2): the changelog is the stream, this sink maintains
  * the latest-change-per-key table of it.
  *
  * Tombstones are RETAINED as rows with a null value (a compacted topic
  * before cleanup, not after): that is what makes replay idempotent —
  * a redelivered stale upsert finds the higher-seq tombstone and loses
  * the merge instead of resurrecting a deleted key. [[view]] reads the
  * live rows (tombstones filtered); the raw table keeps the full merge
  * history heads.
  *
  * Crash safety on a bare filesystem: each merge writes a uniquely-named
  * temp dir, then swaps via `target → .old` + `tmp → target` renames and
  * only then drops `.old`. Every crash window leaves either `target` or
  * `.old` holding the complete previous table, and recovery reads
  * whichever survives — no window loses committed keys. (A real
  * deployment replaces the whole body with `MERGE INTO` a
  * Delta/Iceberg/Hudi table: identical batch-side semantics, real
  * transactional rename, and O(touched files) instead of O(table)
  * rewrite — which is the 100 TB answer; this parquet fallback is the
  * semantics contract, not the scale story. Concurrent writers on one
  * tablePath are out of scope, as with any directory-swap scheme.)
  */
object ChangelogSink {

  /** Start materializing `changes` into `tablePath` (parquet dir with
    * columns key/value/seq). `outputMode` follows the upstream operator:
    * "append" for event-log operators (KTableStream et al.), "update"
    * when the changelog is derived from a streaming aggregation (each
    * batch then carries the changed keys — exactly the MERGE input). */
  def start(changes: Dataset[Change], tablePath: String,
            checkpoint: String, outputMode: String = "append"): StreamingQuery =
    changes.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Change], _: Long) =>
        applyBatch(batch, tablePath)
      }
      .start()

  /** Live rows of the materialized table (tombstones filtered). Reads
    * the backup if a crash left the swap half-done — same recovery rule
    * as [[applyBatch]]. A reader concurrent with one writer's swap can
    * lose the race between the existence check and the parquet load
    * (target renamed to `.old` in between); the load is retried,
    * re-resolving which path holds the table — the swap protocol keeps
    * one of the two complete at every instant. Consume the returned
    * frame promptly: a swap during a long-running downstream job can
    * still invalidate the concrete file paths the scan pinned (the
    * transactional-table MERGE variant is the real concurrent-reader
    * answer, per the scope note above). */
  def view(spark: SparkSession, tablePath: String): DataFrame = {
    val target = new Path(tablePath)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var last: Throwable = null
    for (attempt <- 0 until 3) {
      // back off so the retries span a real swap window (two renames by a
      // possibly GC-paused writer), not three microsecond-spaced probes
      if (attempt > 0) Thread.sleep(25L << attempt)
      val path = if (fs.exists(target)) tablePath else tablePath + ".old"
      try return spark.read.parquet(path).filter(col("value").isNotNull)
      catch { case e: org.apache.spark.sql.AnalysisException => last = e }
    }
    throw last
  }

  /** One merge step; also the batch-backfill entry. Idempotent: seq
    * comparison discards stale redeliveries, including post-delete ones
    * (the retained tombstone row outranks them). Equal seqs resolve
    * upsert-over-tombstone — the same "upsert wins" tie rule as the FK
    * join's same-seq subscription events. */
  def applyBatch(batch: Dataset[Change], tablePath: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.cleanStaleTmp(fs, tablePath)

    val current = SwapDir.resolveCurrent(fs, tablePath)
      .map(spark.read.parquet(_))
      .getOrElse(Seq.empty[(String, String, Long)].toDF("key", "value", "seq"))

    // one hash aggregation over (current ∪ batch): last change per key by
    // (seq, upsert-wins, value) — the value itself is the final tie-break
    // so the ordering is total (equal-seq equal-kind duplicates resolve
    // deterministically to the greatest value), per latestByKey's contract
    val merged = graft.operators.Changelog.latestByKey(
      current.unionByName(batch.select(col("key"), col("value"), col("seq"))),
      Seq("key"), Seq(col("seq"), col("value").isNotNull, col("value")))

    val tmp = SwapDir.tmpPath(tablePath)
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap protocol: see SwapDir — target or backup holds the complete
    // previous table at every instant
    SwapDir.commit(fs, tablePath, tmp)
  }
}
