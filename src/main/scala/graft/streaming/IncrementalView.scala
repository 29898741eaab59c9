package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incrementally-maintained aggregate VIEW over a changelog — the
  * streaming composition of the x50 algebraic-merge pattern with the
  * [[ChangelogSink]] materialization story (and the streaming face of
  * the reference's KGroupedTable adder/subtractor re-aggregation,
  * `KGroupedTable.aggregate(adder, subtractor)` — reference
  * `TopologiesTest.scala` re-agg cases; SURVEY.md §2.3):
  *
  * a [[KTableStream]] change feed carries (key, value, old, seq); each
  * change contributes an ADDER term for its new value and a SUBTRACTOR
  * term for the value it replaced, so a per-group (n_keys, total) view
  * follows from folding per-batch DELTAS into the stored aggregate —
  * counts and sums merge algebraically, history is never rescanned.
  * All arithmetic is exact LONG arithmetic (the g2 micro-unit
  * discipline): adds and subtracts telescope exactly, so the
  * incrementally-maintained view is spec-pinned EQUAL to a full
  * recompute from the table's live rows, including through deletes —
  * float sums would drift apart here (a + x − x ≠ a in doubles).
  *
  * Scale shape: the stored view is |groups|-sized (an aggregate, not a
  * table of keys); each micro-batch does one |batch|-sized map + one
  * partial-aggregating exchange of |touched groups| rows, then merges
  * with the stored aggregate — O(|batch| + |groups|) per batch where
  * the parquet store is rewritten whole via [[SwapDir]]'s crash-safe
  * rename swap; a transactional table (`MERGE INTO` Delta/Iceberg)
  * makes the same merge O(touched groups), exactly as documented on
  * [[ChangelogSink]]. Batch-replay idempotency: the applied batch id
  * is committed WITH the view (a `_applied_batch` member of the same
  * atomic swap), so a foreachBatch redelivery — Spark's at-least-once
  * contract after a sink-side crash — skips instead of double-applying
  * the delta (an aggregate merge has no per-row seq to dedup on, so
  * the sink must dedup whole batches; contrast [[ChangelogSink]],
  * whose per-key seq merge is naturally idempotent).
  */
object IncrementalView {

  /** One group's maintained aggregate: live-key count and exact total. */
  case class GroupAgg(group: String, n_keys: Long, total: Long)

  private val MetaFile = "_applied_batch" // "_"-prefixed: parquet readers skip it

  /** Maintain the (group, n_keys, total) view of `changes` at
    * `tablePath`. `groupOf` maps a key to its group; `valueOf` parses a
    * (non-null) value payload to the long quantity being summed. */
  def start(changes: Dataset[Change], groupOf: String => String,
            valueOf: String => Long, tablePath: String,
            checkpoint: String): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Change], batchId: Long) =>
        applyBatch(batch, groupOf, valueOf, tablePath, batchId)
      }
      .start()

  /** The maintained view's live rows (empty before the first commit). */
  def view(spark: SparkSession, tablePath: String): Dataset[GroupAgg] = {
    import spark.implicits._
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.resolveCurrent(fs, tablePath)
      .map(spark.read.parquet(_).as[GroupAgg])
      .getOrElse(spark.emptyDataset[GroupAgg])
  }

  /** One delta merge; also the batch-backfill entry. Skips batch ids at
    * or below the stored high-water mark (foreachBatch redelivery). */
  def applyBatch(batch: Dataset[Change], groupOf: String => String,
                 valueOf: String => Long, tablePath: String,
                 batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.cleanStaleTmp(fs, tablePath)

    val currentPath = SwapDir.resolveCurrent(fs, tablePath)
    if (currentPath.exists(p => appliedBatch(fs, p).exists(_ >= batchId)))
      return // redelivered batch: the view already contains this delta
    val current = currentPath
      .map(spark.read.parquet(_).as[GroupAgg])
      .getOrElse(spark.emptyDataset[GroupAgg])

    // adder/subtractor: +new, −old per change; groups whose live-key
    // count reaches 0 leave the view (their total telescopes to 0)
    val delta = batch.map { c =>
      GroupAgg(groupOf(c.key),
        (if (c.value != null) 1L else 0L) - (if (c.old != null) 1L else 0L),
        (if (c.value != null) valueOf(c.value) else 0L)
          - (if (c.old != null) valueOf(c.old) else 0L))
    }
    val merged = current.unionByName(delta)
      .groupBy("group")
      .agg(sum("n_keys").as("n_keys"), sum("total").as("total"))
      .filter(col("n_keys") > 0)

    val tmp = SwapDir.tmpPath(tablePath)
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // the high-water mark commits atomically WITH the rows it describes
    val out = fs.create(new Path(tmp, MetaFile), true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    SwapDir.commit(fs, tablePath, tmp)
  }

  /** The batch id the current table committed with, if any. */
  private def appliedBatch(fs: org.apache.hadoop.fs.FileSystem,
                           tablePath: String): Option[Long] = {
    val p = new Path(tablePath, MetaFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        s.toLongOption
      } finally in.close()
    }
  }
}
