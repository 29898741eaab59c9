package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Incrementally-maintained type-2 SCD table over an attribute-update
  * stream — the streaming face of [[graft.operators.Changelog.scd2]]
  * (oracle `k4_scd2`), maintained like [[IncrementalView]]: foreachBatch
  * folds each micro-batch into the stored interval table, committed
  * atomically WITH the applied batch id so at-least-once redelivery
  * skips instead of double-applying.
  *
  * Per batch, only each touched key's OPEN interval participates: the
  * key's new events (sorted by (ts, seq)) fold against it — equal
  * values extend the run, a change closes the open interval at the new
  * `valid_from` (half-open, exactly the batch operator's convention)
  * and opens the next. CLOSED intervals are immutable history and pass
  * through untouched. `value == null` is a value (a null run), matching
  * the batch operator's null-safe change detect.
  *
  * Ordering contract: per-key event time must be monotone ACROSS
  * batches (the CDC/changelog delivery order this derives from — the
  * same per-key order [[KTableStream]] consumes); a late row would
  * rewrite closed history, which an interval STORE cannot express.
  * Within a batch, (ts, seq) sorts events, so shuffle order never
  * matters.
  *
  * Scale shape: per batch, the open-row set cogroups with the batch on
  * hash(key) — state per key is ONE open row plus the batch's events,
  * never the key's history; closed rows are only rewritten because this
  * embodiment stores parquet via [[SwapDir]]'s whole-table rename swap —
  * a transactional table (MERGE INTO Delta/Iceberg) applies the same
  * fold O(touched keys) per batch, exactly the [[ChangelogSink]] note. */
object StreamScd2 {

  /** One validity interval; `valid_to` None = the key's current row. */
  case class Interval(key: String, value: String, valid_from: Long,
                      valid_to: Option[Long], is_current: Boolean)

  private val MetaFile = "_applied_batch"

  def start(recs: Dataset[Rec], tablePath: String,
            checkpoint: String): StreamingQuery =
    recs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Rec], batchId: Long) =>
        applyBatch(batch, tablePath, batchId)
      }
      .start()

  /** The maintained interval table (empty before the first commit). */
  def table(spark: SparkSession, tablePath: String): Dataset[Interval] = {
    import spark.implicits._
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.resolveCurrent(fs, tablePath)
      .map(spark.read.parquet(_).as[Interval])
      .getOrElse(spark.emptyDataset[Interval])
  }

  /** One fold; also the batch-backfill entry. Skips batch ids at or
    * below the stored high-water mark (foreachBatch redelivery). */
  def applyBatch(batch: Dataset[Rec], tablePath: String,
                 batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.cleanStaleTmp(fs, tablePath)

    val currentPath = SwapDir.resolveCurrent(fs, tablePath)
    if (currentPath.exists(p => appliedBatch(fs, p).exists(_ >= batchId)))
      return // redelivered batch: the table already contains this fold
    val current = currentPath
      .map(spark.read.parquet(_).as[Interval])
      .getOrElse(spark.emptyDataset[Interval])

    val closed = current.filter(!_.is_current)
    val newTail = current.filter(_.is_current).groupByKey(_.key)
      .cogroup(batch.groupByKey(_.key)) { (k, opens, recs) =>
        val events = recs.toSeq.sortBy(r => (r.ts, r.seq))
        if (events.isEmpty) opens // untouched key: open row passes through
        else {
          var out = List.empty[Interval]
          // == is null-safe here (null == null); a null run is a run
          var cur = opens.toSeq.headOption
          events.foreach { e =>
            cur match {
              case Some(iv) if iv.value == e.value => () // run continues
              case Some(iv) =>
                out ::= iv.copy(valid_to = Some(e.ts), is_current = false)
                cur = Some(Interval(k, e.value, e.ts, None, is_current = true))
              case None =>
                cur = Some(Interval(k, e.value, e.ts, None, is_current = true))
            }
          }
          (cur.toList ++ out).iterator
        }
      }

    val tmp = SwapDir.tmpPath(tablePath)
    closed.unionByName(newTail).write
      .mode(SaveMode.Overwrite).parquet(tmp.toString)
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
