package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incrementally-maintained DAILY CELL table — the live substrate for
  * whole-series analytics (changepoint, SAX, Holt, ACF) over a stream.
  *
  * The batch operators in [[graft.functions.TimeSeries]] all start from
  * the same first aggregation: (group, day) → exact milli-unit sum.
  * This maintainer keeps exactly that table current against an event
  * stream: an update-mode streaming aggregation emits each touched
  * cell's NEW ABSOLUTE value per micro-batch, and the sink REPLACES
  * those keys in the parquet store ([[SwapDir]] rename swap). Because
  * emitted values are absolute (not deltas) the upsert is naturally
  * idempotent — a foreachBatch redelivery rewrites the same values, so
  * unlike [[IncrementalView]] no applied-batch high-water mark is
  * needed. Inputs are exact LONGS, so the streaming state's running
  * sums telescope exactly and the maintained table is spec-pinned
  * EQUAL to the batch aggregation of the same events — which makes
  * "readout over the view ≡ batch readout over raw events" a theorem
  * about ONE shared function
  * ([[graft.functions.TimeSeries.changepointFromCells]]).
  *
  * Scale shape: streaming state is one long per live (group, day) —
  * the time-span bound, not the event count; each micro-batch rewrites
  * the store at O(|cells|) (cells are span × groups — tiny next to the
  * stream; a transactional table's MERGE INTO makes it O(touched),
  * the standing ChangelogSink note). Restart recovery is the
  * checkpoint's: the update-mode aggregation resumes its exact sums,
  * and the last committed store survives the rename swap.
  */
object StreamDailyCells {

  /** Maintain the (g, day, m) cell table of `events` at `tablePath`.
    * `events` needs (g: string, ts_sec: long, milli: long). */
  def start(events: DataFrame, tablePath: String,
            checkpoint: String, bucketSec: Long = 86400L): StreamingQuery =
    events
      .groupBy(col("g"), expr(s"ts_sec div $bucketSec").as("day"))
      .agg(sum("milli").as("m"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsert(batch, tablePath)
      }
      .start()

  /** Replace `batch`'s (g, day) keys in the store — absolute values,
    * so replay converges without a batch-id mark. */
  private def upsert(batch: DataFrame, tablePath: String): Unit = {
    val spark = batch.sparkSession
    // A foreachBatch DataFrame re-executes its micro-batch plan — here
    // the whole stateful aggregation readout — on EVERY action. This
    // sink reads it three times (emptiness, anti-join keys, union), so
    // persist the |touched cells|-sized output once; measured 7.0 →
    // ~1.5 s/micro-batch at sf0.01 (STREAMBENCH r15 → r16).
    val fresh = batch.select("g", "day", "m").persist()
    try {
      if (fresh.isEmpty) return
      val fs = new Path(tablePath).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      SwapDir.cleanStaleTmp(fs, tablePath)
      val merged = SwapDir.resolveCurrent(fs, tablePath) match {
        case Some(cur) =>
          // the touched-key set is micro-batch-bounded: broadcast it so
          // the current table scans straight into the anti join with no
          // exchange on either side
          spark.read.parquet(cur)
            .join(broadcast(fresh.select(col("g"), col("day")).distinct()),
              Seq("g", "day"), "left_anti")
            .unionByName(fresh)
        case None => fresh
      }
      val tmp = SwapDir.tmpPath(tablePath)
      merged.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      SwapDir.commit(fs, tablePath, tmp)
    } finally fresh.unpersist()
  }

  /** The maintained cell table (g, day, m). */
  def cells(spark: SparkSession, tablePath: String): DataFrame = {
    val fs = new Path(tablePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    SwapDir.resolveCurrent(fs, tablePath) match {
      case Some(cur) => spark.read.parquet(cur)
      case None =>
        import spark.implicits._
        Seq.empty[(String, Long, Long)].toDF("g", "day", "m")
    }
  }
}
