package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Materializes a [[Change]] log into a queryable table — the
  * "update mode + MERGE-style sink" half of the KTable story (SURVEY.md
  * §2.5 J4 note, §4.2): the changelog is the stream, this sink maintains
  * the latest-value-per-key VIEW of it, with tombstones deleting rows.
  *
  * Per micro-batch (`foreachBatch`): reduce the batch to its last change
  * per key (`max_by` on seq — one map-side-combined aggregation), merge
  * with the current table keeping the higher-seq version of each key,
  * drop tombstoned keys, and atomically swap the table directory. The
  * merge is idempotent — replaying a batch after failure converges to
  * the same table, because seq comparison discards stale versions.
  *
  * Storage: plain parquet with a write-to-temp + rename swap, the
  * biggest contract a bare filesystem offers. On a real deployment the
  * same `foreachBatch` body becomes a `MERGE INTO` against a table
  * format with row-level upserts (Delta/Iceberg/Hudi) — the batch-side
  * logic (last-change-per-key, seq-versioned upsert, tombstone delete)
  * is identical, only the sink API changes.
  *
  * Scale: per batch the merge reads the current table once and shuffles
  * on the key; rewrite cost is O(table). A table format with clustered
  * row-level merge drops that to O(touched files) — which is why the
  * production note above matters at 100 TB; the semantics here are the
  * contract both share.
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

  /** One merge step; also the batch-backfill entry (idempotent). */
  def applyBatch(batch: Dataset[Change], tablePath: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(tablePath)

    val latestInBatch = batch
      .groupBy("key")
      .agg(max_by(struct(col("value"), col("seq")), col("seq")).as("s"))
      .select(col("key"), col("s.value").as("value"), col("s.seq").as("seq"))

    val current =
      if (fs.exists(target)) spark.read.parquet(tablePath)
      else Seq.empty[(String, String, Long)].toDF("key", "value", "seq")

    val merged = current.unionByName(latestInBatch)
      .groupBy("key")
      .agg(max_by(struct(col("value"), col("seq")), col("seq")).as("s"))
      .select(col("key"), col("s.value").as("value"), col("s.seq").as("seq"))
      .filter(col("value").isNotNull) // tombstone with the highest seq = delete

    val tmp = new Path(tablePath + ".tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(tmp, target))
      throw new IllegalStateException(s"atomic swap failed for $tablePath")
  }
}
