package graft.streaming

import graft.functions.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming counterpart of the batch
  * `DedupOps.exactDedup` (oracle d1), for ingest pipelines that must not
  * admit the same document twice.
  *
  * Built on `dropDuplicatesWithinWatermark`: rows carrying the same
  * 32-byte md5 fingerprint of the normalized text are emitted once per
  * watermark horizon. State holds ONE row per distinct fingerprint seen
  * within the horizon and is evicted as the watermark passes — bounded by
  * the ingest rate × horizon, not by corpus size, which is what makes
  * dedup-at-ingest viable against a 100 TB history (full-history exact
  * dedup belongs to the batch path; this guards the stream head).
  *
  * The shuffle is keyed by the fingerprint digest, never the document —
  * the same digests-not-documents discipline as the batch dedup family.
  */
object StreamDedup {

  /** Emit the first arrival of each normalized-text fingerprint within
    * the watermark horizon; `tsCol` must be a timestamp column. The
    * fingerprint rides along as `fp` (useful for lineage/audit). */
  def firstPerFingerprint(docs: DataFrame, textCol: String, tsCol: String,
                          horizon: String): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fp")
}
