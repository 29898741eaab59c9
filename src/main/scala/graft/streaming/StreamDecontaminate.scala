package graft.streaming

import graft.functions.{DedupOps, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming benchmark decontamination — the streaming counterpart of the
  * batch `DedupOps.decontaminate` (oracle d9), for ingest pipelines that
  * must catch eval-set leakage before it reaches the corpus.
  *
  * Shape: the held-out benchmark is STATIC (an eval set is small and
  * changes rarely); its distinct n-gram digests form the build side of a
  * stream-static semi-join, which Spark plans as a broadcast hash join —
  * each micro-batch's documents explode to shingle digests map-side and
  * probe the broadcast set, so the stream is never shuffled for the
  * probe, mirroring the batch operator's shape.
  *
  * A document matching on many shingles must yield ONE verdict row: the
  * fan-out collapses through `dropDuplicatesWithinWatermark(doc_id)`.
  * All of a document's shingles carry its event time and arrive in the
  * same micro-batch, so the collapse is exact, and state is bounded by
  * ingest rate × horizon (same discipline as [[StreamDedup]]).
  */
object StreamDecontaminate {

  /** Stream of (doc_id, ts) for documents sharing any word n-gram with
    * the static benchmark — route these to quarantine or logging;
    * `tsCol` must be a timestamp column. */
  def contaminatedIds(docs: DataFrame, benchmark: DataFrame,
                      idCol: String, textCol: String,
                      tsCol: String, horizon: String,
                      shingleN: Int = 5): DataFrame = {
    val bench = DedupOps.shingleRows(benchmark, idCol, textCol, shingleN)
      .select(md5(col("sh")).as("shh")).distinct()
    docs
      .select(col(idCol).as("doc_id"), col(tsCol).as("__ts"),
        TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col("doc_id"), col("__ts"),
        explode(DedupOps.shingles(coalesce(col("__t"), array()), shingleN)).as("sh"))
      .select(col("doc_id"), col("__ts"), md5(col("sh")).as("shh"))
      .join(bench, Seq("shh"), "left_semi")
      .withWatermark("__ts", horizon)
      .dropDuplicatesWithinWatermark("doc_id")
      .select(col("doc_id"), col("__ts").as(tsCol))
  }
}
