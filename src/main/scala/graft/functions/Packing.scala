package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: assign documents to
  * token-budget bins so a downstream batch builder can concatenate each
  * bin into one training sequence.
  *
  * Scheme: CONCAT-ORDER CHUNKING (the concat-then-split layout pretraining
  * pipelines use, with documents kept whole). Documents are spread over
  * `buckets` by content hash (stable under repartitioning and re-runs),
  * laid out in a deterministic order inside each bucket (hash, id), and a
  * document joins the bin whose budget window contains its START offset:
  * `bin = floor((cum − own) / budget)`. Consequently a bin's token total
  * is budget-targeted but NOT budget-capped — the document straddling the
  * boundary stays whole, so a bin overflows by strictly less than the
  * length of its last document (spec-asserted). Truncate or filter
  * oversized documents upstream if a hard cap matters; closed-bin
  * (never-overflow) packing is a sequential recurrence that cannot be a
  * window function — do it per bin downstream if required.
  *
  * Scale: one exchange on the bucket id; the per-bucket window sorts only
  * its bucket, and `buckets` is the parallelism knob (more buckets =
  * smaller sorts, marginally worse packing). Never a global-order window.
  */
object Packing {

  /** Returns (id, bucket, bin, n_tokens) — `(bucket, bin)` is the packed
    * sequence key. */
  def packByBudget(df: DataFrame, idCol: Column, tokenCol: Column,
                   budget: Int, buckets: Int = 64): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("__h").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(idCol.as("id"), tokenCol.as("n_tokens"),
        Sampling.hashBucket(idCol, buckets).as("bucket"),
        md5(idCol.cast("string")).as("__h"))
      .withColumn("__cum", sum("n_tokens").over(w))
      .select(col("id"), col("bucket").cast("int").as("bucket"),
        floor((col("__cum") - col("n_tokens")) / budget).cast("long").as("bin"),
        col("n_tokens"))
  }
}
