package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches: assign documents to
  * fixed-token-budget bins so a downstream batch builder can concatenate
  * each bin into one training sequence.
  *
  * True first-fit bin packing is inherently sequential; the distributed,
  * deterministic variant here is NEXT-FIT within hash buckets: documents
  * are spread over `buckets` by content hash (stable under repartitioning
  * and re-runs), ordered deterministically inside each bucket (hash, id),
  * and a running token total assigns `bin = floor((cum − own) / budget)`.
  * A document longer than the budget ends up in a bin it overflows —
  * next-fit semantics; filter or truncate upstream if that matters.
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
