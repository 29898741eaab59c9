package graft.streaming

import graft.functions.Sketches
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Windowed distinct-count over a stream via the portable HLL sketch —
  * the streaming twin of `x39_hll_distinct`, sharing
  * [[graft.functions.Sketches.hllRegisters]] VERBATIM so stream and
  * batch cannot drift: the register layout (low-b-bit md5 bucket, max
  * leading-zero rank) is one definition, and the sketch is
  * deterministic, so a closed window's registers equal the batch
  * sketch of the same rows EXACTLY — not approximately.
  *
  * Shape: ONE append-mode streaming aggregation, grouped by (tumbling
  * window, key, bucket) with `max(rho)` — emitted once, when the
  * watermark closes the window (the reference's emit-on-close rule).
  * State per live (window, key) is ≤ 2^b single-byte registers
  * regardless of how many values stream through — the mergeable-
  * summary bound that makes a 100 TB-scale distinct-count hold in
  * bounded state where exact streaming distinct (a per-value set)
  * cannot. [[estimates]] finalizes emitted registers into the x39
  * harmonic-mean estimate (same closed form, same rounding).
  */
object StreamHllDistinct {

  /** Closed-window register rows: one per (window, key, occupied
    * bucket). `win_start` in epoch millis. */
  def windowedRegisters(input: Dataset[Rec], sizeMs: Long, grace: String,
                        b: Int = 10): DataFrame = {
    val windowed = input
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", grace)
      .withColumn("win", window(col("ets"), s"$sizeMs milliseconds"))
    Sketches.hllRegisters(windowed, Seq("win", "key"), "value", b)
      .select(
        (col("win.start").cast("long") * 1000).as("win_start"),
        col("key"), col("__b"), col("__m"))
  }

  /** Finalize emitted register rows (the [[windowedRegisters]] schema)
    * into per-(window, key) estimates — exactly the batch x39 readout. */
  def estimates(regs: DataFrame, b: Int = 10): DataFrame =
    Sketches.hllEstimate(regs, Seq("win_start", "key"), b)
}
