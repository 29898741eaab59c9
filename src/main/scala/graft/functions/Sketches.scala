package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Distinct-count sketching with ENGINE-EXACT determinism.
  *
  * KMV (k minimum values, Bar-Yossef et al. 2002): keep the k smallest
  * md5 hashes of the values per group; if fewer than k distinct values
  * exist the count is exact, otherwise estimate (k−1)/u where u ∈ (0,1)
  * is the k-th smallest hash scaled to the unit interval. Standard error
  * ≈ 1/√(k−2).
  *
  * Why this sketch here: unlike HLL (whose register layout is
  * implementation-specific, so `approx_count_distinct` can never be
  * oracle-checked across engines), KMV is a pure function of the value
  * set and the hash — DuckDB recomputes the identical estimate from the
  * same md5 hex strings, so the driver hash-gate applies to the sketch
  * exactly as to exact operators.
  *
  * Scale: the buffer is the set-semantic [[Aggregators.topKByKey]] —
  * every partition reduces to ≤ k hashes per group map-side, so a
  * 100 TB group crosses the shuffle as k·partitions 32-byte digests.
  * That is the whole point vs `count(DISTINCT …)`, whose exchange
  * carries every distinct value. */
object Sketches {

  private val TwoPow60 = 1152921504606846976.0 // the hash is 60 bits

  /** Per-group KMV distinct estimate of `valueCol`, rounded to 4 places
    * (exact below k distinct values). NULL values are ignored — the
    * count(DISTINCT …) convention (the buffer skips null hash keys). */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 256, outCol: String = "est_distinct"): DataFrame = {
    require(k >= 3, s"KMV needs k >= 3, got $k")
    val pick = udaf(Aggregators.topKByKey(k), Encoders.product[KeyedHit])
    val keys = groupCols.map(col)
    val agged = df
      .select(keys :+ md5(col(valueCol).cast("string")).as("__h"): _*)
      .groupBy(keys: _*)
      .agg(pick(col("__h"), lit(0L)).as("__tk"))
    val hits = col("__tk.hits")
    val n = size(hits)
    // evaluated only on the n >= k branch (CaseWhen evaluates the taken
    // branch), so the out-of-bounds element_at never runs
    val u = conv(substring(element_at(hits, k).getField("key"), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(TwoPow60)
    agged.select(keys :+
      round(when(n < k, n.cast("double"))
        .otherwise(lit((k - 1).toDouble) / u), 4).as(outCol): _*)
  }
}
