package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders}
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
    agged.select(keys :+ kmvEstimate(col("__tk"), k).as(outCol): _*)
  }

  /** Finalize a KMV digest buffer (a [[graft.functions.TopKKeyed]]
    * column holding the k SMALLEST md5 digests) into the distinct
    * estimate — the one estimate expression, shared by the batch
    * [[kmvDistinct]] and its streaming face so the two can never use
    * different arithmetic. */
  def kmvEstimate(tkCol: Column, k: Int): Column = {
    val hits = tkCol.getField("hits")
    val n = size(hits)
    // evaluated only on the n >= k branch (CaseWhen evaluates the taken
    // branch), so the out-of-bounds element_at never runs
    val u = conv(substring(element_at(hits, k).getField("key"), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(TwoPow60)
    round(when(n < k, n.cast("double"))
      .otherwise(lit((k - 1).toDouble) / u), 4)
  }

  /** Per-group HyperLogLog distinct estimate (Flajolet et al. 2007) —
    * with OUR OWN register layout so it IS oracle-checkable, unlike the
    * opaque built-in `approx_count_distinct` (see the object scaladoc):
    * bucket = low `b` bits of the 60-bit md5 hash, rho = leading-zero
    * count of the remaining w = 60−b bits + 1, registers = max rho per
    * bucket, harmonic-mean estimate with the standard small-range
    * linear-counting correction.
    *
    * Engine-exact determinism: the register sum Σ 2^−Mⱼ is accumulated
    * as the INTEGER Σ 2^(w+1−Mⱼ) in a BIGINT (max 2^b · 2^w < 2^63 —
    * exact, order-independent), divided back in one float op at the
    * end; the leading-zero count is `length(bin(rest))`, identical in
    * Spark and DuckDB. Only the final `ln`/rounding touch floats.
    *
    * Scale vs [[kmvDistinct]]: the map-side combine is max-per-bucket,
    * so a 100 TB group crosses the shuffle as ≤ 2^b single-byte
    * registers per partition (vs k 32-char digests for KMV), and union
    * of sketches is register-wise max — the mergeable-summary shape.
    * Standard error ≈ 1.04/√m (~3.2% at b = 10). */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  b: Int = 10, outCol: String = "est_distinct"): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol, b), groupCols, b, outCol)

  /** The sketch state alone: per-group register rows (`__b`, `__m` =
    * max rho). This IS the streaming state shape — `groupBy(keys, __b).
    * max(__rho)` runs as an update-mode streaming aggregation with
    * bounded per-group state (≤ 2^b rows), and [[hllEstimate]] finalizes
    * the latest emission — so batch and stream share one definition. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   b: Int = 10): DataFrame = {
    require(b >= 4 && b <= 16, s"bucket bits in [4,16], got $b")
    val m = 1 << b
    val w = 60 - b // hash bits left after the bucket index
    val keys = groupCols.map(col)
    val h = Sampling.rawHash(col(valueCol))
    val rest = shiftright(h, b)
    val rho = when(rest === 0, lit(w + 1))
      .otherwise(lit(w + 1) - length(bin(rest)))
    df.filter(col(valueCol).isNotNull)
      .select(keys :+ (h % m).as("__b") :+ rho.as("__rho"): _*)
      .groupBy(keys :+ col("__b"): _*).agg(max("__rho").as("__m"))
  }

  /** Harmonic-mean estimate from register rows (the [[hllRegisters]]
    * schema), with the linear-counting small-range correction. */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String], b: Int = 10,
                  outCol: String = "est_distinct"): DataFrame = {
    require(b >= 4 && b <= 16, s"bucket bits in [4,16], got $b")
    val m = 1 << b
    val w = 60 - b
    val keys = groupCols.map(col)
    // Σ 2^(w+1−M) exactly, as a BIGINT; M ∈ [1, w+1] so shifts ∈ [0, w]
    val sums = regs.groupBy(keys: _*).agg(
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${w + 1} - __m AS INT))"))
        .as("__sl"),
      count(lit(1)).as("n_regs"))
    // identical literal/op ORDER as the SQL oracle: IEEE evaluation is
    // deterministic per-expression, so matching shapes match bits
    val mD = m.toDouble
    val two = math.pow(2.0, (w + 1).toDouble) // exact power of two
    val alphaNum = 0.7213 / (1.0 + 1.079 / mD) * mD * mD * two
    val denom = col("__sl") + (lit(m.toLong) - col("n_regs")) * lit(1L << (w + 1))
    val raw = lit(alphaNum) / denom.cast("double")
    val est = when(raw <= lit(2.5 * mD) && col("n_regs") < m,
      lit(mD) * log(lit(mD) / (lit(m.toLong) - col("n_regs")).cast("double")))
      .otherwise(raw)
    sums.select(keys :+ col("n_regs") :+ round(est, 4).as(outCol): _*)
  }

  /** Count-Min row hash: bucket of `value` under hash row `j` (the
    * portable md5 discipline, salted per row so the depth hashes are
    * independent). `j` is a COLUMN so one explode drives all rows. */
  private def cmsBucket(value: Column, j: Column, width: Int): Column =
    Sampling.hashBucket(
      concat_ws("", value, lit(":cms"), j.cast("string")), width)

  /** Count-Min Sketch counter table (Cormode & Muthukrishnan 2005):
    * depth × width upper-bound counters for a frequency column — the
    * mergeable fixed-size summary that answers "roughly how often does
    * X occur" over a stream or shard union without storing the domain:
    * counters merge by per-cell ADDITION (associative), estimates only
    * ever OVER-count (every collision inflates), and the whole sketch
    * is depth·width longs however large the corpus. Engine-exact (md5
    * buckets + integer sums), so the sketch itself is oracle-checkable
    * — same contract as the KMV/HLL family above. */
  def cmsCounters(rows: DataFrame, valueCol: String,
                  depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth >= 1 && depth <= 16 && width >= 2,
      s"count-min shape out of range: $depth x $width")
    rows.select(col(valueCol).cast("string").as("w"))
      .withColumn("j", explode(sequence(lit(0), lit(depth - 1))))
      .select(col("j"), cmsBucket(col("w"), col("j"), width).as("bucket"))
      .groupBy("j", "bucket").agg(count(lit(1)).as("counter"))
  }

  /** Pairwise set overlap from HLL sketches — inclusion-exclusion on
    * register estimates: |A∩B| ≈ est(A) + est(B) − est(A∪B), where the
    * union sketch is the per-bucket register MAX (HLL's lossless union,
    * the property that makes the estimate shard-mergeable). The scale
    * path for exact-overlap readouts like d21: each group compresses to
    * m registers, so the pairwise stage touches |groups|²·m rows, never
    * the corpora. Estimates reuse [[hllEstimate]]'s exact expression
    * shape (engine-deterministic); the intersection clamps at 0 — the
    * sketch can go slightly negative on near-disjoint sets. */
  def hllOverlap(df: DataFrame, groupCol: String, valueCol: String,
                 b: Int = 10): DataFrame = {
    val regs = hllRegisters(df, Seq(groupCol), valueCol, b)
    val pairs = regs.select(col(groupCol).as("ga")).distinct()
      .join(regs.select(col(groupCol).as("gb")).distinct(),
        col("ga") < col("gb"))
    val ra = pairs.join(regs.withColumnRenamed(groupCol, "ga"), Seq("ga"))
      .select(col("ga"), col("gb"), col("__b"), col("__m"))
    val rb = pairs.join(regs.withColumnRenamed(groupCol, "gb"), Seq("gb"))
      .select(col("ga"), col("gb"), col("__b"), col("__m"))
    val union = ra.unionByName(rb)
      .groupBy("ga", "gb", "__b").agg(max("__m").as("__m"))
    val estU = hllEstimate(union, Seq("ga", "gb"), b, "est_union")
      .drop("n_regs")
    val estS = hllEstimate(regs, Seq(groupCol), b, "est")
      .drop("n_regs")
    estU
      .join(estS.select(col(groupCol).as("ga"), col("est").as("est_a")), "ga")
      .join(estS.select(col(groupCol).as("gb"), col("est").as("est_b")), "gb")
      .select(col("ga").as("source_a"), col("gb").as("source_b"),
        col("est_a"), col("est_b"), col("est_union"),
        round(greatest(lit(0.0),
          col("est_a") + col("est_b") - col("est_union")), 4).as("est_shared"),
        round(greatest(lit(0.0),
          col("est_a") + col("est_b") - col("est_union")) / col("est_union"),
          6).as("est_jaccard"))
  }

  /** The AMS Z vector alone — one signed sum per sketch row j. Shared
    * by [[amsF2]] and the streaming twin (a complete-mode aggregation
    * over the same sign expression converges to this exactly; shards /
    * micro-batches merge by per-j ADDITION). Works on batch AND
    * streaming frames. */
  def amsZ(rows: DataFrame, valueCol: String, sketches: Int = 8): DataFrame = {
    require(sketches >= 1 && sketches <= 64, s"ams sketch count: $sketches")
    rows.select(col(valueCol).cast("string").as("w"))
      .withColumn("j", explode(sequence(lit(0), lit(sketches - 1))))
      .select(col("j"), (lit(1L) - lit(2L) * Sampling.hashBucket(
        concat_ws("", col("w"), lit(":ams"), col("j").cast("string")), 2))
        .as("sign"))
      .groupBy("j").agg(sum("sign").as("z"))
  }

  /** AMS F₂ sketch (Alon, Matias & Szegedy 1996): the self-join-size
    * estimator Σ f_w² from `sketches` independent ±1 hash counters —
    * the one-number answer to "how big would this key's self-join be"
    * without materializing frequencies. Each sketch j keeps
    * Z_j = Σ_rows s_j(w) with s_j(w) ∈ {−1, +1} decided by the portable
    * md5 hash (salt ":ams", row j) — a pure MAP-SIDE sum, so the sketch
    * costs one k-way explode and a k-row aggregate however large the
    * corpus, and shards merge by ADDING their Z vectors. E[Z_j²] = F₂
    * exactly; the median of the k squares is the standard
    * variance-tamed estimate. Engine-exact end to end (integer Z,
    * integer squares, one interpolated median), reported next to the
    * TRUE F₂ so the estimation error is visible in-row. */
  def amsF2(rows: DataFrame, valueCol: String, sketches: Int = 8): DataFrame = {
    val w = rows.select(col(valueCol).cast("string").as("w"))
    val z = amsZ(rows, valueCol, sketches)
    val est = z.select((col("z") * col("z")).as("e"))
      .agg(count(lit(1)).as("n_sketches"),
        array_sort(collect_list(col("e"))).as("es"))
    val truth = w.groupBy("w").agg(count(lit(1)).as("f"))
      .agg(sum(col("f").cast("decimal(38,0)") * col("f"))
        .cast("long").as("true_f2"))
    // median of k integers: avg of the two middle elements (equal for
    // odd k) — matches quantile_cont(0.5) interpolation exactly
    val median = (element_at(col("es"), (sketches + 1) / 2) +
      element_at(col("es"), sketches / 2 + 1)).cast("double") / 2.0
    est.crossJoin(broadcast(truth))
      .select(col("n_sketches"), col("true_f2"), median.as("est_median"),
        round((median - col("true_f2").cast("double")) /
          col("true_f2").cast("double"), 6).as("rel_err"))
  }

  /** Point-estimate eval of a Count-Min sketch over the `topN` most
    * frequent values (deterministic probe set: count desc, value):
    * estimate = min over rows of the value's counter, reported next to
    * the TRUE count so the over-count gap is visible in-row —
    * `overestimate ≥ 0` is the sketch's guarantee, and equality holds
    * when none of the value's depth cells collided. */
  def cmsEstimates(rows: DataFrame, valueCol: String,
                   depth: Int = 4, width: Int = 64,
                   topN: Int = 5): DataFrame = {
    val cms = cmsCounters(rows, valueCol, depth, width)
    val exact = rows.select(col(valueCol).cast("string").as("w"))
      .groupBy("w").agg(count(lit(1)).as("true_count"))
    exact.orderBy(col("true_count").desc, col("w").asc).limit(topN)
      .withColumn("j", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("bucket", cmsBucket(col("w"), col("j"), width))
      .join(broadcast(cms), Seq("j", "bucket"))
      .groupBy("w", "true_count").agg(min("counter").as("cms_estimate"))
      .select(col("w"), col("true_count"), col("cms_estimate"),
        (col("cms_estimate") - col("true_count")).as("overestimate"))
  }
}
