package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Random sampling (`df.sample`) is partitioning- and seed-dependent —
  * re-running the pipeline after a repartition changes the sample. Data
  * pipelines instead split on a content hash of a stable key: the same
  * row lands on the same side of every split, on every engine, on every
  * run, with no RNG state to thread. The md5-prefix construction is the
  * same engine-portable hash discipline the dedup family uses
  * ([[DedupOps]]); DuckDB computes the identical bucket with
  * `('0x' || substr(md5(k), 1, 15))::BIGINT % buckets`.
  *
  * Scale: a pure map-side filter — no shuffle, pushes nothing, adds one
  * codegen'd projection; 100 TB in, pct% out.
  */
object Sampling {

  /** The raw 60-bit content hash: md5 of the key's string form, first 15
    * hex chars (< 2^60, so the long cast is exact). */
  def rawHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Stable pseudo-uniform bucket in [0, buckets) from [[rawHash]]. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(rawHash(key), lit(buckets.toLong))

  /** Keep ~pct% of rows, deterministically by `key`. */
  def sampleByHash(df: DataFrame, key: Column, pct: Int, buckets: Int = 100): DataFrame =
    df.filter(hashBucket(key, buckets) < pct)

  /** Per-stratum deterministic sampling — the class-rebalancing primitive
    * (downsample dominant classes, keep rare ones whole). The stratum
    * picks the keep-rate; the row's fate is still decided by the content
    * hash of its key, so the op stays a pure map-side filter and a row's
    * membership is stable under any repartition or rate change to OTHER
    * strata. Strata absent from `rates` keep `defaultPct`. */
  def stratifiedSampleByHash(df: DataFrame, key: Column, stratum: Column,
                             rates: Map[String, Int], defaultPct: Int,
                             buckets: Int = 100): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(stratum === s, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(key, buckets) < pct)
  }

  /** Exactly-n-per-stratum balanced subset: for each stratum keep the n
    * rows with the smallest (md5(key), key) — a deterministic reservoir,
    * so the subset is stable across runs, engines, and partitionings,
    * unlike `sample`/reservoir RNGs. Selection is the bounded
    * [[Aggregators.topKByKey]] aggregate: every partition reduces to ≤ n
    * candidates per stratum map-side, so the shuffle moves n·partitions
    * rows per stratum — NOT a per-stratum `row_number` window, whose
    * exchange would carry every row of every stratum.
    * Returns (stratum, rank, id) rows; join back on id for payloads. */
  def balancedSample(df: DataFrame, stratum: Column, idCol: Column,
                     n: Int): DataFrame = {
    require(n > 0, s"balancedSample needs n > 0, got $n")
    // the hit buffer carries the id as a Long; a string key would ANSI-fail
    // the cast at runtime — reject it up front (select the payload by
    // joining back on a numeric surrogate if needed)
    val idType = df.select(idCol).schema.head.dataType
    require(Seq("long", "int", "integer", "short", "byte").contains(idType.typeName),
      s"balancedSample needs an integral id column, got ${idType.catalogString}")
    val pick = udaf(Aggregators.topKByKey(n), Encoders.product[KeyedHit])
    df.select(stratum.as("stratum"),
        md5(idCol.cast("string")).as("__h"), idCol.cast("long").as("__id"))
      .groupBy("stratum")
      .agg(pick(col("__h"), col("__id")).as("tk"))
      .select(col("stratum"), posexplode(col("tk.hits")))
      .select(col("stratum"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("id"))
  }

  /** Per-row weighted sampling: keep each row with probability `rate`
    * (a column in [0, 1] — e.g. a quality score), decided by the content
    * hash of its key, so the sample is deterministic across runs,
    * engines, and partitionings. The rate is floored to integer ppm so
    * the SQL oracle truncates identically (double→long casts ROUND in
    * some engines and TRUNCATE in others — floor first sidesteps the
    * disagreement). Pure map-side filter; the quality-weighted
    * data-selection shape (keep good documents with high probability,
    * bad ones rarely, without a hard threshold cliff). */
  def weightedSampleByHash(df: DataFrame, key: Column, rate: Column,
                           ppm: Long = 1000000L): DataFrame =
    df.filter(pmod(rawHash(key), lit(ppm)) < floor(rate * ppm).cast("long"))

  /** Weighted source mixing — resample a multi-source corpus toward
    * target mixture proportions (the data-mixing step of training-corpus
    * assembly: upweight rare-but-valuable sources, cap dominant ones).
    *
    * Each source s with mixture weight w_s gets keep-rate
    * `min(1, (w_s / ΣW) · targetRows / n_s)`, computed in EXACT integer
    * parts-per-million so the SQL oracle reproduces it bit-for-bit
    * (float rates would disagree at truncation boundaries); a row's fate
    * is then the usual content-hash filter, stable under repartition and
    * engine.
    *
    * `weight` must be a deterministic function of the source column and
    * must be a POSITIVE INTEGER (relative proportions — scale fractional
    * weights up yourself, e.g. 0.7/0.3 → 7/3): the exact-ppm arithmetic
    * is integer by design, and a silent `cast long` of 0.7 would drop
    * the source entirely, so non-integral or non-positive weights FAIL
    * the job (`assert_true` inside the tiny rate aggregation) instead.
    * Scale: one tiny per-source count aggregation (map-side partials),
    * the rate table broadcasts back, and the sample itself is a pure
    * map-side filter — 100 TB in, the target mixture out, one exchange
    * of |sources| rows total. */
  def mixtureSample(df: DataFrame, key: Column, source: Column, weight: Column,
                    targetRows: Long, ppm: Long = 1000000L): DataFrame = {
    require(targetRows > 0 && ppm > 0, s"need targetRows/ppm > 0")
    // overflow headroom for __w · targetRows · ppm in a Long: the bounds
    // below cap targetRows · ppm at 1e15, and the weight check caps __w
    // at Long.MaxValue / (targetRows · ppm) — without the weight half, a
    // large weight overflows the product (ANSI mode fails the job;
    // non-ANSI silently yields a negative rate that DROPS the source)
    require(targetRows <= 1000000000L && ppm <= 1000000L,
      s"targetRows ≤ 1e9 and ppm ≤ 1e6 keep the rate arithmetic in a Long")
    val maxW = Long.MaxValue / (targetRows * ppm)
    val wChecked = when(assert_true(
        weight.cast("double") === floor(weight) && weight.cast("double") > 0 &&
          weight.cast("long") <= maxW,
        lit("mixtureSample weights must be positive integers " +
          "(scale fractional proportions up, e.g. 0.7/0.3 -> 7/3) " +
          s"no larger than $maxW (Long.MaxValue / (targetRows * ppm)) — " +
          "larger weights overflow the exact-ppm rate arithmetic")).isNull,
      weight.cast("long"))
    val counts = df.groupBy(source.as("__src"))
      .agg(count(lit(1)).as("__n"), first(wChecked).as("__w"))
    val totalW = counts.agg(sum(col("__w")).as("__sw"))
    // the DENOMINATOR can overflow too: __sw sums per-source weights (each
    // ≤ maxW but |sources| of them) and multiplies by a row count — checked
    // at execution time like the weight, so a too-big corpus fails loudly
    // instead of wrapping negative and silently dropping the source
    val swChecked = when(assert_true(
        col("__sw") <= lit(Long.MaxValue) / greatest(col("__n"), lit(1L)),
        lit("mixtureSample: sum(weights) * source row count overflows the " +
          "exact-ppm rate arithmetic — scale the weights down")).isNull,
      col("__sw"))
    val rates = counts.crossJoin(broadcast(totalW))
      .withColumn("__sw", swChecked)
      .select(col("__src"),
        least(lit(ppm), expr(s"(__w * ${targetRows}L * ${ppm}L) div (__sw * __n)"))
          .as("__ppm"))
    df.join(broadcast(rates), source === col("__src"))
      .filter(pmod(rawHash(key), lit(ppm)) < col("__ppm"))
      .drop("__src", "__ppm")
  }

  /** Disjoint train/validation/test split by key hash: returns a bucket
    * label column, e.g. 0..79 → "train", 80..89 → "val", 90..99 → "test"
    * for the default 80/10/10. Splits are disjoint and exhaustive by
    * construction — the usual leakage guard.
    *
    * The split hashes a SALTED key (`key + ":split"`), so it is
    * independent of [[hashBucket]]/[[sampleByHash]] on the same key —
    * sampling 10% first must not collapse the split to all-train (the
    * correlated-hash trap). DuckDB twin:
    * `('0x' || substr(md5(k::VARCHAR || ':split'), 1, 15))::BIGINT % 100`. */
  def split(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = pmod(rawHash(concat(key.cast("string"), lit(":split"))), lit(100L))
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** EXACT-SIZE weighted sample without replacement (A-ES exponential
    * keys — Efraimidis & Spirakis 2006): each row draws key = u^(1/w)
    * with u ∈ (0, 1] from the content hash, and the k largest keys are
    * the sample; inclusion probability is proportional to weight, and
    * the sample size is exactly k (unlike [[weightedSampleByHash]]'s
    * Bernoulli draw, whose size is only k in expectation) — the
    * fixed-budget training-set cut. Rows with weight ≤ 0 are ineligible,
    * per the algorithm's domain.
    *
    * Determinism: u = (hash+1)/2^60 is exact; ordering uses the key
    * ROUNDED to 9 places with an id tie-break (the t11 rounded-score
    * convention) so `pow`'s last-ulp engine variance cannot flip ranks.
    *
    * Scale shape: key assignment is map-side; the global top-k plans as
    * TakeOrderedAndProject (per-partition top-k, then one k-row merge) —
    * no global sort, no window, no shuffle of the corpus. */
  def weightedReservoir(df: DataFrame, idCol: Column, weight: Column,
                        k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    df.filter(weight > 0)
      .select(idCol.as("id"), aesKey(idCol, weight).as("skey"))
      .orderBy(col("skey").desc, col("id").asc)
      .limit(k)
      .select(col("id"))
  }

  /** Per-group [[weightedReservoir]]: exactly k ids per group (fewer if
    * the group is smaller) — per-source/per-domain budgets in one pass.
    * The top-k is the bounded [[Aggregators.topK]] aggregate, so every
    * partition reduces to ≤ k rows per group map-side; the shuffle
    * carries k·partitions rows per group, never the group. Output
    * (group…, rank, id) with rank following the (key desc, id asc)
    * selection order. */
  def weightedReservoirByGroup(df: DataFrame, groupCols: Seq[String],
                               idCol: Column, weight: Column,
                               k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val pick = udaf(Aggregators.topK(k), Encoders.product[ScoredHit])
    val keys = groupCols.map(col)
    df.filter(weight > 0)
      .select(keys :+ idCol.cast("long").as("id")
        :+ aesKey(idCol, weight).as("skey"): _*)
      .groupBy(keys: _*)
      .agg(pick(col("skey"), col("id")).as("__tk"))
      .select(keys :+ posexplode(col("__tk.hits")): _*)
      .select(keys :+ (col("pos") + 1).cast("int").as("rank")
        :+ col("col.neighbor_id").as("id"): _*)
  }

  /** The A-ES exponential key u^(1/w), u = (hash+1)/2^60 ∈ (0, 1],
    * rounded to 9 places (rank on the ROUNDED key + id tie-break — the
    * t11 convention — so `pow`'s last-ulp engine variance can't flip
    * selections). */
  private def aesKey(idCol: Column, weight: Column): Column = {
    val u = (rawHash(idCol) + 1).cast("double") / lit(1152921504606846976.0)
    round(pow(u, lit(1.0) / weight), 9)
  }
}
