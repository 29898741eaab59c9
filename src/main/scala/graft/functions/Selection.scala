package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based data selection for pretraining corpora — the two public
  * workhorse recipes:
  *
  *  - CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
  *    Extracting High Quality Monolingual Datasets from Web Crawl
  *    Data"): score every document by its perplexity under a language
  *    model and split each language's corpus into head/middle/tail
  *    buckets; downstream pipelines keep head (+middle). The LM here is
  *    the corpus's own unigram model — the heaviest statistic that is
  *    still exactly reproducible by the DuckDB oracle (CCNet uses a
  *    KenLM 5-gram; the bucketing machinery is identical).
  *
  *  - DSIR-style importance weighting (Xie et al. 2023, "Data Selection
  *    for Language Models via Importance Resampling"): represent target
  *    and raw distributions over HASHED n-gram feature buckets, weight
  *    every raw document by its log importance ratio
  *    Σ_b c_b·ln(p_target(b)/p_raw(b)), and keep the top of the raw pool
  *    by weight (the paper resamples with Gumbel noise; the
  *    deterministic top-k is the reproducible variant of the same
  *    ranking — randomness would fork the engines).
  *
  * Scale shape, both ops: the only data-sized exchanges are token/feature
  * aggregations keyed by (doc, token) then token — the word-count
  * pattern with map-side partials. Model tables are vocabulary- or
  * bucket-sized (DSIR's is exactly `buckets` rows) and ride back as
  * broadcasts; nothing document-sized ever sits on the driver.
  */
object Selection {

  /** Per-document cross-entropy under the CORPUS unigram model:
    * H(d) = ln(T) − Σ_w c_w(d)·ln(C_w) / n(d), where C_w is the corpus
    * count of word w and T = Σ C_w. Zero-token documents have no
    * distribution and are dropped (same rule as the t9 entropy family).
    * Returns (doc_id, n_tokens, xent), xent UNROUNDED — callers round at
    * the use site.
    *
    * Exactly two shuffles at corpus scale: the (doc, word) count and its
    * word-keyed re-aggregation; the vocabulary join shuffles on word
    * (vocabulary ≪ corpus) and the scalar T rides a 1-row broadcast. */
  def unigramCrossEntropy(docs: DataFrame, textCol: Column,
                          idCol: Column): DataFrame = {
    val wc = docs
      .select(idCol.as("doc_id"),
        explode(TextAnalysis.tokens(textCol)).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val vocab = wc.groupBy("w").agg(sum("c").as("cw"))
    val total = vocab.agg(sum("cw").cast("double").as("tt"))
    wc.join(vocab, "w")
      .groupBy("doc_id").agg(
        sum("c").as("n_tokens"),
        sum(col("c").cast("double") * log(col("cw").cast("double")))
          .as("clogcw"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"),
        (log(col("tt")) - col("clogcw") / col("n_tokens")).as("xent"))
  }

  /** CCNet head/middle/tail: per-`group` equal-count perplexity tertiles
    * (CCNet buckets per LANGUAGE; the group column is the generalization
    * — pass `lang` or `source`). `head` = lowest cross-entropy =
    * most LM-like text. The bucket split is ntile over the total order
    * (rounded xent, doc_id) — SQL-standard, so engine-exact, and rounding
    * BEFORE the sort keeps the order itself reproducible.
    *
    * Parallelism of the ntile window = group cardinality (the x53/x58
    * caveat): per-language corpora are the intended unit, and at 100 TB
    * each language's (doc_id, xent) sketch is doc-count-sized, not
    * corpus-sized. Returns (doc_id, group, n_tokens, xent, bucket). */
  def perplexityBuckets(docs: DataFrame, textCol: Column, idCol: Column,
                        groupCol: Column): DataFrame = {
    val xent = unigramCrossEntropy(docs, textCol, idCol)
      .withColumn("xent", round(col("xent"), 6))
    val grouped = docs.select(idCol.as("doc_id"), groupCol.as("grp"))
      .join(xent, "doc_id")
    val t = ntile(3).over(
      Window.partitionBy("grp").orderBy(col("xent"), col("doc_id")))
    grouped.withColumn("bucket",
      when(t === 1, "head").when(t === 2, "middle").otherwise("tail"))
  }

  /** [[perplexityBuckets]] at RANGE-PARALLEL rank — the scale path for
    * its per-group ntile window (parallelism = group cardinality, the
    * x53-class caveat; solved here the classic distributed-ranking
    * way). The sort key (xent, doc_id) is range-split by a monotone
    * coarse bin of xent (floor(xent·8) — equal keys share a bin, bins
    * are totally ordered by construction), so the exact global rank is
    * a per-(group, bin) `row_number` PLUS the group's running count of
    * earlier bins — and the only window over data-sized rows runs at
    * group × bin parallelism; the offset window runs over the
    * (group, bin) COUNT table, dimension-sized at any corpus size.
    * SQL-ntile's uneven-bucket rule (first n mod k buckets get the
    * extra row) is then a closed form of (rank, n), so the output is
    * row-for-row IDENTICAL to [[perplexityBuckets]] — same oracle, and
    * the spec pins the equality on real data. */
  def perplexityBucketsParallel(docs: DataFrame, textCol: Column,
                                idCol: Column, groupCol: Column): DataFrame = {
    val xent = unigramCrossEntropy(docs, textCol, idCol)
      .withColumn("xent", round(col("xent"), 6))
    val grouped = docs.select(idCol.as("doc_id"), groupCol.as("grp"))
      .join(xent, "doc_id")
    Ranks.rangeParallelNtile(grouped, "grp", "xent", "doc_id", 3,
        floor(col("xent") * 8).cast("long"))
      .withColumn("bucket", when(col("ntile") === 1, "head")
        .when(col("ntile") === 2, "middle").otherwise("tail"))
      .select(col("doc_id"), col("grp"), col("n_tokens"), col("xent"),
        col("bucket"))
  }

  /** DSIR log importance weight per raw document over hashed n-gram
    * features. Features are word unigrams and bigrams hashed into
    * `buckets` cells with the corpus-standard md5 60-bit hash
    * ([[Sampling.hashBucket]] — the same function the sharding and
    * sampling oracles mirror in SQL). Bucket models are
    * Laplace-smoothed: p(b) = (c_b + 1) / (C + buckets).
    *
    * `isTarget` marks the rows that DEFINE the target distribution;
    * only non-target (raw) rows are scored and returned:
    * (doc_id, n_feats, logw) with logw = Σ_b c_b·ln(p_t(b)/p_r(b)),
    * UNROUNDED. The bucket model is exactly `buckets` rows and joins
    * back as a broadcast, so scoring is one map-side pass over the
    * feature stream — the corpus is touched twice (model, score) and
    * never collected. */
  def dsirLogWeights(docs: DataFrame, textCol: Column, idCol: Column,
                     isTarget: Column, buckets: Int = 512): DataFrame = {
    require(buckets >= 2, s"buckets >= 2, got $buckets")
    val base = docs.select(idCol.as("doc_id"), isTarget.as("tgt"),
      TextAnalysis.tokens(textCol).as("t"))
    // unigram + bigram surface forms, then one hash per feature
    val feats = base.select(col("doc_id"), col("tgt"),
        explode(concat(col("t"), TextAnalysis.ngrams(col("t"), 2))).as("f"))
      .select(col("doc_id"), col("tgt"),
        Sampling.hashBucket(col("f"), buckets).as("b"))
    val perDoc = feats.groupBy("doc_id", "tgt", "b")
      .agg(count(lit(1)).as("c"))
    // bucket-count model per side + its total, Laplace-smoothed
    val model = perDoc.groupBy("b").agg(
      sum(when(col("tgt"), col("c")).otherwise(0L)).as("ct"),
      sum(when(col("tgt"), 0L).otherwise(col("c"))).as("cr"))
    val totals = model.agg(
      sum("ct").cast("double").as("tt"), sum("cr").cast("double").as("tr"))
    val scored = model.crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("ct") + 1).cast("double") / (col("tt") + buckets)) -
          log((col("cr") + 1).cast("double") / (col("tr") + buckets)))
          .as("lr"))
    perDoc.filter(!col("tgt"))
      .join(broadcast(scored), "b")
      .groupBy("doc_id").agg(
        sum("c").as("n_feats"),
        sum(col("c").cast("double") * col("lr")).as("logw"))
  }

  /** Per-class KL divergence from the corpus unigram distribution:
    * KL(p_s ‖ p) = Σ_w (c_sw/n_s)·ln((c_sw·T)/(n_s·C_w)) — the standard
    * mixture diagnostic ("how far does each source's language drift from
    * the corpus"). Returns (class, n_tokens, kl), kl UNROUNDED.
    *
    * Exchanges: the (class, word) count and its word-keyed vocabulary
    * re-aggregation; the class-totals table is |classes| rows and the
    * grand total one row — both broadcast. */
  def classKlFromCorpus(docs: DataFrame, textCol: Column,
                        classCol: Column): DataFrame = {
    val swc = docs
      .select(classCol.as("cls"), explode(TextAnalysis.tokens(textCol)).as("w"))
      .groupBy("cls", "w").agg(count(lit(1)).as("c"))
    val ns = swc.groupBy("cls").agg(sum("c").as("ns"))
    val vocab = swc.groupBy("w").agg(sum("c").as("cw"))
    val tot = vocab.agg(sum("cw").cast("double").as("tt"))
    swc.join(vocab, "w")
      .join(broadcast(ns), "cls").crossJoin(broadcast(tot))
      .groupBy("cls").agg(
        max("ns").as("n_tokens"),
        sum((col("c").cast("double") / col("ns")) *
          log((col("c").cast("double") * col("tt")) /
            (col("ns").cast("double") * col("cw")))).as("kl"))
      .select(col("cls"), col("n_tokens"), col("kl"))
  }

  /** Naive-Bayes class attribution: score every document against every
    * class's Laplace-smoothed unigram model and pick the argmax — the
    * classic domain-attribution / source-leakage probe (a document whose
    * own source does NOT win is evidence the sources aren't separable).
    *
    * score(d, s) = Σ_w c_dw·ln(c_sw + 1) − n_d·ln(n_s + V): the first
    * term only needs words PRESENT in class s (absent words contribute
    * ln 1 = 0), so the join stays (doc, word) ⋈ (class, word) on word —
    * per-token work bounded by |classes|; the second term rides the
    * |classes|-row broadcast. Argmax = min(struct(−score, class)), the
    * LPA tie-rule (score rounded to 6 BEFORE the argmax so the winner
    * is engine-exact). Returns (doc_id, class, predicted, score). */
  def naiveBayesAttribution(docs: DataFrame, textCol: Column, idCol: Column,
                            classCol: Column): DataFrame = {
    val base = docs.select(idCol.as("doc_id"), classCol.as("cls"),
      TextAnalysis.tokens(textCol).as("t"))
    val dwc = base
      .select(col("doc_id"), explode(col("t")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    val model = base
      .select(col("cls"), explode(col("t")).as("w"))
      .groupBy("cls", "w").agg(count(lit(1)).as("csw"))
    val ns = model.groupBy("cls").agg(sum("csw").as("ns"))
    val vsize = model.select(countDistinct("w").as("vv"))
    val nd = dwc.groupBy("doc_id").agg(sum("c").as("nd"))
    // shared-word term per (doc, class); absent (doc, class) pairs = 0
    val t1 = dwc.join(model, "w")
      .groupBy("doc_id", "cls")
      .agg(sum(col("c").cast("double") *
        log((col("csw") + 1).cast("double"))).as("t1"))
    // dense (doc × class) grid from the two small sides
    val grid = nd.crossJoin(broadcast(ns.crossJoin(vsize)))
      .join(t1, Seq("doc_id", "cls"), "left")
      .select(col("doc_id"), col("cls").as("cand"),
        round(coalesce(col("t1"), lit(0.0)) -
          col("nd").cast("double") * log((col("ns") + col("vv")).cast("double")),
          6).as("score"))
    val best = grid.groupBy("doc_id")
      .agg(min(struct((-col("score")).as("ns"), col("cand"))).as("b"))
      .select(col("doc_id"), col("b.cand").as("predicted"),
        (-col("b.ns")).as("score"))
    base.select(col("doc_id"), col("cls")).join(best, "doc_id")
  }
}
