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
}
