package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-side operators over the documents table: BM25 ranking and a
  * sharded inverted index. These are the search/indexing half of a
  * training-data pipeline (nearest-neighbor text retrieval for
  * decontamination audits, corpus exploration, hard-negative mining).
  *
  * Scale shape (100 TB):
  *  - BM25: the only data-sized exchange carries (doc, term) rows for
  *    the QUERY terms only — the term filter is applied map-side before
  *    the aggregation, so the shuffle is |query terms| × |matching docs|,
  *    not the corpus token count. Document lengths are computed map-side
  *    in the same pass; corpus-level scalars (N, avgdl) ride a one-row
  *    broadcast. The final ranking is a bounded top-k
  *    (TakeOrderedAndProject), never a global sort.
  *  - Inverted index: postings are SHARDED by hash(doc_id) so no single
  *    output row grows with corpus size — a hot term's posting list is
  *    split over `shards` rows, each bounded by df/shards. This is the
  *    layout a distributed index actually stores (term, shard) → postings;
  *    un-sharded list_agg postings would concentrate a stop-word's entire
  *    document set into one executor's row.
  */
object Retrieval {

  /** Okapi BM25 top-`topN` documents for a bag of query `terms`.
    *
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))   (Robertson/Lucene form,
    * non-negative), score(d) = Σ_t idf(t)·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)).
    *
    * Output (doc_id, rank, score) ordered by the ROUNDED score with a
    * doc_id tie-break — the cross-engine determinism contract: rounding
    * at 6 digits is 9 orders above double-sum noise, and ties resolve
    * identically in both engines.
    */
  def bm25Rank(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], topN: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 64, "query term set must be small (bounded broadcast)")
    // per-doc token counts: dl map-side, query-term tf the only exchange
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"),
      size(TextAnalysis.tokens(col(textCol))).as("dl"))
    val qtoks = toks.filter(col("term").isin(terms: _*)) // map-side prune BEFORE the shuffle
    val tf = qtoks.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first("dl").as("dl"))
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // one-row corpus scalars: N and avgdl (avg over ALL docs, not just hits)
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      avg(size(TextAnalysis.tokens(col(textCol))).cast("double")).as("avgdl"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    val contrib = tf.join(broadcast(dfc), "term").crossJoin(broadcast(stats))
      .select(col("doc_id"), (idf * (col("tf") * lit(k1 + 1.0)) / denom).as("c"))
    contrib.groupBy("doc_id").agg(round(sum("c"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(topN)
      .select(col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id").asc)).as("rank"),
        col("score"))
  }

  /** TF-IDF top-`topN` documents for a bag of query `terms` — the second,
    * deliberately different retrieval scorer the fusion stage combines
    * with BM25: w(t,d) = (1 + ln tf) · ln(N / df) (log-tf, plain idf — no
    * length normalization, no tf saturation), score(d) = Σ_t w(t,d).
    *
    * Same scale shape as [[bm25Rank]]: query-term filter map-side BEFORE
    * the tf shuffle, df from the reduced tf table, N a one-row broadcast,
    * bounded top-k instead of a global sort. Same determinism contract:
    * ranking on the 6-digit-ROUNDED score with a doc_id tie-break.
    * Output (doc_id, rank, score). */
  def tfidfRank(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], topN: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.size <= 64, "query term set must be small (bounded broadcast)")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = toks.filter(col("term").isin(terms: _*)) // map-side prune
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val w = (lit(1.0) + log(col("tf").cast("double"))) *
      log(col("n_docs").cast("double") / col("df"))
    val contrib = tf.join(broadcast(dfc), "term").crossJoin(broadcast(stats))
      .select(col("doc_id"), w.as("c"))
    contrib.groupBy("doc_id").agg(round(sum("c"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(topN)
      .select(col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id").asc)).as("rank"),
        col("score"))
  }

  /** Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty 2001;
    * public literature) — the language-modeling third scorer beside
    * [[bm25Rank]] and [[tfidfRank]]:
    *
    *   score(q, d) = Σ_{w ∈ q ∩ d} ln(1 + c_dw·|C| / (μ·cf_w))
    *                 + |q|·ln(μ / (dl + μ))
    *
    * (the standard rank-equivalent decomposition of
    * Σ_w ln((c_dw + μ·p_C(w)) / (dl + μ)): only MATCHING terms enter the
    * first sum, so the shuffle stays query-pruned, and the second term
    * is a pure function of document length). Query terms absent from
    * the corpus contribute nothing — the decomposition's smoothing-mass
    * convention, shared verbatim with the oracle.
    *
    * Same scale shape as [[bm25Rank]]: map-side term filter BEFORE the
    * tf exchange, query-term corpus frequencies and the corpus token
    * total on one-row/|q|-row broadcasts, per-doc lengths map-side, and
    * a bounded TakeOrderedAndProject — EVERY doc is scored (the length
    * term ranks non-matching docs too) but none is globally sorted.
    * Output (doc_id, rank, score), score 6-rounded before ranking. */
  def qlmRank(docs: DataFrame, idCol: String, textCol: String,
              terms: Seq[String], topN: Int = 20,
              mu: Double = 2000.0): DataFrame = {
    require(terms.nonEmpty && terms.size <= 64, "query term set must be small (bounded broadcast)")
    require(mu > 0.0, s"Dirichlet mu must be positive, got $mu")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"),
      size(TextAnalysis.tokens(col(textCol))).as("dl"))
    val qtoks = toks.filter(col("term").isin(terms: _*))
    val tf = qtoks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val cf = qtoks.groupBy("term").agg(count(lit(1)).as("cf"))
    val ctot = docs.agg(
      sum(size(TextAnalysis.tokens(col(textCol)))).cast("double").as("ct"))
    val matched = tf.join(broadcast(cf), "term").crossJoin(broadcast(ctot))
      .select(col("doc_id"),
        log(lit(1.0) + (col("tf").cast("double") * col("ct")) /
          (lit(mu) * col("cf"))).as("c"))
      .groupBy("doc_id").agg(sum("c").as("m"))
    val dls = docs.select(col(idCol).as("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).cast("double").as("dl"))
    dls.join(matched, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("m"), lit(0.0)) +
          lit(terms.size.toDouble) * log(lit(mu) / (col("dl") + lit(mu))), 6)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(topN)
      .select(col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id").asc)).as("rank"),
        col("score"))
  }

  /** Percolation — reverse search (the Elasticsearch-percolate shape):
    * a small set of STANDING term-set queries matched against every
    * document; emits (query_id, doc_id) for documents containing ALL of
    * a query's terms. The routing/alerting primitive: documents flow,
    * queries stand still.
    *
    * Scale shape: ONE action, one corpus tokenize. Per query, matching
    * anchors on its corpus-RAREST term (min document frequency, ties by
    * term) — the classic percolator optimization: candidates are the
    * anchor's postings, not the corpus, and the exact all-terms
    * containment verify runs only on those. The anchor choice is
    * derived INSIDE the returned plan (term dfs → broadcast-side
    * aggregate), not collected at construction: an earlier revision's
    * eager `collect()` was a full tokenize+explode+distinct job at
    * DataFrame-construction time, and — exchange reuse never spanning
    * actions — the returned plan paid the tokenizer again. Here the df
    * branch and the probe share the one qterm distinct-exchange, and
    * the anchor table (≤ |queries| rows, bounded by the ≤64-term
    * require, the bm25Rank broadcast contract) broadcasts to the
    * postings join. ANY anchor within a query yields the same matches
    * (every all-terms doc contains every anchor candidate) — the
    * rarest-term min only sizes the candidate set. A query whose
    * anchor never occurs matches nothing, which is also what all-terms
    * containment demands. */
  def percolate(docs: DataFrame, idCol: String, textCol: String,
                queries: Seq[(String, Seq[String])]): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every standing query needs at least one term")
    require(queries.map(_._1).distinct.size == queries.size,
      "standing query ids must be unique")
    val allTerms = queries.flatMap(_._2).distinct
    require(allTerms.size <= 64, "standing term set must be small (bounded broadcast)")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("tk"))
    val qterm = toks.select(col("doc_id"), explode(col("tk")).as("term"))
      .filter(col("term").isin(allTerms: _*))
      .distinct()
    // per-standing-term corpus df — LAZY branch of the one plan
    val dfs = qterm.groupBy("term").agg(count(lit(1)).as("df"))
    val anchors = queries.toDF("query_id", "qterms")
      .select(col("query_id"), col("qterms"), explode(col("qterms")).as("term"))
      .join(broadcast(dfs), Seq("term"), "left")
      .groupBy("query_id", "qterms")
      .agg(min(struct(coalesce(col("df"), lit(0L)).as("df"),
        col("term").as("t"))).as("m"))
      .select(col("query_id"), col("qterms"), col("m.t").as("anchor"))
    qterm.join(broadcast(anchors), col("term") === col("anchor"))
      .join(toks, "doc_id")
      .filter(expr("forall(qterms, t -> array_contains(tk, t))"))
      .select("query_id", "doc_id")
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009; public
    * literature): combine N retrieval rankings by
    * rrf(d) = Σ_systems 1 / (k + rank_s(d)), documents missing from a
    * system contribute nothing. The standard way to merge lexical and
    * semantic rankings without score calibration.
    *
    * Scale shape: each input ranking is already a bounded top-k (≤ topN
    * rows), so the fusion is arithmetic over ≤ N·topN rows — broadcast
    * scale regardless of corpus size; the heavy lifting stays inside the
    * per-system rankers. rrf is ROUNDED at 6 (exact small-integer
    * reciprocal sums — identical cross-engine) and the final order ties
    * break on doc_id. Output (doc_id, rank, rrf, systems). */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60, topN: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    val scored = rankings
      .map(_.select(col("doc_id"), col("rank")))
      .reduce(_ unionAll _)
      .groupBy("doc_id")
      .agg(round(sum(lit(1.0) / (lit(k) + col("rank"))), 6).as("rrf"),
        count(lit(1)).as("systems"))
    scored.orderBy(col("rrf").desc, col("doc_id").asc).limit(topN)
      .select(col("doc_id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf").desc, col("doc_id").asc)).as("rank"),
        col("rrf"), col("systems"))
  }

  /** Sharded inverted index: one row per (term, shard) with the posting
    * list for that shard's documents as a `doc:tf` CSV string sorted by
    * doc_id. `df`/`total_tf` are the shard-local counts; summing them
    * over shards recovers the term totals. Two exchanges total: the
    * (doc, term) tf aggregation and the (term, shard) posting build.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    shards: Int = 4): DataFrame = {
    require(shards > 0)
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("shard", pmod(col("doc_id"), lit(shards)).cast("int"))
    tf.groupBy("term", "shard").agg(
        count(lit(1)).as("df"),
        sum("tf").as("total_tf"),
        array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("tf")))),
            s => concat_ws(":", s.getField("doc_id"), s.getField("tf"))),
          ",").as("postings"))
  }

  /** RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010; public
    * literature): candidate phrases are maximal stopword-free token runs
    * (gaps-and-islands — token position minus per-doc row_number is
    * constant within a run), per-doc word score = deg/freq where deg
    * adds the containing phrase's length per occurrence, phrase score =
    * Σ word scores, and the top `topK` phrases per doc rank by the
    * ROUNDED score (4 digits) with a phrase-string tie-break — the
    * bm25Rank determinism contract. Complements TextRank (global graph
    * centrality) and tf-idf (corpus statistics) with the document-local
    * degree heuristic.
    *
    * Scale shape: the per-doc ordered window and every join hash on
    * doc_id(+grp|w) — work and state are per-document, nothing is
    * corpus-global; phrase strings rebuild from a `sort_array`'d struct
    * list, never an order-nondeterministic `collect_list` alone.
    * Output (doc_id, rk, phrase, score). */
  def rake(docs: DataFrame, idCol: String = "doc_id",
           textCol: String = "text", topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col(idCol).as("doc_id")
    val toks = docs.select(id,
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "w")))
    val isl = toks
      .filter(!col("w").isin(TextAnalysis.Stopwords: _*))
      .withColumn("grp", col("pos") - row_number().over(
        Window.partitionBy("doc_id").orderBy(col("pos").asc)))
    val phrases = isl.groupBy("doc_id", "grp").agg(
      count(lit(1)).as("plen"),
      array_join(transform(
        sort_array(collect_list(struct(col("pos"), col("w")))),
        x => x.getField("w")), " ").as("phrase"))
    val wsc = isl.join(phrases.select("doc_id", "grp", "plen"),
        Seq("doc_id", "grp"))
      .groupBy("doc_id", "w")
      .agg((sum("plen").cast("double") / count(lit(1)).cast("double")).as("ws"))
    val psc = isl.join(wsc, Seq("doc_id", "w"))
      .groupBy("doc_id", "grp").agg(round(sum("ws"), 4).as("score"))
    phrases.join(psc, Seq("doc_id", "grp"))
      .select("doc_id", "phrase", "score").distinct()
      .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("phrase").asc)))
      .filter(col("rk") <= topK)
      .select("doc_id", "rk", "phrase", "score")
  }

  /** NDCG@1..topN of the BM25 ranking against graded term-overlap
    * relevance — the ranking-quality readout every retrieval change is
    * gated on. Relevance of a doc is the number of DISTINCT query terms
    * it contains (0..|terms|); gain is the exponential-graded
    * (2^rel − 1)/log2(rank + 1), ROUNDED at 6 digits BEFORE the
    * cumulative sums so both engines fold identical values in identical
    * rank order (the x65 ordered-window discipline); the ideal ranking
    * sorts the whole corpus by (rel desc, doc_id) — its GAIN sequence
    * is tie-order-independent because equal rel means equal gain.
    *
    * Scale shape: relevance is a map-side projection; the only
    * corpus-sized steps are bm25Rank's bounded top-k and an ideal-side
    * TakeOrderedAndProject (never a global sort); everything after is
    * arithmetic over ≤ topN rows on one partition — driver-scale by
    * construction. Output (rank, doc_id, rel, gain, dcg, idcg, ndcg),
    * one row per rank 1..topN. */
  def ndcgCurve(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(terms.nonEmpty && terms.size <= 62,
      "query term set must be small (bounded broadcast; 2^rel must fit a long)")
    val rels = docs.select(col(idCol).as("doc_id"),
      size(array_intersect(TextAnalysis.tokens(col(textCol)),
        array(terms.map(lit): _*))).cast("int").as("rel"))
    def gainOf(rel: Column, rank: Column): Column =
      round((pow(lit(2.0), rel) - lit(1.0)) / log2(rank + lit(1)), 6)
    val sys = bm25Rank(docs, idCol, textCol, terms, topN)
      .join(rels, "doc_id")
      .select(col("rank"), col("doc_id"), col("rel"),
        gainOf(col("rel"), col("rank")).as("gain"))
    val ideal = rels.orderBy(col("rel").desc, col("doc_id").asc).limit(topN)
      .select(row_number().over(Window.orderBy(col("rel").desc, col("doc_id").asc))
        .as("rank"), col("rel").as("irel"))
      .select(col("rank"), gainOf(col("irel"), col("rank")).as("igain"))
    val cum = Window.orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sys.join(ideal, "rank")
      .select(col("rank"), col("doc_id"), col("rel"), col("gain"),
        round(sum("gain").over(cum), 6).as("dcg"),
        round(sum("igain").over(cum), 6).as("idcg"))
      .withColumn("ndcg", round(col("dcg") / col("idcg"), 6))
  }
}
