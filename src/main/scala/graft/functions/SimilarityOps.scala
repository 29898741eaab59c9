package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two tiers, per the scale plan:
  *  - brute-force cosine top-k — exact baseline; query set × corpus as a
  *    broadcast join, corpus side streams (never collected);
  *  - sign-bucket LSH (random-hyperplane family with axis-aligned planes) —
  *    the scale path: bucket on the sign pattern of leading dimensions, so
  *    candidate pairs form inside buckets (n²/2^b instead of n²).
  *
  * All arithmetic is done with Spark's higher-order functions
  * (`zip_with`/`aggregate`) in double precision with a fixed left-to-right
  * fold, giving bit-identical results to the DuckDB oracle's
  * `list_reduce(list_transform(...))`.
  */
object SimilarityOps {

  /** Sequential-fold dot product of two float-array columns, in double —
    * a codegen'd custom Catalyst expression
    * ([[graft.expressions.DotProductFloat]]); same fold order as the
    * interpreted HOF form but ~5× faster. */
  def dot(a: Column, b: Column): Column =
    graft.expressions.DotProductFloat.dot(a, b)

  /** L2 norm (same fold discipline: sqrt of self-dot). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Reference implementation of [[dot]] via Spark's higher-order
    * functions — kept for cross-checking the custom expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity rounded to 6 places — ranking/thresholding on the
    * rounded value keeps orderings identical across engines. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    round(dot(a, b) / (normA * normB), 6)

  /** Vectors with a precomputed norm column (map-side, one pass). */
  def withNorm(vecs: DataFrame, vecCol: String): DataFrame =
    vecs.withColumn("nrm", norm(col(vecCol)))

  /** Exact top-k neighbors for a query subset. The query side is small by
    * construction (a filter) and broadcast; the corpus side streams through
    * the join, so this scales to any corpus size at O(|queries| · corpus).
    *
    * The top-k itself is a bounded [[Aggregators.topK]] aggregate: every
    * corpus partition reduces to ≤ k hits per query map-side, so the final
    * shuffle moves k·partitions rows per query — unlike a `row_number`
    * window, whose single exchange would repartition ALL n·|queries|
    * scored rows into only |queries| partitions (a parallelism collapse
    * when queries are few). */
  def bruteTopK(vecs: DataFrame, idCol: String, vecCol: String,
                queryPred: Column, k: Int): DataFrame = {
    val v = withNorm(vecs, vecCol)
    val q = v.filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("nrm").as("qn"))
    val c = v.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("nrm").as("cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv"), col("qn"), col("cn")).as("sim"))
    val topk = udaf(Aggregators.topK(k), Encoders.product[ScoredHit])
    scored.groupBy("query_id")
      .agg(topk(col("sim"), col("neighbor_id").cast("long")).as("tk"))
      .select(col("query_id"), posexplode(col("tk.hits")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("neighbor_id"), col("col.sim").as("sim"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
    * — the diversified top-k every retrieval stack wants between ANN
    * recall and the consumer: greedily pick
    *
    *   argmax_c  λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)
    *
    * k times over a relevance-top-`pool` candidate set. The expensive
    * part (corpus → pool) is exactly [[bruteTopK]]'s broadcast-query /
    * streamed-corpus scan; everything after — the pool×pool similarity
    * matrix and k greedy rounds of equi-joins — is pool²-sized (400
    * rows at pool = 20), so the sequential greed never touches the
    * corpus. Ties break to the smaller id (the portable min-struct
    * argmax); round 1 has no selected set, so its diversity term is 0
    * and the top-relevance candidate opens the list.
    *
    * Contract: ONE query vector. `queryPred` is reduced to its
    * smallest-id match structurally (sort + limit 1), so a predicate
    * that happens to match several rows cannot seed the pool with
    * duplicate candidate ids under different rel values — which would
    * corrupt the greedy argmax. Re-rank per query in a loop (or map
    * over query ids) when diversifying many queries. */
  def mmrRerank(vecs: DataFrame, idCol: String, vecCol: String,
                queryPred: Column, pool: Int = 20, k: Int = 5,
                lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && k <= pool, s"k=$k must be in [1, pool=$pool]")
    val v = withNorm(vecs, vecCol)
    val q = v.filter(queryPred)
      .orderBy(col(idCol).asc).limit(1) // single-query contract, enforced
      .select(col(idCol).as("qid"), col(vecCol).as("qv"), col("nrm").as("qn"))
    val rel = v.join(broadcast(q), col(idCol) =!= col("qid"))
      .select(col(idCol).as("id"), col(vecCol).as("cv"), col("nrm").as("cn"),
        cosine(col("qv"), col("cv"), col("qn"), col("cn")).as("rel"))
      .orderBy(col("rel").desc, col("id").asc).limit(pool)
      .localCheckpoint(false) // pool feeds k rounds + the pair matrix
    val pa = rel.select(col("id").as("a"), col("cv").as("av"), col("cn").as("an"))
    val pb = rel.select(col("id").as("b"), col("cv").as("bv"), col("cn").as("bn"))
    val psym = pa.join(pb, col("a") =!= col("b"))
      .select(col("a"), col("b"),
        cosine(col("av"), col("bv"), col("an"), col("bn")).as("s"))
      .localCheckpoint(false)
    val cand = rel.select("id", "rel")
    var selected = cand
      .select(col("id"), lit(0).as("rank"), col("rel"), col("rel").as("score"))
      .limit(0)
    for (r <- 1 to k) {
      val rem = cand.join(selected.select("id"), Seq("id"), "left_anti")
      val div = psym
        .join(selected.select(col("id").as("b")), Seq("b"))
        .groupBy(col("a").as("id")).agg(max("s").as("dv"))
      val pick = rem.join(div, Seq("id"), "left")
        .select(col("id"), col("rel"),
          (lit(lambda) * col("rel") -
            lit(1.0 - lambda) * coalesce(col("dv"), lit(0.0))).as("sc"))
        .agg(min(struct((-col("sc")).as("ns"), col("id").as("id"),
          col("rel").as("rel"), col("sc").as("sc"))).as("p"))
        .select(col("p.id").as("id"), lit(r).as("rank"),
          col("p.rel").as("rel"), round(col("p.sc"), 6).as("score"))
      selected = selected.unionByName(pick).localCheckpoint(false)
    }
    selected
  }

  /** Hard-negative mining for contrastive/metric learning: for each
    * query vector, the top-k most cosine-similar vectors of a DIFFERENT
    * class — the "confusable but wrong" examples a triplet or InfoNCE
    * loss needs (the in-batch-random alternative wastes gradient on easy
    * negatives; mining by similarity is the standard fix). Same scale
    * contract as [[bruteTopK]]: queries broadcast, corpus streams, the
    * bounded per-partition top-k partials are the only exchange; the
    * class exclusion is a predicate inside the broadcast join, not a
    * post-filter on a ranked table (rank k means k USABLE negatives).
    * Returns (query_id, rank, neighbor_id, neighbor_class, sim). */
  def hardNegativesTopK(vecs: DataFrame, idCol: String, vecCol: String,
                        classCol: String, queryPred: Column, k: Int): DataFrame = {
    val v = withNorm(vecs, vecCol)
    val q = v.filter(queryPred)
      .select(col(idCol).as("query_id"), col(classCol).as("qc"),
        col(vecCol).as("qv"), col("nrm").as("qn"))
    val c = v.select(col(idCol).as("neighbor_id"), col(classCol).as("nc"),
      col(vecCol).as("cv"), col("nrm").as("cn"))
    val scored = c.join(broadcast(q), col("qc") =!= col("nc"))
      .select(col("query_id"), col("neighbor_id"), col("nc"),
        cosine(col("qv"), col("cv"), col("qn"), col("cn")).as("sim"))
    val topk = udaf(Aggregators.topK(k), Encoders.product[ScoredHit])
    scored.groupBy("query_id")
      .agg(topk(col("sim"), col("neighbor_id").cast("long")).as("tk"))
      .select(col("query_id"), posexplode(col("tk.hits")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("neighbor_id"), col("col.sim").as("sim"))
      .join(vecs.select(col(idCol).as("neighbor_id"),
        col(classCol).as("neighbor_class")), "neighbor_id")
      .select("query_id", "rank", "neighbor_id", "neighbor_class", "sim")
  }

  /** Exact maximum-inner-product top-k (MIPS) — [[bruteTopK]]'s shape
    * with the UNNORMALIZED dot product as the score: the retrieval mode
    * of recommender/two-tower models, where vector magnitude carries
    * item popularity and must NOT be divided away.
    *
    * Same scale contract as bruteTopK: queries broadcast, corpus
    * streams, bounded per-partition top-k partials are the only
    * exchange. For sub-linear search at corpus scale, MIPS reduces to
    * cosine search over norm-augmented vectors (append
    * sqrt(M² − |x|²) to each corpus vector and 0 to queries, M = max
    * corpus norm — Bachrach et al., RecSys 2014), after which the IVF
    * machinery ([[ivfTopK]]) applies unchanged; the reduction's
    * rank-equivalence is spec-pinned in `MipsSpec`. */
  def mipsTopK(vecs: DataFrame, idCol: String, vecCol: String,
               queryPred: Column, k: Int): DataFrame = {
    val q = vecs.filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = vecs.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("qv"), col("cv")), 6).as("score"))
    val topk = udaf(Aggregators.topK(k), Encoders.product[ScoredHit])
    scored.groupBy("query_id")
      .agg(topk(col("score"), col("neighbor_id").cast("long")).as("tk"))
      .select(col("query_id"), posexplode(col("tk.hits")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("neighbor_id"), col("col.sim").as("score"))
  }

  /** All intra-block scored pairs via a salt grid — exact (same pair set
    * as a plain block self-join) but with parallelism |blocks|·shards
    * instead of |blocks|, so one dominant block no longer serializes the
    * whole quadratic stage. Each right row lands in shard
    * `hash(id) % shards`; each left row is replicated once per partner
    * shard, so pair (x, y) with x < y is produced exactly once, at join
    * key (block, shard(y)). Replication costs shards× on the left —
    * bounded, chosen, and AQE-splittable, unlike a hot block. */
  def saltedBlockPairs(vecs: DataFrame, blockCol: String, idCol: String,
                       vecCol: String, shards: Int, minSim: Double): DataFrame = {
    val v = withNorm(vecs, vecCol)
    val l = v.select(col(blockCol).as("blk"), col(idCol).as("a"),
        col(vecCol).as("va"), col("nrm").as("na"))
      .withColumn("partner", explode(sequence(lit(0), lit(shards - 1))))
    val r = v.select(col(blockCol).as("blk2"), col(idCol).as("b"),
        col(vecCol).as("vb"), col("nrm").as("nb"))
      .withColumn("shard", pmod(hash(col("b")), lit(shards)))
    l.join(r, col("blk") === col("blk2") && col("partner") === col("shard")
        && col("a") < col("b"))
      .select(col("a"), col("b"),
        cosine(col("va"), col("vb"), col("na"), col("nb")).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** Bucketed approximate near-neighbor pairs: vectors sharing a sign
    * bucket, scored, thresholded. The self-join key is the bucket id, so
    * work is Σ_bucket |bucket|² — the LSH contract. */
  def bucketedPairs(vecs: DataFrame, idCol: String, vecCol: String,
                    bits: Int, minSim: Double): DataFrame = {
    val v = withNorm(vecs, vecCol).withColumn("bkt", signBucketExpr(vecCol, bits))
    val l = v.select(col("bkt"), col(idCol).as("a"), col(vecCol).as("va"), col("nrm").as("na"))
    val r = v.select(col("bkt").as("bkt2"), col(idCol).as("b"), col(vecCol).as("vb"), col("nrm").as("nb"))
    l.join(r, l("bkt") === r("bkt2") && l("a") < r("b"))
      .select(col("a"), col("b"),
        cosine(col("va"), col("vb"), col("na"), col("nb")).as("sim"))
      .filter(col("sim") >= minSim)
  }

  /** DBSCAN density clustering over an embedding column (Ester et al.
    * 1996) — the cluster family k-means can't express: arbitrary-shape
    * clusters plus an explicit NOISE verdict, the outlier-robust
    * grouping an embedding-space curation pass wants (near-duplicate
    * communities, topical pockets, junk isolation).
    *
    * Exactness: vectors are milli-unit quantized (the s19 discipline)
    * so the ε-neighborhood graph is decided by EXACT INTEGER squared-L2
    * — no float distance ever thresholds, and the oracle replays the
    * identical graph. Core = |N_ε(p)| ≥ minPts (self included);
    * clusters = connected components of the core-core graph labeled by
    * MIN member id ([[DedupOps.connectedComponents]]'s contract, which
    * a reachability oracle reproduces); borders take the MIN core-
    * neighbor cluster (classic DBSCAN is scan-order-dependent here —
    * the min rule makes the assignment deterministic and
    * engine-portable); everything else is noise.
    *
    * Scale shape: this exact form scores all pairs (the a < b brute
    * join), ENFORCED right-sized by a loud `require` at
    * [[MaxExactDbscanVectors]] — the quadratic kernel is correct only
    * for the corpora the exactness contract targets. At population
    * scale use [[dbscanBlocked]] (LSH-bucketed candidates, exact
    * verification, same downstream) or inject any verified ε-edge
    * source via [[dbscanFromEdges]]. Degree counts partial-aggregate
    * map-side; the component step inherits connectedComponents' driver
    * fast path (the edge set already passed a density threshold —
    * orders smaller than the corpus).
    *
    * Returns (vec_id, role ∈ core|border|noise, cluster_id — null for
    * noise). */
  def dbscan(vecs: DataFrame, idCol: String, vecCol: String,
             eps2: Long, minPts: Int): DataFrame = {
    require(eps2 > 0 && minPts >= 2, s"need eps2 > 0, minPts >= 2")
    // loud contract, not prose: the probe reads one column with an
    // early-out limit — never the cost of the quadratic scan it guards
    val probe = vecs.select(col(idCol))
      .limit(MaxExactDbscanVectors + 1).count()
    require(probe <= MaxExactDbscanVectors,
      s"dbscan's exact all-pairs kernel is bounded to " +
        s"$MaxExactDbscanVectors vectors; this corpus exceeds it — " +
        "use dbscanBlocked (LSH-bucketed candidates) or dbscanFromEdges " +
        "(an injected verified edge source) at population scale")
    val q = quantizedVecs(vecs, idCol, vecCol)
    val l = q.select(col("vec_id").as("a"), col("qv").as("qa"))
    val r = q.select(col("vec_id").as("b"), col("qv").as("qb"))
    val edges = l.crossJoin(r)
      .filter(col("a") < col("b") && withinEps2(eps2))
      .select("a", "b")
    dbscanFromEdges(q.select("vec_id"), edges, minPts)
  }

  /** The exact kernel's enforced corpus bound (see [[dbscan]]). */
  val MaxExactDbscanVectors: Int = 100000

  /** [[dbscanBlocked]]'s enforced budget on estimated candidate work
    * Σ_bucket |bucket|² — the [[MaxExactDbscanVectors]] discipline
    * applied to the blocked path: a bits choice whose buckets have
    * saturated (the quadratic crossover the sf10 decade measured at
    * bits = 4 / 200k vectors) is refused loudly with the fix named,
    * never run quadratically. */
  val MaxBlockedCandidatePairs: Long = 2000000000L

  /** Sign-bucket occupancy the auto-bits derivation targets: smallest
    * `bits` with `2^bits * TargetBucketOccupancy >= n` (and ≥ 4), so
    * Σ|bucket|² stays ~n·occupancy — linear in the corpus — instead of
    * quadratic under a fixed bucket count. */
  val TargetBucketOccupancy: Long = 512L

  /** [[dbscanBlocked]] with `bits` DERIVED from the corpus: one cheap
    * aggregate reads (n, dim), then bits = the smallest value ≥ 4 with
    * `2^bits · TargetBucketOccupancy ≥ n`, capped by the vector
    * dimension (and 40 — beyond that the long bucket id is headroom,
    * not information). Integer derivation, no floating log, so an
    * oracle replays it exactly. This is the committed scale path: at
    * 10× the corpus the bucket count grows 10×, occupancy stays flat,
    * and Σ|bucket|² stays linear (sf10 decade: slope 0.63 at derived
    * bits vs 1.01 at a pinned bits = 4). */
  def dbscanBlocked(vecs: DataFrame, idCol: String, vecCol: String,
                    eps2: Long, minPts: Int): DataFrame = {
    val q = quantizedVecs(vecs, idCol, vecCol)
    // one cheap aggregate reads (n, min dim, max dim). The derivation
    // uses min(dim) — the aggregate the DuckDB oracle replays — but a
    // RAGGED corpus is refused outright: a single degenerate short
    // vector would otherwise collapse `bits` (deriveBits floors at 4)
    // for the whole corpus and trip the candidate-pair guard at scale,
    // and the sign-bucket expression would read past the short vector.
    // Same-dimension embeddings are the operator's contract; breaking
    // it must fail loudly, never degrade quietly.
    val row = q.agg(count(lit(1)), min(size(col("qv"))),
      max(size(col("qv")))).head()
    val n = row.getLong(0)
    val dim = if (row.isNullAt(1)) 1 else row.getInt(1)
    val dimMax = if (row.isNullAt(2)) 1 else row.getInt(2)
    require(dim == dimMax,
      s"dbscanBlocked needs uniform embedding dimensions, got [$dim, $dimMax]" +
        " — fix the corpus (pad/filter) or pass bits explicitly")
    dbscanBlocked(vecs, idCol, vecCol, eps2, minPts, deriveBits(n, dim))
  }

  /** The integer auto-bits rule (public so oracles and specs replay
    * it): smallest b in [4, min(dim, 40)] with
    * `TargetBucketOccupancy << b >= n`. */
  def deriveBits(n: Long, dim: Int): Int = {
    val cap = math.max(4, math.min(dim, 40))
    var b = 4
    while (b < cap && (TargetBucketOccupancy << b) < n) b += 1
    b
  }

  /** [[dbscan]]'s 100 TB path: identical density semantics, but the
    * ε-candidate pairs come from a sign-bucket LSH self-join instead of
    * the all-pairs scan — work is Σ_bucket |bucket|² (the LSH
    * contract), and every candidate is still verified by the EXACT
    * integer ε-test before it becomes an edge. Precision is therefore
    * exact; recall follows the bucket: an ε-close pair whose first
    * `bits` quantized signs differ is unseen (the standard LSH recall
    * trade, disclosed — on corpora whose clusters respect the bucket
    * geometry the result is pinned EQUAL to [[dbscan]], see
    * `DbscanSpec`). The bucket bit is decided on the QUANTIZED integer
    * component (qv_i > 0), so bucketing, like the ε-test, is exact
    * integer arithmetic any engine replays bit-for-bit.
    *
    * Scale guard: before the self-join, one cheap aggregate estimates
    * the candidate work Σ|bucket|² and REFUSES (loudly, naming the
    * auto-bits fix) when it exceeds `maxCandidatePairs` — a fixed
    * `bits` under a grown corpus is the one measured way this operator
    * goes quadratic, and it must fail the way the exact kernel fails
    * over-contract corpora, not run. Prefer the bits-free overload,
    * which derives `bits` from the corpus and stays linear. */
  def dbscanBlocked(vecs: DataFrame, idCol: String, vecCol: String,
                    eps2: Long, minPts: Int, bits: Int,
                    maxCandidatePairs: Long = MaxBlockedCandidatePairs): DataFrame = {
    require(eps2 > 0 && minPts >= 2, s"need eps2 > 0, minPts >= 2")
    require(bits >= 1 && bits <= 62, s"need 1 <= bits <= 62, got $bits")
    val q = quantizedVecs(vecs, idCol, vecCol)
    val bkt = (0 until bits).map { i =>
      when(element_at(col("qv"), i + 1) > 0L, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val b = q.withColumn("bkt", bkt)
    val estRow = b.groupBy("bkt").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n"))).head()
    val est = if (estRow.isNullAt(0)) 0L else estRow.getLong(0)
    require(est <= maxCandidatePairs,
      s"dbscanBlocked: estimated candidate work $est (Σ|bucket|² at " +
        s"bits=$bits) exceeds the $maxCandidatePairs budget — the " +
        "buckets have saturated and the self-join would go quadratic; " +
        "use the bits-free overload (auto-derived bits) or raise bits " +
        "so occupancy ~ TargetBucketOccupancy")
    val l = b.select(col("bkt"), col("vec_id").as("a"), col("qv").as("qa"))
    val r = b.select(col("bkt").as("bkt2"), col("vec_id").as("b"),
      col("qv").as("qb"))
    val edges = l.join(r,
        col("bkt") === col("bkt2") && col("a") < col("b") && withinEps2(eps2))
      .select("a", "b")
    dbscanFromEdges(q.select("vec_id"), edges, minPts)
  }

  /** DBSCAN's density semantics downstream of an INJECTED ε-edge set —
    * the explicit extension point the scale contract names: [[dbscan]]
    * (all pairs) and [[dbscanBlocked]] (LSH buckets) are just two edge
    * sources over this one implementation, and a caller with a better
    * candidate generator (IVF cells, a metric tree, a prior round's
    * clusters) plugs it in here.
    *
    * `ids` is one `vec_id` per corpus vector; `edges` holds each
    * undirected ε-edge exactly once as (a, b) with a < b, ALREADY
    * verified against the ε threshold — edge precision is the caller's
    * contract, and candidate recall bounds cluster recall. */
  def dbscanFromEdges(ids: DataFrame, edges: DataFrame,
                      minPts: Int): DataFrame = {
    require(minPts >= 2, s"need minPts >= 2, got $minPts")
    // the ε-graph feeds THREE downstream consumers (degrees, core-core
    // edges, border assignment) plus the CC probe's separate action —
    // checkpoint so the edge scan runs once (the d23 discipline)
    val e = edges.select(col("a").cast("long").as("a"),
        col("b").cast("long").as("b"))
      .localCheckpoint(false)
    val bidir = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val core = bidir.groupBy(col("a").as("node"))
      .agg((count(lit(1)) + 1).as("n"))
      .filter(col("n") >= minPts).select("node")
    val coreEdges = bidir
      .join(core.select(col("node").as("a")), "a")
      .join(core.select(col("node").as("b")), "b")
      .filter(col("a") < col("b"))
      .select("a", "b")
    val cc = DedupOps.connectedComponents(core, coreEdges)
    val borders = bidir
      .join(cc.select(col("node").as("b"), col("cluster_id")), "b")
      .groupBy(col("a").as("node")).agg(min("cluster_id").as("bcid"))
    ids.select(col("vec_id").cast("long").as("vec_id"))
      .join(cc.select(col("node").as("vec_id"), col("cluster_id").as("core_cid")),
        Seq("vec_id"), "left")
      .join(borders.select(col("node").as("vec_id"), col("bcid")),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("core_cid").isNotNull, lit("core"))
          .when(col("bcid").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("core_cid"), col("bcid")).as("cluster_id"))
  }

  /** Milli-unit integer quantization of an embedding column (the s19
    * discipline) — the shared front of the dbscan family. */
  private def quantizedVecs(vecs: DataFrame, idCol: String,
                            vecCol: String): DataFrame =
    vecs.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => round(x.cast("double") * 1000).cast("long"))
        .as("qv"))

  /** Codegen'd early-exit ε-ball kernel over (qa, qb) — the HOF
    * zip_with/aggregate form folds interpreted per pair and was
    * measured ~10× slower on the all-pairs scan. */
  private def withinEps2(eps2: Long): Column =
    org.apache.spark.sql.GraftShims.column(
      graft.expressions.L2SqWithin(
        org.apache.spark.sql.GraftShims.expression(col("qa")),
        org.apache.spark.sql.GraftShims.expression(col("qb")),
        org.apache.spark.sql.GraftShims.expression(lit(eps2))))

  /** Lloyd's k-means over an embedding column — the centroid fit that
    * completes the IVF story ([[ivfAssign]]/[[ivfTopK]] take the result
    * via their `centroids` parameter).
    *
    * Engine-portable by construction, so a SQL oracle can replay the
    * exact iterations: init is the deterministic id < k convention;
    * assignment uses the same rounded-cosine + lowest-cid-tie-break
    * score encoding as [[ivfAssign]]; each new centroid component is
    * `round(avg, 6)` cast to float — the rounding absorbs summation-order
    * float noise (the established cross-engine convention) and the float
    * cast keeps centroid arrays the same type as the corpus vectors, so
    * the codegen'd [[dot]] expression serves every round.
    *
    * Scale shape, per iteration: centroid state lives on the driver
    * (k rows — the small-side reasoning of a broadcast) and the
    * assignment argmax is a map-side codegen'd expression over it
    * ([[nearestCellExpr]]) — the corpus is never exchanged and there is
    * no per-round lineage to cut; the per-dimension mean is a
    * `posexplode` + partial-aggregating `avg` whose shuffle carries at
    * most k·dims rows per partition. Each round is exactly ONE Spark job
    * (that aggregation's collect of k rows); empty clusters keep their
    * previous centroid. The corpus projection is checkpointed once and
    * re-scanned per round. On a 100 TB corpus, fit on a sample
    * (`vecs.filter(...)`) and assign the full corpus once with
    * [[ivfAssign]].
    */
  def kmeansFit(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
                iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0 and iters >= 0, got k=$k iters=$iters")
    require(k <= 100,
      s"k=$k exceeds the similarity×100−cid score encoding's id budget " +
        "(shared with the SQL oracles); for k > 100 widen the encoding slot " +
        "in scoredCellStructs AND the oracle SQL together")
    val spark = vecs.sparkSession
    // the corpus projection (with norms) is re-read every round: one scan
    val v = withNorm(vecs, vecCol)
      .select(col(idCol).cast("long").as("vid"), col(vecCol).as("vv"),
        col("nrm").as("vn"))
      .localCheckpoint(true)
    // Centroid state lives on the DRIVER between rounds: it is k rows by
    // contract (the same small-side reasoning as a broadcast), each round
    // reads all of it to build the assignment expression, and holding it
    // locally makes a Lloyd round exactly ONE Spark job (the per-dim mean
    // aggregation) — no per-round checkpoint/collect round-trips. Init
    // norms come from the Spark expression; updated norms replicate
    // DotProductFloat's left-to-right double fold exactly.
    var cLocal = collectCentroids(
      v.filter(col("vid") < k)
        .select(col("vid").as("cid"), col("vv").as("cv"), norm(col("vv")).as("cn")))
    var i = 0
    while (i < iters) {
      val assigned = v.select(
        nearestCellExpr(col("vv"), col("vn"), cLocal).as("cid"), col("vv"))
      val fitted = assigned
        .select(col("cid"), posexplode(col("vv")))
        .groupBy("cid", "pos")
        .agg(round(avg(col("col").cast("double")), 6).as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), transform(col("pm"), p => p.getField("m").cast("float")).as("fit"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      // empty clusters keep their previous centroid (and its norm)
      cLocal = cLocal.map { case (cid, prev, prevNorm) =>
        fitted.get(cid) match {
          case Some(cv) =>
            (cid, cv, math.sqrt(
              cv.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)))
          case None => (cid, prev, prevNorm)
        }
      }
      i += 1
    }
    org.apache.spark.sql.GraftShims.unpersistLocalCheckpoint(v)
    import spark.implicits._
    cLocal.map { case (cid, cv, _) => (cid, cv) }.toDF("cid", "cv")
  }

  /** Per-cell cluster-quality QA over a fitted k-means index: for every
    * vector, `asim` = rounded cosine to its ASSIGNED centroid and `bsim`
    * = best rounded cosine to any OTHER centroid, aggregated per cell as
    * cohesion (avg asim) and margin (avg asim − bsim) — the
    * silhouette-style check that says whether (k, nprobe) can be trusted
    * before an IVF rollout, and which cells are too weak to prune by.
    *
    * Assignment reuses the encoded argmax ([[scoredCellStructs]]'
    * similarity×100−cid bigint) so it can never disagree with
    * [[ivfAssign]]/the SQL oracle; the per-vector top-2 is a sort of the
    * k-element literal-scored array INSIDE one row — pure map-side. The
    * only exchange is the final ≤k-row cell aggregation (map-side
    * partials). */
  def clusterQuality(vecs: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int): DataFrame = {
    require(k >= 2, "margin needs at least two centroids")
    val v = withNorm(vecs, vecCol)
    val fitted = kmeansFit(vecs, idCol, vecCol, k, iters)
    val cLocal = collectCentroids(centroidTable(v, idCol, vecCol, k, Some(fitted)))
    val scored = cLocal.map { case (cid, cv, cn) =>
      struct(
        (round(cosine(col(vecCol), typedLit(cv), col("nrm"), lit(cn)) * 1000000, 0)
          .cast("long") * 100 - lit(cid)).as("s"),
        lit(cid).as("cid"),
        round(cosine(col(vecCol), typedLit(cv), col("nrm"), lit(cn)), 6).as("sim"))
    }
    val arr = sort_array(array(scored: _*), asc = false)
    v.select(
        element_at(arr, 1).getField("cid").as("centroid_id"),
        element_at(arr, 1).getField("sim").as("asim"),
        element_at(arr, 2).getField("sim").as("bsim"))
      .groupBy("centroid_id").agg(
        count(lit(1)).as("n_vecs"),
        round(avg("asim"), 6).as("cohesion"),
        round(avg(col("asim") - col("bsim")), 6).as("margin"))
  }

  /** First-principal-component projection of an embedding column — the
    * dimensionality-reduction step an embedding pipeline runs before
    * ANN indexing or visualization. Power iteration on the covariance
    * matrix, engine-portable by the same discipline as [[kmeansFit]] so
    * a SQL oracle can replay the exact iterations:
    *
    *  - per-dim means are `round(avg, 6)`;
    *  - covariance entries are `round(Σ cᵢcⱼ / n, 6)` — the d×d matrix
    *    is DRIVER state (d ≤ 256 by contract below: the same small-side
    *    reasoning as broadcast/centroid collection);
    *  - iteration state starts at e₁ and each step rescales by the max
    *    absolute component and rounds at 6 — deterministic in both
    *    engines with NO sign/normalization convention needed, because
    *    rounding absorbs summation-order float noise exactly as in the
    *    kmeans oracle;
    *  - the projection is a left-to-right fold over (x−μ)·v, map-side
    *    over literal arrays — zero shuffles for the corpus pass.
    *
    * Shuffle audit: one d-row mean aggregation + one d²-row covariance
    * aggregation (both map-side partial), then a pure projection scan.
    * The (i, j) explode behind the covariance is d² terms per row —
    * fine for embedding-sized d; for very wide vectors swap in a
    * per-partition outer-product accumulator before raising the d cap. */
  def pcaPowerProject(vecs: DataFrame, idCol: String, vecCol: String,
                      iters: Int): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val stats = vecs.agg(
      max(size(col(vecCol))).cast("int").as("d"),
      count(lit(1)).as("n")).head()
    // read n FIRST: on an empty corpus the max(...) slot is null and
    // getInt would NPE before the intended diagnostic fires
    val n = stats.getLong(1)
    require(n > 0, "pcaPowerProject needs a non-empty corpus")
    val d = stats.getInt(0)
    require(d >= 1 && d <= 256,
      s"pcaPowerProject holds the d×d covariance on the driver; d=$d " +
        "exceeds the documented cap of 256 — use a distributed factorizer")
    val mu = vecs
      .select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy("i").agg(round(avg(col("x").cast("double")), 6).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val muArr = Array.tabulate(d)(i => mu.getOrElse(i, 0.0))
    val muLit = typedLit(muArr.toSeq)
    val centered = vecs.select(
      transform(col(vecCol),
        (x, k) => x.cast("double") - element_at(muLit, k + 1)).as("c"))
    val cov = centered
      .select(col("c"), posexplode(col("c")).as(Seq("i", "ci")))
      .select(col("i"), col("ci"), posexplode(col("c")).as(Seq("j", "cj")))
      .groupBy("i", "j")
      .agg(round(sum(col("ci") * col("cj")) / lit(n.toDouble), 6).as("v"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var v = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).foldLeft(0.0)((acc, j) => acc + cov.getOrElse((i, j), 0.0) * v(j)))
      val m = w.map(math.abs).max
      require(m > 0, "power iteration collapsed to zero — degenerate covariance")
      v = w.map(x => round6(x / m))
    }
    val vLit = typedLit(v.toSeq)
    vecs.select(col(idCol).as("vec_id"),
      round(aggregate(
        transform(col(vecCol), (x, k) =>
          (x.cast("double") - element_at(muLit, k + 1)) * element_at(vLit, k + 1)),
        lit(0.0), (acc, t) => acc + t), 6).as("proj"))
  }

  /** Centroid table (cid, cv, cn) for the IVF pair: a fitted set from
    * [[kmeansFit]] when given, else the deterministic id < k convention
    * shared with the SQL oracles. */
  private def centroidTable(v: DataFrame, idCol: String, vecCol: String,
                            k: Int, centroids: Option[DataFrame]): DataFrame =
    centroids match {
      case Some(c) => c.select(col("cid").cast("long").as("cid"), col("cv"),
        norm(col("cv")).as("cn"))
      case None => v.filter(col(idCol) < k)
        .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cv"),
          col("nrm").as("cn"))
    }

  /** Driver-side centroid snapshot (cid, vector, norm). The centroid set
    * is k rows by contract — the same small-side reasoning as a broadcast
    * — but collecting it lets the nearest-cell argmax become a pure
    * map-side EXPRESSION over literal vectors instead of a
    * crossJoin + per-id aggregation, removing the corpus-sized exchange
    * from every assignment pass. Norms are taken from the DataFrame (not
    * recomputed on the driver) so the doubles match the column path
    * bit-for-bit. */
  private def collectCentroids(cents: DataFrame): Seq[(Long, Array[Float], Double)] = {
    // loud bound BEFORE the pull: a caller-supplied centroid frame that
    // is secretly corpus-sized must fail with a diagnostic, not an OOM.
    // 100 is nearestCellExpr's ×100 score-encoding contract, so any set
    // passing here is also valid for every downstream consumer.
    val rows = cents
      .select(col("cid").cast("long"), col("cv"), col("cn").cast("double"))
      .limit(101).collect()
    require(rows.length <= 100,
      "centroid sets are driver state by contract (the small side of a " +
        "broadcast) and the score encoding bounds cid to [0, 100) — got " +
        "more than 100 rows; fit on a sample or shrink k")
    rows.toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
  }

  /** One (score, cid) struct per centroid: the established
    * rounded-similarity × 100 − cid score encoding (highest similarity
    * wins, lowest cid breaks ties — portable to the SQL oracles), shared
    * by the assignment argmax and the probe ranking so they can never
    * desynchronize. The ×100 slot bounds cid to [0, 100) — cid=100 would
    * alias cid=0 one rounded-similarity step lower (s·100−100 ==
    * (s−1)·100−0), making the SQL oracle's bare-score arg_max
    * nondeterministic there, and any larger cid crosses similarity
    * buckets outright — enforced here for every caller, matching
    * [[kmeansFit]]'s k ≤ 100 contract (ids 0..k−1). */
  private def scoredCellStructs(vec: Column, nrm: Column,
                                cents: Seq[(Long, Array[Float], Double)]): Seq[Column] = {
    require(cents.nonEmpty, "cell scoring needs at least one centroid")
    require(cents.forall(c => c._1 >= 0 && c._1 < 100),
      s"the similarity×100−cid score encoding (shared with the SQL oracles) " +
        s"holds only for centroid ids in [0, 100); got ids " +
        s"${cents.map(_._1).filterNot(id => id >= 0 && id < 100).take(3).mkString(", ")}…")
    cents.map { case (cid, cv, cn) =>
      struct(
        (round(cosine(vec, typedLit(cv), nrm, lit(cn)) * 1000000, 0)
          .cast("long") * 100 - lit(cid)).as("s"),
        lit(cid).as("cid"))
    }
  }

  /** Nearest-centroid id as a codegen'd map-side expression: argmax as
    * `greatest` over [[scoredCellStructs]]. Zero shuffles, zero joins. */
  private def nearestCellExpr(vec: Column, nrm: Column,
                              cents: Seq[(Long, Array[Float], Double)]): Column = {
    val scored = scoredCellStructs(vec, nrm, cents)
    val best = if (scored.size == 1) scored.head else greatest(scored: _*)
    best.getField("cid")
  }

  /** IVF index build: assign every vector to its nearest of k fixed
    * centroids (default: the vectors with id < k — deterministic and
    * engine-portable; pass [[kmeansFit]] output in production). The
    * centroid set is collected (k rows) and the argmax is a pure
    * map-side codegen'd expression ([[nearestCellExpr]]), so index build
    * is O(n·k) with ZERO shuffles of the corpus — no crossJoin rows
    * materialized, no per-id aggregation exchange. Queries then probe
    * only the nearest centroid lists (same shape as [[bucketedPairs]]).
    *
    * Tie-breaking: highest rounded similarity, then lowest centroid id,
    * encoded in one bigint so the argmax is portable to the SQL oracle. */
  def ivfAssign(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
                centroids: Option[DataFrame] = None): DataFrame = {
    val v = withNorm(vecs, vecCol)
    val cLocal = collectCentroids(centroidTable(v, idCol, vecCol, k, centroids))
    v.select(col(idCol).as("vec_id"),
      nearestCellExpr(col(vecCol), col("nrm"), cLocal).as("centroid_id"))
  }

  /** IVF search — the scale path ANN query. Probe the `nprobe`
    * nearest centroid cells per query, then exact cosine top-k among only
    * the corpus vectors assigned to a probed cell: the per-query work is
    * Σ|probed cells| instead of the whole corpus.
    *
    * Shuffle audit: the cell assignment is a map-side expression over the
    * collected k centroids ([[nearestCellExpr]]) — the corpus is NEVER
    * exchanged; probe lists and query vectors are broadcast, so
    * candidates stream past two broadcast hash joins, and the only
    * exchange anywhere is the bounded [[Aggregators.topK]] (k rows per
    * query per partition map-side). Recall is governed by (k, nprobe)
    * exactly as in a production IVF index; centroids default to the
    * deterministic id<k convention shared with [[ivfAssign]] and the SQL
    * oracle (pass [[kmeansFit]] output in production). */
  def ivfTopK(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
              queryPred: Column, nprobe: Int, topN: Int,
              centroids: Option[DataFrame] = None): DataFrame = {
    val v = withNorm(vecs, vecCol)
    // index build: nearest cell per corpus vector as a shuffle-free
    // projection — no crossJoin rows, no per-id aggregation exchange
    val cLocal = collectCentroids(centroidTable(v, idCol, vecCol, k, centroids))
    val assigned = v.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("nv"), col("nrm").as("nn"),
      nearestCellExpr(col(vecCol), col("nrm"), cLocal).as("cid"))
    // probe lists: nprobe best cells per query, also map-side over the
    // collected centroids — score all k cells into an array of (score,
    // cid) structs, sort, keep the top nprobe. Same score encoding as
    // the assignment (scores are distinct by the −cid term), so the
    // probed SET matches the aggregator formulation the oracle replays.
    val q = v.filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("nrm").as("qn"))
    val cellStructs = scoredCellStructs(col("qv"), col("qn"), cLocal)
    val probes = q.select(col("query_id"),
        explode(slice(reverse(array_sort(array(cellStructs: _*))), 1, nprobe)).as("h"))
      .select(col("query_id"), col("h.cid").as("cid"))
    // candidates stream map-side past the broadcast probe/query tables
    val topk = udaf(Aggregators.topK(topN), Encoders.product[ScoredHit])
    assigned.join(broadcast(probes), "cid")
      .join(broadcast(q), "query_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("nv"), col("qn"), col("nn")).as("sim"))
      .groupBy("query_id")
      .agg(topk(col("sim"), col("neighbor_id").cast("long")).as("tk"))
      .select(col("query_id"), posexplode(col("tk.hits")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("neighbor_id"), col("col.sim").as("sim"))
  }

  /** Symmetric int8 quantization of an embedding column — the 4×
    * storage/bandwidth reduction a 100 TB vector corpus takes before
    * anything else. Per vector: scale by 127/max|x| and round each
    * dimension to nearest (ties away from zero — both engines' round);
    * reported as scalar summaries (digest, sum) so the engine-exact
    * contract is hash-checkable without array-typed outputs. Map-side
    * only, zero shuffles. Degenerate rows (empty or all-zero vectors have
    * no scale) are dropped, and that is part of the contract — quantize
    * only what can be reconstructed.
    *
    * Determinism notes: the per-element expression is `(v · 127) / mx`
    * with that exact association (a different parenthesization rounds
    * differently in corner cases), and `mx` is materialized as a column
    * FIRST so the interpreted HOF lambda does not re-derive an O(d)
    * array_max per element. */
  def quantizeInt8(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val withMax = vecs.select(col(idCol),
      col(vecCol).as("__v"),
      array_max(transform(col(vecCol), v => abs(v.cast("double")))).as("__mx"))
      // all-zero/empty vectors have no scale: 127/0 is NaN and the int
      // cast would ANSI-fail — excluded by contract (documented above)
      .filter(col("__mx") > 0)
    val q = transform(col("__v"),
      v => round(v.cast("double") * lit(127.0) / col("__mx"), 0).cast("int"))
    withMax.select(col(idCol), round(col("__mx"), 6).as("max_abs"),
        q.as("__q"))
      .select(col(idCol), col("max_abs"),
        md5(concat_ws(",", transform(col("__q"), _.cast("string")))).as("q_digest"),
        aggregate(col("__q"), lit(0L), (acc, v) => acc + v).as("q_sum"))
  }

  /** Reconstruction error of [[quantizeInt8]] per vector: max absolute
    * error and mean squared error of dequantized (q·mx/127) against the
    * original — the QA metric a quantization rollout is gated on. Same
    * determinism discipline (materialized columns, fixed fold order,
    * exact operand association); same degenerate-row contract. */
  def quantError(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val withMax = vecs.select(col(idCol),
        col(vecCol).as("__v"),
        array_max(transform(col(vecCol), v => abs(v.cast("double")))).as("__mx"))
      .filter(col("__mx") > 0)
    val q = transform(col("__v"),
      v => round(v.cast("double") * lit(127.0) / col("__mx"), 0).cast("int"))
    val errs = zip_with(col("__v"), col("__q"),
      (x, qv) => x.cast("double") - qv.cast("double") * col("__mx") / lit(127.0))
    withMax.select(col(idCol), col("__mx"), q.as("__q"), col("__v"))
      .select(col(idCol), col("__mx"), col("__v"), errs.as("__e"))
      .select(col(idCol),
        round(aggregate(col("__e"), lit(0.0), (acc, e) => greatest(acc, abs(e))), 8)
          .as("max_abs_err"),
        round(aggregate(col("__e"), lit(0.0), (acc, e) => acc + e * e) /
          size(col("__v")), 8).as("mse"))
  }

  /** Sign-bucket id over the first `bits` dimensions: bit i set iff
    * dim i > 0 — an axis-aligned instance of random-hyperplane LSH,
    * deterministic and engine-portable. */
  def signBucketExpr(vecCol: String, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(col(vecCol), i + 1) > 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  // ---- product quantization (Jégou et al., PAMI 2011 — public) ---------

  /** Quantized Johnson–Lindenstrauss random projection (JL 1984;
    * Achlioptas 2001's database-friendly ±1 matrix — public
    * literature): dim-d embeddings → dimOut coordinates
    * proj_j = Σ_i q_i · s(i,j), with q the EXACT milli-unit
    * quantization round(x·1000) and s(i,j) ∈ {±1} derived from the
    * corpus-standard md5-60 hash of "i:j" — no RNG, no stored matrix:
    * any engine (and the DuckDB oracle) regenerates the same matrix
    * from the formula. All arithmetic after quantization is exact
    * BIGINT, so the projection is engine-portable to the bit.
    *
    * This is the ANN scale path's FIRST move at 100 TB: 768-dim fp32
    * corpora project to 16–64 small-int coordinates (E[proj_i·proj_j]
    * preserves dot products up to the JL distortion; spec measures the
    * distance-rank correlation on real data), shrinking every
    * downstream LSH/IVF/brute pass by d/dimOut. Map-only: the corpus
    * never shuffles to be projected; the ±1 matrix is a dimOut×dim
    * literal (a few KB) baked into the plan, not broadcast state.
    *
    * `dim` is a declared contract (ragged vectors would silently
    * mis-project), enforced per row with zero driver actions at
    * construction — rows with a different size are REJECTED to null
    * and dropped, surfacing in counts rather than corrupting sums. */
  def jlProject(vecs: DataFrame, idCol: String, vecCol: String,
                dim: Int, dimOut: Int): DataFrame = {
    require(dim > 0 && dimOut > 0 && dimOut <= dim,
      s"need 0 < dimOut <= dim, got dim=$dim dimOut=$dimOut")
    val signs: Seq[Seq[Long]] = (0 until dimOut).map { j =>
      (0 until dim).map { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$i:$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
        1L - 2L * (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2L)
      }
    }
    vecs
      .filter(size(col(vecCol)) === dim)
      .select(col(idCol).as("vec_id"),
        transform(col(vecCol), x => round(x.cast("double") * 1000).cast("long"))
          .as("q"))
      .withColumn("__S", typedLit(signs))
      .select(col("vec_id"), expr(
        s"""transform(sequence(0, ${dimOut - 1}),
           |  j -> aggregate(zip_with(q, __S[j], (a, b) -> a * b),
           |         0L, (acc, v) -> acc + v))""".stripMargin).as("proj"))
  }

  /** One subspace codebook: (cid, vector, norm) triples ordered by cid
    * plus each centroid's sum-of-squares (for reconstruction norms). */
  private final case class PqBook(cents: Seq[(Long, Array[Float], Double)],
                                  ss: Seq[Double])

  /** Uniform embedding dimensionality, enforced (ragged vectors would
    * silently mis-slice subspaces). */
  private def uniformDim(vecs: DataFrame, vecCol: String): Int = {
    val r = vecs.agg(min(size(col(vecCol))).as("mn"),
      max(size(col(vecCol))).as("mx")).head()
    require(!r.isNullAt(0) && r.getInt(0) == r.getInt(1),
      s"product quantization needs a uniform dimension, got " +
        s"[${if (r.isNullAt(0)) "∅" else r.getInt(0)}, " +
        s"${if (r.isNullAt(1)) "∅" else r.getInt(1)}]")
    r.getInt(0)
  }

  /** Per-subspace Lloyd fits for product quantization: subspace `s` is
    * the contiguous slice `[s·(d/m)+1, (s+1)·(d/m)]` and its codebook is
    * a [[kmeansFit]] over those subvectors (same init / rounded-cosine
    * assignment / rounded-mean update conventions, so a SQL oracle can
    * replay every chain). Returns one (cid, cv) centroid table per
    * subspace. Fit cost is m small k-means runs — on a 100 TB corpus,
    * fit on a sample and encode the full corpus once with [[pqEncode]]. */
  def pqFit(vecs: DataFrame, idCol: String, vecCol: String, m: Int,
            ksub: Int, iters: Int): Seq[DataFrame] = {
    val d = uniformDim(vecs, vecCol)
    require(m >= 1 && m <= 64 && d % m == 0,
      s"need 1 <= m <= 64 dividing dim, got m=$m d=$d")
    val w = d / m
    (0 until m).map { s =>
      kmeansFit(vecs.select(col(idCol),
        slice(col(vecCol), s * w + 1, w).as("__sub")), idCol, "__sub", ksub, iters)
    }
  }

  /** Collected (driver-side, m·ksub rows by contract) codebooks; norms
    * and sums-of-squares come from the column expressions so the doubles
    * match the SQL oracle's fold bit-for-bit. */
  private def collectPqBooks(vecs: DataFrame, idCol: String, vecCol: String,
                             m: Int, ksub: Int, iters: Int): (Int, Seq[PqBook]) = {
    val d = uniformDim(vecs, vecCol)
    require(m >= 1 && m <= 64 && d % m == 0,
      s"need 1 <= m <= 64 dividing dim, got m=$m d=$d")
    val w = d / m
    val books = pqFit(vecs, idCol, vecCol, m, ksub, iters).map { fitted =>
      val rows = fitted
        .select(col("cid").cast("long"), col("cv"),
          norm(col("cv")).cast("double"), dot(col("cv"), col("cv")).cast("double"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2),
          r.getDouble(3)))
        .sortBy(_._1)
      require(rows.map(_._1).toSeq == (0L until ksub.toLong),
        s"codebook ids must be exactly 0..${ksub - 1}")
      PqBook(rows.toSeq.map(r => (r._1, r._2, r._3)), rows.toSeq.map(_._4))
    }
    (w, books)
  }

  /** Corpus rows with per-subspace code columns `__c0..` and the
    * reconstruction norm `__rn` = √Σ‖c_sub‖² — all map-side expressions
    * over the collected codebooks (assignment is [[nearestCellExpr]] per
    * subspace): ZERO corpus shuffles to encode. */
  private def pqEncoded(vecs: DataFrame, idCol: String, vecCol: String,
                        w: Int, books: Seq[PqBook]): DataFrame = {
    val m = books.size
    val base = (0 until m).foldLeft(vecs.select(col(idCol), col(vecCol))) {
      (df, s) =>
        df.withColumn(s"__s$s", slice(col(vecCol), s * w + 1, w))
          .withColumn(s"__n$s", norm(col(s"__s$s")))
    }
    val coded = (0 until m).foldLeft(base) { (df, s) =>
      df.withColumn(s"__c$s",
        nearestCellExpr(col(s"__s$s"), col(s"__n$s"), books(s).cents))
    }
    val rn = sqrt((0 until m).map { s =>
      element_at(typedLit(books(s).ss), (col(s"__c$s") + 1).cast("int"))
    }.reduce(_ + _))
    coded.withColumn("__rn", rn)
  }

  /** Product-quantization encode — the vector-compression step a 100 TB
    * embedding corpus takes before ANN serving: d floats reduce to m
    * codebook ids (reported as a CSV string: engine-portable, no
    * array-typed output) plus one reconstruction norm. Map-side only. */
  def pqEncode(vecs: DataFrame, idCol: String, vecCol: String, m: Int,
               ksub: Int, iters: Int): DataFrame = {
    val (w, books) = collectPqBooks(vecs, idCol, vecCol, m, ksub, iters)
    pqEncoded(vecs, idCol, vecCol, w, books)
      .select(col(idCol).as("vec_id"),
        concat_ws(",", (0 until m).map(s => col(s"__c$s").cast("string")): _*)
          .as("codes"),
        round(col("__rn"), 6).as("recon_norm"))
  }

  /** PQ-ADC top-k search: asymmetric distance — the EXACT query vector
    * scored against quantized corpus reconstructions. Because subspaces
    * are contiguous slices, cos(q, recon(x)) decomposes exactly:
    * Σ_s ⟨q_s, c_s(code)⟩ / (‖q‖ · √Σ_s ‖c_s(code)‖²) — every factor is
    * a lookup into the broadcast-literal codebooks, so the corpus streams
    * past the broadcast query table carrying only its m codes + one norm
    * (the PQ memory contract), and the only exchange is the bounded
    * [[Aggregators.topK]]. Recall is governed by (m, ksub) exactly as in
    * a production PQ index. */
  def pqTopK(vecs: DataFrame, idCol: String, vecCol: String, m: Int,
             ksub: Int, iters: Int, queryPred: Column, topN: Int): DataFrame = {
    val (w, books) = collectPqBooks(vecs, idCol, vecCol, m, ksub, iters)
    val enc = pqEncoded(vecs, idCol, vecCol, w, books)
      .select(col(idCol).as("neighbor_id") +:
        (0 until m).map(s => col(s"__c$s")) :+ col("__rn"): _*)
    val q = withNorm(vecs, vecCol).filter(queryPred)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("nrm").as("qn"))
    val dotSum = (0 until m).map { s =>
      dot(slice(col("qv"), s * w + 1, w),
        element_at(typedLit(books(s).cents.map(_._2.toSeq)),
          (col(s"__c$s") + 1).cast("int")))
    }.reduce(_ + _)
    val topk = udaf(Aggregators.topK(topN), Encoders.product[ScoredHit])
    enc.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dotSum / (col("qn") * col("__rn")), 6).as("sim"))
      .groupBy("query_id")
      .agg(topk(col("sim"), col("neighbor_id").cast("long")).as("tk"))
      .select(col("query_id"), posexplode(col("tk.hits")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("neighbor_id"), col("col.sim").as("sim"))
  }

  /** Leave-one-out kNN classification accuracy per label — the
    * embedding-quality eval: each query's label is predicted by majority
    * vote of its k nearest neighbors (self excluded by [[bruteTopK]]),
    * ties broken toward the smallest label; output is per-true-label
    * (n_queries, n_correct, acc). A representation whose neighborhoods
    * respect labels is one worth curating with (SemDeDup/ANN both lean
    * on that structure).
    *
    * Scale shape: the neighbor search is [[bruteTopK]]'s broadcast-query
    * scan (query set small by contract); the |q|·k neighbor list is then
    * the BROADCAST side of the label join, so the corpus-sized label
    * table never shuffles; votes and accuracy are two tiny aggregations.
    * At full scale swap bruteTopK for [[ivfTopK]] — the eval logic is
    * unchanged. */
  def knnEval(vecs: DataFrame, idCol: String, vecCol: String,
              labelCol: String, queryPred: Column, k: Int): DataFrame = {
    val nn = bruteTopK(vecs, idCol, vecCol, queryPred, k)
      .select(col("query_id"), col("neighbor_id"))
    val lab = vecs.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("nlabel"))
    val votes = lab.join(broadcast(nn), "neighbor_id")
      .groupBy("query_id", "nlabel").agg(count(lit(1)).as("cnt"))
    // lexicographic struct max = (most votes, then smallest label)
    val pred = votes.groupBy("query_id").agg(
      max(struct(col("cnt").as("c"), (lit(0L) - col("nlabel")).as("neg"),
        col("nlabel").as("l"))).getField("l").as("pred"))
    val truth = vecs.filter(queryPred)
      .select(col(idCol).as("query_id"), col(labelCol).as("label"))
    truth.join(broadcast(pred), "query_id")
      .groupBy("label").agg(
        count(lit(1)).as("n_queries"),
        sum((col("pred") === col("label")).cast("long")).as("n_correct"),
        round(avg((col("pred") === col("label")).cast("double")), 4).as("acc"))
  }
}
