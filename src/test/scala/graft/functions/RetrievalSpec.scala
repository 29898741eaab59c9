package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** BM25 ranking and the sharded inverted index — hand-computed scores on
  * a tiny corpus, structural invariants (shard bounds, postings↔tf
  * round-trip), and ranking monotonicity. */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hash join hash join hash"),      // tf(hash)=3 tf(join)=2, dl=5
    (1L, "merge sort merge sort"),         // tf(merge)=2, dl=4
    (2L, "scan filter scan filter scan filter"), // no query terms, dl=6
    (3L, "hash"),                          // tf(hash)=1, dl=1
    (4L, "join merge hash join merge hash join") // all three, dl=7
  ).toDF("doc_id", "text")

  test("bm25 matches a hand-rolled reference implementation") {
    val got = Retrieval.bm25Rank(docs, "doc_id", "text",
      Seq("hash", "join", "merge"), topN = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))

    // reference: plain Scala over the same corpus
    val corpus = Seq(
      0L -> Seq("hash", "join", "hash", "join", "hash"),
      1L -> Seq("merge", "sort", "merge", "sort"),
      2L -> Seq("scan", "filter", "scan", "filter", "scan", "filter"),
      3L -> Seq("hash"),
      4L -> Seq("join", "merge", "hash", "join", "merge", "hash", "join"))
    val n = corpus.size.toDouble
    val avgdl = corpus.map(_._2.size).sum / n
    val terms = Seq("hash", "join", "merge")
    val dfm = terms.map(t => t -> corpus.count(_._2.contains(t))).toMap
    def score(toks: Seq[String]): Double = {
      val dl = toks.size.toDouble
      val s = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.sum
      math.rint(s * 1e6) / 1e6
    }
    val expect = corpus.map { case (id, toks) => id -> score(toks) }
      .filter(_._2 > 0.0)
      .sortBy { case (id, sc) => (-sc, id) }
      .zipWithIndex.map { case ((id, sc), i) => (id, i + 1, sc) }
    assert(got.toSeq == expect)
  }

  test("qlm matches a hand-rolled Dirichlet decomposition; length term ranks non-matches") {
    val got = Retrieval.qlmRank(docs, "doc_id", "text",
      Seq("hash", "join", "merge"), topN = 10, mu = 10.0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))

    val corpus = Seq(
      0L -> Seq("hash", "join", "hash", "join", "hash"),
      1L -> Seq("merge", "sort", "merge", "sort"),
      2L -> Seq("scan", "filter", "scan", "filter", "scan", "filter"),
      3L -> Seq("hash"),
      4L -> Seq("join", "merge", "hash", "join", "merge", "hash", "join"))
    val terms = Seq("hash", "join", "merge")
    val ct = corpus.map(_._2.size).sum.toDouble
    val cfm = terms.map(t => t -> corpus.map(_._2.count(_ == t)).sum).toMap
    val mu = 10.0
    def score(toks: Seq[String]): Double = {
      val m = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0.0 else math.log(1.0 + (tf * ct) / (mu * cfm(t)))
      }.sum
      val s = m + terms.size * math.log(mu / (toks.size + mu))
      math.rint(s * 1e6) / 1e6
    }
    val expect = corpus.map { case (id, toks) => id -> score(toks) }
      .sortBy { case (id, sc) => (-sc, id) }
      .zipWithIndex.map { case ((id, sc), i) => (id, i + 1, sc) }
    assert(got.toSeq == expect)
    // unlike bm25, EVERY doc is ranked: the no-match doc appears, scored
    // purely by its length term
    assert(got.map(_._1).contains(2L))
  }

  test("percolate matches all-terms containment; absent anchors match nothing") {
    val queries = Seq(
      ("qa", Seq("hash", "join")),     // docs 0 and 4
      ("qb", Seq("merge")),            // docs 1 and 4
      ("qc", Seq("hash", "absent")),   // impossible
      ("qd", Seq("scan", "filter")))   // doc 2
    val got = Retrieval.percolate(docs, "doc_id", "text", queries)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // replay: brute containment over the same corpus
    val corpus = Seq(
      0L -> "hash join hash join hash", 1L -> "merge sort merge sort",
      2L -> "scan filter scan filter scan filter", 3L -> "hash",
      4L -> "join merge hash join merge hash join")
    val want = (for {
      (qid, ts) <- queries
      (id, text) <- corpus
      toksOf = text.split(" ").toSet
      if ts.forall(toksOf.contains)
    } yield (qid, id)).toSet
    assert(got == want, s"got $got want $want")
    assert(!got.exists(_._1 == "qc"))
  }

  test("bm25 excludes docs with no query term and ranks contiguously") {
    val got = Retrieval.bm25Rank(docs, "doc_id", "text",
      Seq("hash", "join", "merge"), topN = 10).collect()
    assert(!got.map(_.getLong(0)).contains(2L)) // doc 2 has no query term
    assert(got.map(_.getInt(1)).toSeq == (1 to got.length))
    val scores = got.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("inverted index: shards bound rows, postings round-trip the tfs") {
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text", shards = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    // every posting's doc lands in its row's shard, sorted by doc_id
    idx.foreach { case (term, shard, df, totalTf, postings) =>
      val posts = postings.split(',').map { p =>
        val Array(d, t) = p.split(':'); (d.toLong, t.toLong)
      }
      assert(posts.forall(_._1 % 2 == shard), s"$term/$shard: $postings")
      assert(posts.map(_._1).toSeq == posts.map(_._1).sorted.toSeq)
      assert(posts.length.toLong == df && posts.map(_._2).sum == totalTf)
    }
    // postings reconstruct the corpus tf exactly: "hash" in doc 0 (shard 0) = 3
    val hash0 = idx.find(x => x._1 == "hash" && x._2 == 0).get
    assert(hash0._5.split(',').contains("0:3"))
    // df summed over shards = number of docs containing the term
    val hashDf = idx.filter(_._1 == "hash").map(_._3).sum
    assert(hashDf == 3L) // docs 0, 3, 4
  }

  test("x31 sessionize plans exactly one exchange (window shuffle reused)") {
    val p = graft.SparkEntry.queries("x31_sessionize")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.sliding("Exchange".length).count(_ == "Exchange") == 1, p)
  }

  test("x31 gaps-and-islands sessionizer ≡ Spark's built-in session_window") {
    // boundary alignment: session_window(gap) merges on STRICT overlap
    // (new session when diff ≥ gap), x31 splits on diff > 300 — so the
    // equivalent built-in gap is 301 s
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val builtin = ev
      .groupBy(session_window(timestamp_seconds(col("ts_sec")), "301 seconds"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"), min("ts_sec").as("start_sec"),
        max("ts_sec").as("end_sec"))
      .select("user_id", "start_sec", "end_sec", "n_events")
    val ours = graft.SparkEntry.queries("x31_sessionize")(spark, "/root/testdata/sf0.001")
      .select("user_id", "start_sec", "end_sec", "n_events")
    assert(ours.exceptAll(builtin).isEmpty && builtin.exceptAll(ours).isEmpty,
      "gaps-and-islands sessions disagree with session_window")
    assert(builtin.count() > 0)
  }

  test("x31 sessionize splits on gap > 300 and aggregates per session") {
    val ev = Seq(
      ("u1", 1L, 100L, 1.0), ("u1", 2L, 350L, 2.0),  // gap 250 ≤ 300: same session
      ("u1", 3L, 700L, 3.0),                          // gap 350 > 300: new session
      ("u2", 4L, 100L, 4.0)
    ).toDF("user_id", "event_id", "ts_sec", "value")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts_sec"), col("event_id"))
    val sess = ev
      .withColumn("new_s", when(col("ts_sec") - lag("ts_sec", 1).over(w) > 300, 1).otherwise(0))
      .withColumn("session_idx",
        sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) + 1)
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"), min("ts_sec").as("start_sec"),
        max("ts_sec").as("end_sec"), round(sum("value"), 2).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(sess == Set(
      ("u1", 1L, 2L, 100L, 350L, 3.0),
      ("u1", 2L, 1L, 700L, 700L, 3.0),
      ("u2", 1L, 1L, 100L, 100L, 4.0)))
  }

  test("rake matches a hand computation: scores, dedup, ranking order") {
    // stopwords here: and, is, a. Islands:
    //   [good data pipelines] [good data quality] [good thing]
    // freq/deg: good 3/(3+3+2)=8/3; data 2/6=3; pipelines 3; quality 3;
    // thing 2. Phrase scores: 8/3+3+3 = 8.6667 (twice), 8/3+2 = 4.6667
    val d = Seq(
      (7L, "good data pipelines and good data quality is a good thing"),
      (8L, "the of and"), // stopwords only -> no phrases, no rows
      (9L, "deep learning of deep learning")) // duplicate phrase dedups
      .toDF("doc_id", "text")
    val got = Retrieval.rake(d, topK = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2))
    assert(got.filter(_._1 == 7L).toSeq == Seq(
      (7L, 1, "good data pipelines", 8.6667),
      (7L, 2, "good data quality", 8.6667),
      (7L, 3, "good thing", 4.6667)), got.toSeq)
    assert(!got.exists(_._1 == 8L), got.toSeq)
    // "deep learning" x2: freq/deg deep 2/4=2, learning 2/4=2; one row
    assert(got.filter(_._1 == 9L).toSeq == Seq((9L, 1, "deep learning", 4.0)),
      got.toSeq)
  }

  test("rake respects topK and breaks score ties by phrase string") {
    val d = Seq((1L, "alpha beta and beta alpha and gamma delta")).toDF("doc_id", "text")
    // islands: [alpha beta] [beta alpha] [gamma delta]; every word score
    // is 2, every phrase scores 4.0 -> rank order is pure phrase order
    val got = Retrieval.rake(d, topK = 2).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getDouble(3))).sortBy(_._1)
    assert(got.toSeq == Seq((1, "alpha beta", 4.0), (2, "beta alpha", 4.0)), got.toSeq)
  }
}
