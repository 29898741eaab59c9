package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AllPairs prefix filtering: exact recall vs brute force, candidate
  * pruning on rare-token data, and threshold monotonicity. */
class PrefixJoinSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("prefixJoin ≡ brute-force token-set Jaccard at t = 0.5") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 150)
    val got = DedupOps.prefixJoin(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent brute force: collect token sets, all-pairs Jaccard
    // with the same rounded-6 threshold convention
    val sets = docs
      .select(col("doc_id"), graft.functions.TextAnalysis.tokens(col("text")))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .filter(_._2.nonEmpty)
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      j = round6(inter.toDouble / (sa.size + sb.size - inter))
      if j >= 0.5
    } yield (ia, ib)).toSet
    assert(got === want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty, "fixture produced no true pairs — test is vacuous")
  }

  test("rare-token prefixes prune candidates below all-pairs") {
    import spark.implicits._
    // two near-dup pairs sharing rare tokens + four unrelated docs built
    // from a disjoint common pool: the common pool words are frequent
    // (high df) so they never enter a prefix
    val docs = Seq(
      (1L, "alpha beta gamma delta zeta unique1 unique2"),
      (2L, "alpha beta gamma delta zeta unique1 unique3"),
      (3L, "omega psi chi phi shared1"),
      (4L, "omega psi chi phi shared2"),
      (5L, "alpha beta omega psi mixone"),
      (6L, "gamma delta chi phi mixtwo")
    ).toDF("doc_id", "text")
    val nCand = DedupOps.prefixCandidates(docs, "doc_id", "text", 0.5).count()
    assert(nCand < 15, s"no pruning: $nCand of 15 possible pairs survived")
    val pairs = DedupOps.prefixJoin(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (3L, 4L)), pairs)
  }

  test("prefixJoin ≡ brute-force 3-gram shingle Jaccard at t = 0.5 (the d17 shape)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 150)
    val got = DedupOps.prefixJoin(docs, "doc_id", "text", 0.5, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent brute force over 3-gram shingle SETS (plain Scala
    // shingling, not DedupOps.shingles)
    val sets = docs
      .select(col("doc_id"), graft.functions.TextAnalysis.tokens(col("text")))
      .collect()
      .map { r =>
        val t = r.getSeq[String](1)
        val sh = if (t.size >= 3) t.sliding(3).map(_.mkString(" ")).toSet
                 else Set(t.mkString(" "))
        r.getLong(0) -> sh
      }
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      j = round6(inter.toDouble / (sa.size + sb.size - inter))
      if j >= 0.5
    } yield (ia, ib)).toSet
    assert(got === want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("randomized: ≡ brute force on synthetic corpora at t ∈ {0.5, 0.75}") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 30).map(i => s"w$i")
    (1 to 4).foreach { trial =>
      // clustered docs: a few seeds, each spawning noisy variants, plus
      // singletons — sizes 1..14 exercise every prefix-length edge
      // (index prefix = 1 for tiny docs, ties in n, exact-integer ⌈⌉
      // boundaries at n divisible by 3)
      val seeds = (1 to 4).map(_ => (1 + rnd.nextInt(13), rnd.shuffle(vocab).toList))
      val docs = (0 until 24).map { i =>
        val (sz, base) = seeds(rnd.nextInt(seeds.length))
        val words = base.take(sz).map(w =>
          if (rnd.nextInt(5) == 0) vocab(rnd.nextInt(vocab.length)) else w)
        (i.toLong, rnd.shuffle(words).mkString(" "))
      }.toDF("doc_id", "text")
      val sets = docs
        .select(col("doc_id"), graft.functions.TextAnalysis.tokens(col("text")))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
        .filter(_._2.nonEmpty)
      Seq(0.5, 0.75).foreach { t =>
        val got = DedupOps.prefixJoin(docs, "doc_id", "text", t)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = (for {
          (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
          inter = (sa & sb).size
          j = round6(inter.toDouble / (sa.size + sb.size - inter))
          if j >= t
        } yield (ia, ib)).toSet
        assert(got === want,
          s"trial=$trial t=$t missing=${want -- got} extra=${got -- want}")
      }
    }
  }

  test("raising the threshold only removes pairs") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 100)
    val loose = DedupOps.prefixJoin(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tight = DedupOps.prefixJoin(docs, "doc_id", "text", 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(loose), s"tight=$tight loose=$loose")
  }
}
