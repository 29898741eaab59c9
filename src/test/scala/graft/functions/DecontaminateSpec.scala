package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Benchmark decontamination: n-gram overlap against a held-out set. */
class DecontaminateSpec extends SparkSpec {

  test("docs sharing an n-gram with the benchmark are flagged; others not") {
    import spark.implicits._
    val bench = Seq(
      (1L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // contains "quick brown fox" (3-gram from the benchmark)
      (10L, "a very quick brown fox appeared"),
      // no 3-gram overlap
      (11L, "completely unrelated sentence about spark plans"),
      // two distinct overlapping 3-grams: "the lazy dog", "over the lazy"
      (12L, "it leapt over the lazy dog today")
    ).toDF("doc_id", "text")

    val out = DedupOps.decontaminate(corpus, bench, "doc_id", "text", shingleN = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

    assert(out === Array((10L, 1L, true), (11L, 0L, false), (12L, 2L, true)))
  }

  test("hits count DISTINCT n-grams: a repeated overlap counts once") {
    import spark.implicits._
    val bench  = Seq((1L, "x y z")).toDF("doc_id", "text")
    val corpus = Seq((2L, "x y z and x y z again")).toDF("doc_id", "text")
    val out = DedupOps.decontaminate(corpus, bench, "doc_id", "text", shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out === Array((2L, 1L, true)))
  }

  test("short docs fall back to the whole-document shingle") {
    import spark.implicits._
    // both sides shorter than n → whole-doc shingles, exact-match semantics
    val bench  = Seq((1L, "tiny doc")).toDF("doc_id", "text")
    val corpus = Seq((2L, "tiny doc"), (3L, "other doc")).toDF("doc_id", "text")
    val out = DedupOps.decontaminate(corpus, bench, "doc_id", "text", shingleN = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out === Array((2L, 1L, true), (3L, 0L, false)))
  }

  test("fuzzy decontamination: near-dup flagged, unrelated not, threshold honored") {
    import spark.implicits._
    val words = (1 to 40).map(i => s"word$i")
    val bench = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    // one substitution mid-doc → ~0.85 shingle Jaccard near-dup
    val nearDup = words.updated(19, "SWAPPED").mkString(" ")
    val corpus = Seq(
      (10L, nearDup),
      (11L, "completely different words about spark physical plans here")
    ).toDF("doc_id", "text")

    val out = DedupOps.fuzzyDecontaminate(corpus, bench, "doc_id", "text",
        offset = 1000L, rowsPerBand = 2, minJaccard = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(out.map(_._1).toList == List(10L, 11L))
    assert(out(0)._3, s"near-dup must be flagged (best_jaccard=${out(0)._2})")
    assert(out(0)._2 > 0.8)
    assert(!out(1)._3 && out(1)._2 == 0.0, "unrelated doc must not be flagged")

    // raising the threshold above the pair's Jaccard clears the flag but
    // keeps the evidence column
    val strict = DedupOps.fuzzyDecontaminate(corpus, bench, "doc_id", "text",
        offset = 1000L, rowsPerBand = 2, minJaccard = 0.99)
      .filter($"doc_id" === 10L).head()
    assert(!strict.getBoolean(2) && strict.getDouble(1) > 0.8)
  }

  test("benchmark side is broadcast: no shuffle of the corpus probe") {
    import spark.implicits._
    val bench  = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val corpus = Seq((2L, "a b c d e f g")).toDF("doc_id", "text")
    val plan = DedupOps.decontaminate(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast probe join, got:\n$plan")
  }
}
