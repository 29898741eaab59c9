package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** bloomDecontaminate ≡ decontaminate (zero false negatives), on both a
  * synthetic paste corpus and the real sf0.001 split, plus normalization
  * units. */
class BloomDecontaminateSpec extends SparkSpec {

  import spark.implicits._

  test("bloom path equals the exact path on a synthetic paste") {
    val bench = Seq((100L, "q1 q2 q3 q4 q5 q6"), (101L, "r1 r2 r3 r4 r5"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "a b c q1 q2 q3 q4 q5 q6 d e"), // contains a benchmark 5-gram
      (1L, "clean text with no overlap at all here"),
      (2L, "r1 r2 r3 r4 r5")               // benchmark doc pasted whole
    ).toDF("doc_id", "text")
    val exact = DedupOps.decontaminate(corpus, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val bloom = DedupOps.bloomDecontaminate(corpus, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(bloom == exact)
    assert(exact.exists(r => r._1 == 0L && r._3) &&
      exact.exists(r => r._1 == 2L && r._3) &&
      exact.exists(r => r._1 == 1L && !r._3))
  }

  test("bloom path equals the exact path on the sf0.001 split") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") % 41 =!= 0)
    val bench = docs.filter(col("doc_id") % 41 === 0)
    val exact = DedupOps.decontaminate(corpus, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val bloom = DedupOps.bloomDecontaminate(corpus, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bloom == exact)
    assert(exact.values.exists(_ > 0), "split produced no contamination to exercise")
  }

  test("a tiny bitset still yields exact results (false positives verified away)") {
    // bits=64 → dense bitset → many false positives; the exact join must
    // absorb them all
    val bench = Seq((10L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val corpus = (0L until 20L).map(i =>
      (i, s"f${i}a f${i}b f${i}c f${i}d f${i}e f${i}f")).toDF("doc_id", "text")
    val out = DedupOps.bloomDecontaminate(corpus, bench, "doc_id", "text",
        shingleN = 5, bits = 64, numHashes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 20 && out.forall(_._2 == 0L))
  }

  test("normalizeWs + asciiClean collapse casing/space/punct variants") {
    val df = Seq(
      (0L, "Hello,   World! "),
      (1L, "hello world"),
      (2L, "HELLO\tWORLD."),
      (3L, "different text")
    ).toDF("doc_id", "text")
    val d = df.select(col("doc_id"),
        md5(TextAnalysis.asciiClean(TextAnalysis.normalizeWs(col("text")))).as("dg"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(d(0L) == d(1L) && d(1L) == d(2L))
    assert(d(3L) != d(0L))
  }
}
