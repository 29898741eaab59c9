package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ingest gate: planted exact/near/new fixtures, the whitespace
  * normalization of the exact layer, and the evidence threshold edge. */
class IngestGateSpec extends SparkSpec {

  test("planted verdicts: exact beats near; evidence threshold is >= 3") {
    val s = spark
    import s.implicits._
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog every single day"),
      (2L, "completely unrelated corpus text about astronomy and telescopes and lenses")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      // exact after normalization (case + whitespace)
      (10L, "  The quick   brown fox jumps over the lazy dog every single day "),
      // near: long shared prefix with doc 1 (many shared 5-grams), new tail
      (20L, "the quick brown fox jumps over the lazy dog every single morning instead"),
      // shares < 3 shingles with anything
      (30L, "entirely fresh content with no overlap whatsoever against anything stored"),
      // exact match is also a trivial near-dup — verdict must say exact
      (40L, "completely unrelated corpus text about astronomy and telescopes and lenses")
    ).toDF("doc_id", "text")
    val got = DedupOps.ingestGate(incoming, base, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got(10L)._2 == "exact", got(10L))
    assert(got(20L)._2 == "near" && got(20L)._1 >= 3, got(20L))
    assert(got(30L)._2 == "new" && got(30L)._1 < 3, got(30L))
    assert(got(40L)._2 == "exact", got(40L))
  }

  test("gate over the harness split: every incoming doc gets exactly one verdict") {
    val s = spark
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val inc = docs.filter(col("doc_id") % 10 === 0)
    val out = DedupOps.ingestGate(inc,
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
    assert(out.count() == inc.count())
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    val verdicts = out.select("verdict").distinct()
      .collect().map(_.getString(0)).toSet
    assert(verdicts.subsetOf(Set("exact", "near", "new")), verdicts)
  }
}
