package graft.expressions

import graft.SparkSpec
import graft.functions.DedupOps

/** The map-side MinHash expression must produce byte-identical signatures
  * to the aggregate chain it replaced — over the real document corpus,
  * including short (< shingle) and empty documents. */
class MinHashSignatureSpec extends SparkSpec {

  test("map-side signatures == aggregate-chain signatures on the corpus") {
    val s = spark
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val fast = DedupOps.minhashSignatures(docs, "doc_id", "text", 12)
    val ref = DedupOps.minhashSignaturesAgg(docs, "doc_id", "text", 12)
    assert(fast.exceptAll(ref).count() == 0)
    assert(ref.exceptAll(fast).count() == 0)
    assert(fast.count() == docs.count())
  }

  test("short and empty documents take the whole-document shingle path") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "one two"), (2L, ""), (3L, "word"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    val fast = DedupOps.minhashSignatures(docs, "doc_id", "text", 12)
    val ref = DedupOps.minhashSignaturesAgg(docs, "doc_id", "text", 12)
    assert(fast.exceptAll(ref).count() == 0)
    assert(ref.exceptAll(fast).count() == 0)
  }
}
