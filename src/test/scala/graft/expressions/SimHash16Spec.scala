package graft.expressions

import graft.SparkSpec
import graft.functions.DedupOps

/** The map-side SimHash expression must match the aggregate chain bit
  * for bit — corpus plus edge documents (empty → no row, single token,
  * exact vote ties). */
class SimHash16Spec extends SparkSpec {

  test("map-side simhash == aggregate-chain simhash on the corpus") {
    val s = spark
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val fast = DedupOps.simhash16(docs, "doc_id", "text")
    val ref = DedupOps.simhash16Agg(docs, "doc_id", "text")
    assert(fast.exceptAll(ref).count() == 0)
    assert(ref.exceptAll(fast).count() == 0)
  }

  test("edge documents: empty drops out, others agree") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "one two one two"), (2L, ""), (3L, "word"), (4L, "--- !!!"))
      .toDF("doc_id", "text")
    val fast = DedupOps.simhash16(docs, "doc_id", "text")
    val ref = DedupOps.simhash16Agg(docs, "doc_id", "text")
    assert(fast.exceptAll(ref).count() == 0)
    assert(ref.exceptAll(fast).count() == 0)
    // docs 2 and 4 have no tokens → no signature row in either form
    assert(fast.count() == 2)
  }
}
