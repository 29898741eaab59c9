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

  test("short, empty, and NULL documents agree with the aggregate chain") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, Some("one two")), (2L, Some("")), (3L, Some("word")),
        (4L, Some("a b c d")), (5L, Option.empty[String]))
      .toDF("doc_id", "text")
    val fast = DedupOps.minhashSignatures(docs, "doc_id", "text", 12)
    val ref = DedupOps.minhashSignaturesAgg(docs, "doc_id", "text", 12)
    assert(fast.exceptAll(ref).count() == 0)
    assert(ref.exceptAll(fast).count() == 0)
  }

  test("null tokens inside the array follow concat_ws semantics (skip token AND separator)") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(xs: Any*) = ArrayData.toArrayData(xs.map {
      case s: String => UTF8String.fromString(s)
      case other => other
    }.toArray[Any])
    // concat_ws(' ', 'a', NULL, 'b') = 'a b' — identical to ('a', 'b')
    val withNull = MinHashSignature.compute(arr("a", null, "b"), 8, 3)
    val without = MinHashSignature.compute(arr("a", "b"), 8, 3)
    assert(withNull.toLongArray().toSeq == without.toLongArray().toSeq)
    // leading/trailing nulls likewise add no separator
    val padded = MinHashSignature.compute(arr(null, "a", "b", null), 8, 4)
    assert(padded.toLongArray().toSeq == without.toLongArray().toSeq)
  }

  test("negative hash count is rejected, not a runtime array error") {
    intercept[Exception] {
      graft.expressions.MinHashSignature.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[AnyRef]),
        numHashes = -1, shingleN = 3)
    }
  }
}
