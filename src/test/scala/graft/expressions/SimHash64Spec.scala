package graft.expressions

import graft.SparkSpec
import graft.functions.DedupOps
import org.apache.spark.sql.functions._

/** The map-side 64-bit SimHash expression must match the aggregate chain
  * bit for bit, and (d+1)-band blocking must return EXACTLY the all-pairs
  * Hamming result (pigeonhole recall). */
class SimHash64Spec extends SparkSpec {

  test("map-side simhash64 == aggregate-chain simhash64 on the corpus") {
    val s = spark
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val fast = DedupOps.simhash64(docs, "doc_id", "text")
    val ref = DedupOps.simhash64Agg(docs, "doc_id", "text")
    assert(fast.exceptAll(ref).count() == 0)
    assert(ref.exceptAll(fast).count() == 0)
  }

  test("edge documents: empty drops out, sign bit round-trips") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "one two one two"), (2L, ""), (3L, "word"), (4L, "--- !!!"))
      .toDF("doc_id", "text")
    val fast = DedupOps.simhash64(docs, "doc_id", "text")
    val ref = DedupOps.simhash64Agg(docs, "doc_id", "text")
    assert(fast.exceptAll(ref).count() == 0)
    assert(ref.exceptAll(fast).count() == 0)
    assert(fast.count() == 2)
    // a single token's signature IS its leading 64 digest bits — some
    // corpus of one-word docs must exercise a set sign bit eventually;
    // force one deterministically: md5("word") starts c4/7... -> check
    // sign-bit handling by asserting the expression agrees with a direct
    // recompute for this token
    val sig = fast.filter($"doc_id" === 3L).head().getLong(1)
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("word".getBytes)
    var expect = 0L
    for (i <- 0 until 64) if (((d(i / 8) >>> (7 - i % 8)) & 1) == 1)
      expect |= 1L << i
    assert(sig == expect)
  }

  test("banded pairs == all-pairs Hamming filter (perfect recall)") {
    val s = spark
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val sigs = DedupOps.simhash64(docs, "doc_id", "text").localCheckpoint(true)
    val banded = DedupOps.simhashPairsBanded(sigs, 3)
    val l = sigs.select(col("doc_id").as("a"), col("simhash").as("ha"))
    val r = sigs.select(col("doc_id").as("b"), col("simhash").as("hb"))
    val allPairs = l.join(r, col("a") < col("b"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("int"))
      .filter(col("hamming") <= 3)
      .select("a", "b", "hamming")
    assert(banded.exceptAll(allPairs).count() == 0)
    assert(allPairs.exceptAll(banded).count() == 0)
  }

  test("banded blocking handles synthetic sign-bit and boundary distances") {
    val s = spark
    import s.implicits._
    // hand-built signatures: pairs at hamming 0, 3 (kept) and 4 (dropped),
    // including bits spanning band boundaries and the sign bit
    val base = 0x123456789abcdefL
    val sigs = Seq(
      (1L, base),
      (2L, base),                                  // hamming 0
      (3L, base ^ ((1L << 15) | (1L << 16) | (1L << 63))), // 3, straddles bands + sign
      (4L, base ^ ((1L << 0) | (1L << 17) | (1L << 33) | (1L << 49))) // 4 → dropped
    ).toDF("doc_id", "simhash")
    val got = DedupOps.simhashPairsBanded(sigs, 3)
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 0), (1L, 3L, 3), (2L, 3L, 3)))
  }
}
