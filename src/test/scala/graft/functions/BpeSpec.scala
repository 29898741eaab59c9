package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Bpe]] — merge learning against a hand-computed textbook trace, and
  * [[Bpe.encode]] pinned to the SAME left-to-right non-overlapping fuse
  * contract as learning (encode∘learnMerges must reproduce the learner's
  * final symbol state; concatenating subwords must rebuild the word). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // corpus: "low" ×3, "lower" ×1, "west" ×2 — hand trace of get_stats:
  //   round 1 pairs: (l,o)=4 (low×3 + lower), (o,w)=4, (w,e)=3 (lower + west×2),
  //     (e,r)=1, (e,s)=2, (s,t)=2 → max 4, tie (l,o) < (o,w) → merge (l,o)
  //   round 2: (lo,w)=4, (w,e)=3, (e,r)=1, (e,s)=2, (s,t)=2 → merge (lo,w)
  //   round 3: (low,e)=1, (e,r)=1, (w,e)=2, (e,s)=2, (s,t)=2 → tie on 2,
  //     (e,s) < (s,t) < (w,e) → merge (e,s)
  private val docs = Seq(
    "low low low", "lower", "west west"
  ).toDF("text")

  test("learnMerges matches the hand-computed textbook trace") {
    val got = Bpe.learnMerges(docs, "text", rounds = 3)
      .orderBy("step")
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1, "l", "o", "lo", 4L),
      (2, "lo", "w", "low", 4L),
      (3, "e", "s", "es", 2L)))
  }

  test("learning stops early when the vocabulary is fully fused") {
    val tiny = Seq("ab ab").toDF("text")
    // only one mergeable pair exists; round 2 finds nothing and stops
    val got = Bpe.learnMerges(tiny, "text", rounds = 10)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(got == Seq((1, "a", "b", "ab", 2L)))
  }

  test("encode applies learned merges with the learner's fuse contract") {
    val merges = Bpe.learnMerges(docs, "text", rounds = 3)
      .orderBy("step")
      .select("lhs", "rhs").as[(String, String)].collect().toSeq
    val enc = Bpe.encode(Seq("low lower west lowest").toDF("text"),
        "text", merges)
      .select(col("subwords"))
      .as[Seq[String]].collect().toSeq
    // l+o→lo, lo+w→low, e+s→es applied in step order, left-to-right
    assert(enc == Seq(
      Seq("low"),
      Seq("low", "e", "r"),
      Seq("w", "es", "t"),
      Seq("low", "es", "t")))
  }

  test("encode round-trips: concatenated subwords rebuild every word") {
    val merges = Bpe.learnMerges(docs, "text", rounds = 3)
      .orderBy("step")
      .select("lhs", "rhs").as[(String, String)].collect().toSeq
    // encode emits one row per word; the rebuilt multiset must equal the
    // corpus token multiset (merging never loses or invents characters)
    val rebuilt = Bpe.encode(docs, "text", merges)
      .select(concat_ws("", col("subwords")).as("rebuilt"))
      .as[String].collect().sorted.toSeq
    val words = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .as[String].collect().sorted.toSeq
    assert(rebuilt == words)
  }
}
