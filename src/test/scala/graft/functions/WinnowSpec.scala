package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[DedupOps.winnowFingerprints]] — independent Scala replay of the
  * robust-winnowing selection, the paper's w+k−1 match guarantee on
  * planted shared runs, and the short-input degradations. */
class WinnowSpec extends SparkSpec {

  import spark.implicits._

  /** Independent replay: md5-60-bit gram hashes, rightmost-min window
    * selection — deliberately plain Scala, no Spark expressions. */
  private def replay(text: String, k: Int, w: Int): (Int, Seq[Long]) = {
    def h(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val t = text.toLowerCase(java.util.Locale.ROOT).split("\\W+").filter(_.nonEmpty).toSeq
    if (t.size < k) return (0, Nil)
    val g = t.sliding(k).map(ws => h(ws.mkString(" "))).toVector
    val wins =
      if (g.size < w) Seq(g.lastIndexOf(g.min))
      else (0 to g.size - w).map { j =>
        val win = g.slice(j, j + w)
        j + win.lastIndexOf(win.min)
      }
    (g.size, wins.map(g).distinct.sorted)
  }

  test("selection equals the independent replay, including the digest") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "a b c a b c a b c a b c",       // heavy repetition → few distinct fps
      "one two three four five six seven eight nine ten",
      "alpha beta gamma",               // exactly one gram
      "tiny doc",                       // < k tokens → empty sketch
      "")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = DedupOps.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val (ng, fps) = replay(t, 3, 4)
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(fps.mkString(",").getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got(i.toLong) == ((ng.toLong, fps.size.toLong, digest)), s"doc $i")
    }
  }

  test("the w+k-1 guarantee: a planted shared run yields a common fingerprint") {
    // two documents with disjoint vocabularies except a planted run of
    // exactly w + k − 1 = 6 tokens — the minimum length the paper
    // guarantees a shared selected fingerprint for
    val run = "omega kappa sigma delta theta lambda"
    val rng = new scala.util.Random(42)
    def words(prefix: String, n: Int): String =
      Seq.fill(n)(s"$prefix${rng.nextInt(1000)}").mkString(" ")
    val pairs = (0 until 10).map { i =>
      (s"${words("left", 20)} $run ${words("left", 20)}",
        s"${words("right", 20)} $run ${words("right", 20)}")
    }
    val docs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((2L * i, a), (2L * i + 1, b)) }.toDF("doc_id", "text")
    val rows = DedupOps.winnowRows(docs, "doc_id", "text", k = 3, w = 4)
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    (0 until 10).foreach { i =>
      val shared = rows(2L * i) intersect rows(2L * i + 1)
      assert(shared.nonEmpty, s"pair $i: planted 6-token run must share a fingerprint")
    }
  }

  test("replay equality holds across the (k, w) parameter space") {
    val rng = new scala.util.Random(5)
    val texts = (0 until 6).map(i =>
      Seq.fill(5 + rng.nextInt(40))(s"w${rng.nextInt(25)}").mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for ((k, w) <- Seq((1, 5), (2, 3), (4, 2), (5, 1))) {
      val got = DedupOps.winnowFingerprints(docs, "doc_id", "text", k, w)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val (ng, fps) = replay(t, k, w)
        assert(got(i.toLong) == ((ng.toLong, fps.size.toLong)),
          s"k=$k w=$w doc $i: ${got(i.toLong)} vs ($ng, ${fps.size})")
      }
    }
  }

  test("short inputs: empty sketch below k tokens, global min below w grams") {
    val docs = Seq((1L, "a b"), (2L, "a b c"), (3L, "a b c d e"))
      .toDF("doc_id", "text")
    val got = DedupOps.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((0L, 0L)))  // 2 tokens < k
    assert(got(2L) == ((1L, 1L)))  // one gram → its own fingerprint
    assert(got(3L) == ((3L, 1L)))  // 3 grams < w → single global min
  }
}
