package graft.functions

import graft.SparkSpec

/** [[DedupOps.spanDupStats]] against an independent plain-Scala brute
  * force on a random small-vocabulary corpus (dense shingle collisions),
  * so the distributed formulation is checked by something that shares
  * none of its code — the same belt-and-braces discipline as
  * `ConnectedComponentsPropertySpec`. */
class SpanDupSpec extends SparkSpec {

  test("spanDupStats matches a plain-Scala brute force on a random corpus") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docs = (0L until 40L).map { i =>
      val n = 1 + rnd.nextInt(12) // includes docs shorter than the shingle
      (i, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }

    def bruteShingles(text: String, n: Int): Set[String] = {
      val t = text.toLowerCase(java.util.Locale.ROOT).split("\\W+").filter(_.nonEmpty).toSeq
      if (t.size >= n) t.sliding(n).map(_.mkString(" ")).toSet
      else Set(t.mkString(" "))
    }
    val per = docs.map { case (id, tx) => id -> bruteShingles(tx, 3) }.toMap
    val docFreq = per.values.flatten.toSeq.groupBy(identity).map { case (k, v) => k -> v.size }
    val expected = docs.map { case (id, _) =>
      val sh = per(id)
      val dup = sh.count(x => docFreq(x) >= 2)
      (id, sh.size.toLong, dup.toLong, dup.toDouble / math.max(sh.size, 1))
    }.sortBy(_._1)

    val got = DedupOps.spanDupStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq

    assert(got.map(t => (t._1, t._2, t._3)) == expected.map(t => (t._1, t._2, t._3)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-6, s"doc ${g._1}: frac ${g._4} vs ${e._4}")
    }
  }
}
