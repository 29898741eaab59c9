package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Selection]] — CCNet-style perplexity bucketing and DSIR-style
  * importance weighting, each checked against an independent in-memory
  * replay of its definition. */
class SelectionSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  test("unigramCrossEntropy equals an in-memory replay of the definition") {
    val rows = Seq(
      (1L, "the cat sat on the mat", "a"),
      (2L, "the dog sat", "a"),
      (3L, "quantum flux capacitor", "b"),
      (4L, "", "b")) // zero tokens → dropped
    val got = Selection
      .unigramCrossEntropy(docsDf(rows), col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // replay: corpus counts over the same \W+ lowercase tokenization
    val toks = rows.map { case (id, t, _) =>
      id -> t.toLowerCase(java.util.Locale.ROOT).split("\\W+").filter(_.nonEmpty).toSeq }.toMap
    val corpus = toks.values.flatten.groupBy(identity).map { case (w, ws) => w -> ws.size }
    val total = corpus.values.sum.toDouble
    val want = toks.filter(_._2.nonEmpty).map { case (id, ts) =>
      val h = math.log(total) -
        ts.map(w => math.log(corpus(w).toDouble)).sum / ts.size
      id -> (ts.size.toLong, h)
    }
    assert(got.keySet == want.keySet && !got.contains(4L))
    want.foreach { case (id, (n, h)) =>
      assert(got(id)._1 == n)
      assert(math.abs(got(id)._2 - h) < 1e-9, s"doc $id: ${got(id)._2} vs $h")
    }
  }

  test("perplexityBuckets: per-group tertiles, head = lowest cross-entropy") {
    // 6 docs per group: common words → low xent (head), rare → tail
    val common = Seq("the cat sat", "the cat ran", "the dog sat",
      "the dog ran", "a cat a dog", "zyx wvu tsr")
    val rows = for {
      (g, off) <- Seq(("g1", 0L), ("g2", 100L))
      (t, i) <- common.zipWithIndex
    } yield (off + i, t, g)
    val got = Selection
      .perplexityBuckets(docsDf(rows), col("text"), col("doc_id"), col("source"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getString(4)))
    // tertiles: 6 docs per group → exactly 2 per bucket
    got.groupBy(_._2).foreach { case (g, rs) =>
      val byBucket = rs.groupBy(_._4).view.mapValues(_.length).toMap
      assert(byBucket == Map("head" -> 2, "middle" -> 2, "tail" -> 2), s"$g: $byBucket")
      // bucket order respects the xent order
      val h = rs.filter(_._4 == "head").map(_._3).max
      val m = rs.filter(_._4 == "middle").map(_._3)
      val t = rs.filter(_._4 == "tail").map(_._3).min
      assert(h <= m.min && m.max <= t)
      // the all-rare-words doc is in the tail
      assert(rs.find(r => r._1 % 100 == 5).get._4 == "tail")
    }
  }

  test("dsirLogWeights equals an in-memory replay and ranks target-like raw docs first") {
    val rows = Seq(
      (1L, "alpha beta gamma alpha beta", "tgt"),
      (2L, "alpha gamma beta delta", "tgt"),
      (10L, "alpha beta gamma", "raw"),   // target-like
      (11L, "omega sigma lambda", "raw"), // disjoint from target
      (12L, "alpha omega", "raw"))
    val B = 64
    val got = Selection
      .dsirLogWeights(docsDf(rows), col("text"), col("doc_id"),
        col("source") === "tgt", buckets = B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .map { case (id, n, w) => id -> (n, w) }.toMap

    // replay with an independent md5 bucket hash
    def bucket(s: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % B).toInt
    }
    def feats(t: String): Seq[Int] = {
      val ts = t.toLowerCase(java.util.Locale.ROOT).split("\\W+").filter(_.nonEmpty).toSeq
      (ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))).map(bucket)
    }
    val (tgt, raw) = rows.partition(_._3 == "tgt")
    val ctB = tgt.flatMap(r => feats(r._2)).groupBy(identity).view.mapValues(_.size).toMap
    val crB = raw.flatMap(r => feats(r._2)).groupBy(identity).view.mapValues(_.size).toMap
    val (tt, tr) = (ctB.values.sum.toDouble, crB.values.sum.toDouble)
    def lr(b: Int): Double =
      math.log((ctB.getOrElse(b, 0) + 1) / (tt + B)) -
        math.log((crB.getOrElse(b, 0) + 1) / (tr + B))
    val want = raw.map { r =>
      val fs = feats(r._2)
      r._1 -> (fs.size.toLong, fs.map(lr).sum)
    }.toMap
    assert(got.keySet == Set(10L, 11L, 12L)) // only raw docs scored
    want.foreach { case (id, (n, w)) =>
      assert(got(id)._1 == n, s"doc $id n_feats")
      assert(math.abs(got(id)._2 - w) < 1e-9, s"doc $id: ${got(id)._2} vs $w")
    }
    // the target-like doc outranks the disjoint one
    assert(got(10L)._2 > got(12L)._2 && got(12L)._2 > got(11L)._2)
  }

  test("classKlFromCorpus equals an in-memory replay; identical class → KL 0") {
    val rows = Seq(
      (1L, "alpha beta alpha", "a"),
      (2L, "alpha beta gamma", "a"),
      (3L, "omega omega sigma", "b"),
      (4L, "alpha beta alpha alpha beta gamma", "c")) // = class a merged
    val got = Selection
      .classKlFromCorpus(docsDf(rows), col("text"), col("source"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val toks = rows.map { case (_, t, s) =>
      s -> t.toLowerCase(java.util.Locale.ROOT).split("\\W+").filter(_.nonEmpty).toSeq }
    val corpus = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val total = corpus.values.sum.toDouble
    val want = toks.groupBy(_._1).map { case (s, ts) =>
      val ws = ts.flatMap(_._2)
      val n = ws.size.toDouble
      val kl = ws.groupBy(identity).map { case (w, o) =>
        (o.size / n) * math.log((o.size * total) / (n * corpus(w)))
      }.sum
      s -> (ws.size.toLong, kl)
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (s, (n, kl)) =>
      assert(got(s)._1 == n)
      assert(math.abs(got(s)._2 - kl) < 1e-9, s"class $s: ${got(s)._2} vs $kl")
      assert(kl >= -1e-12, s"KL must be non-negative, class $s: $kl")
    }
  }

  test("naiveBayesAttribution: separable classes attribute to their own source") {
    // two classes with disjoint vocabulary plus one straddler: every
    // pure doc must win its own class; the straddler goes to the class
    // whose words dominate it
    val rows = Seq(
      (1L, "alpha beta alpha gamma", "a"),
      (2L, "beta gamma alpha", "a"),
      (3L, "omega sigma omega tau", "b"),
      (4L, "sigma tau omega", "b"),
      (5L, "alpha beta omega", "a")) // 2 a-words vs 1 b-word
    val got = Selection
      .naiveBayesAttribution(docsDf(rows), col("text"), col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b", 5L -> "a"))
  }

  test("naiveBayesAttribution score equals the replayed Laplace log-likelihood") {
    val rows = Seq(
      (1L, "alpha beta alpha", "a"),
      (2L, "omega sigma", "b"),
      (3L, "alpha omega", "b"))
    val got = Selection
      .naiveBayesAttribution(docsDf(rows), col("text"), col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getDouble(3))).toMap

    val toks = rows.map { case (id, t, s) =>
      (id, t.toLowerCase(java.util.Locale.ROOT).split("\\W+").filter(_.nonEmpty).toSeq, s) }
    val model = toks.groupBy(_._3).view
      .mapValues(_.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap).toMap
    val vocabV = toks.flatMap(_._2).distinct.size
    def score(ws: Seq[String], s: String): Double = {
      val m = model(s)
      val ns = m.values.sum
      ws.map(w => math.log(m.getOrElse(w, 0) + 1.0)).sum -
        ws.size * math.log(ns + vocabV.toDouble)
    }
    toks.foreach { case (id, ws, _) =>
      val scores = model.keys.map(s => s -> score(ws, s)).toMap
      val best = scores.toSeq.map { case (s, sc) =>
        (BigDecimal(sc).setScale(6, BigDecimal.RoundingMode.HALF_UP), s)
      }.sortBy(p => (-p._1, p._2)).head
      assert(got(id)._1 == best._2, s"doc $id predicted")
      assert(math.abs(got(id)._2 - scores(got(id)._1)) < 1e-6, s"doc $id score")
    }
  }
}
