package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dupSpans vs an independent plain-Scala span finder, plus the
  * containment-vs-jaccard contract on a pasted-subset pair. */
class DupSpansSpec extends SparkSpec {

  import spark.implicits._

  // doc 0 and 1 share an 8-token run; doc 2 repeats its own 8-token run;
  // doc 3 is all-unique filler
  private val shared = "alpha beta gamma delta epsilon zeta eta theta"
  private lazy val docs = Seq(
    (0L, s"one two $shared three four"),
    (1L, s"five $shared six seven eight nine"),
    (2L, s"$shared x1 x2 $shared"),
    (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")
  ).toDF("doc_id", "text")

  private def bruteSpans(corpus: Seq[(Long, Seq[String])], n: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val grams = corpus.flatMap { case (id, t) =>
      t.sliding(n).zipWithIndex.filter(_._1.size == n)
        .map { case (g, i) => (id, i, g.mkString(" ")) }
    }
    val occ = grams.groupBy(_._3).filter(_._2.size >= 2).keySet
    val out = scala.collection.mutable.Set[(Long, Long, Long, Long, Long)]()
    corpus.foreach { case (id, _) =>
      val starts = grams.filter(g => g._1 == id && occ(g._3)).map(_._2).sorted
      if (starts.nonEmpty) {
        var islands = List(List(starts.head))
        starts.tail.foreach { p =>
          if (p - islands.head.head <= n) islands = (p :: islands.head) :: islands.tail
          else islands = List(p) :: islands
        }
        islands.reverse.zipWithIndex.foreach { case (isl, i) =>
          val s = isl.reverse
          out += ((id, i + 1L, s.head.toLong, s.size.toLong,
            s.last.toLong - s.head + n))
        }
      }
    }
    out.toSet
  }

  test("dupSpans matches the brute-force span finder") {
    val got = DedupOps.dupSpans(docs, "doc_id", "text", shingleN = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val corpus = Seq(
      0L -> s"one two $shared three four",
      1L -> s"five $shared six seven eight nine",
      2L -> s"$shared x1 x2 $shared",
      3L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"
    ).map { case (id, t) => id -> t.split(' ').toSeq }
    assert(got == bruteSpans(corpus, 8))
    assert(got.nonEmpty && !got.exists(_._1 == 3L)) // filler doc has no spans
  }

  test("within-doc repeats count as duplicated spans") {
    val got = DedupOps.dupSpans(docs, "doc_id", "text", shingleN = 8)
      .filter(col("doc_id") === 2L).collect()
    assert(got.nonEmpty) // doc 2's repeat is purely internal
  }

  test("containment flags a pasted subset that jaccard dilutes") {
    val short = "p1 p2 p3 p4 p5"
    val long = s"$short f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 f11 f12 f13 f14 f15"
    val d = Seq((0L, short), (1L, long)).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L)).toDF("a", "b")
    val c = DedupOps.ngramContainment(d, "doc_id", "text", pairs, shingleN = 3)
      .collect().head.getDouble(2)
    val j = DedupOps.ngramJaccard(d, "doc_id", "text", pairs, shingleN = 3)
      .collect().head.getDouble(2)
    assert(c == 1.0, s"containment $c")   // every short-doc shingle is in the long doc
    assert(j < 0.2, s"jaccard $j")        // union dominated by the long doc
    assert(c >= j)
  }
}
