package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftShims

/** The Jaro-Winkler expression is pinned two ways: (1) the published
  * textbook values for the classic parameterization (Winkler 1990's own
  * examples, plus DuckDB-probed edges for the boost threshold, prefix
  * cap and empty-string convention), and (2) a plain-Scala replay of
  * the definition written over different data structures (per-index
  * match lists, no shared code with the UTF8String port), fuzzed over
  * random small-alphabet words so duplicate-character edge cases are
  * hit constantly. */
class JaroWinklerSpec extends SparkSpec {

  private def jwCol(a: Column, b: Column): Column =
    GraftShims.column(JaroWinkler(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Independent textbook replay: greedy window matching via an
    * explicit per-position assignment list. */
  private def replay(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val taken = Array.fill(b.length)(false)
    val pairs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    for (i <- a.indices) {
      val js = (math.max(0, i - window) to
        math.min(b.length - 1, i + window)).find(j => !taken(j) && a(i) == b(j))
      js.foreach { j => taken(j) = true; pairs += ((i, j)) }
    }
    val m = pairs.size
    if (m == 0) return 0.0
    val aSeq = pairs.map(_._1).map(a(_))
    val bSeq = pairs.map(_._2).sorted.map(b(_))
    val half = aSeq.zip(bSeq).count { case (x, y) => x != y } / 2
    val md = m.toDouble
    val jaro = (md / a.length + md / b.length + (md - half) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val prefix = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
      jaro + prefix * 0.1 * (1.0 - jaro)
    }
  }

  test("published and DuckDB-probed fixtures") {
    val cases = Seq(
      // Winkler's classics
      ("martha", "marhta", 0.961111),
      ("dwayne", "duane", 0.84),
      ("dixon", "dicksonx", 0.813333),
      // boost threshold: jaro 2/3 <= 0.7 stays unboosted
      ("ab", "ax", 0.666667),
      ("abcdefgh", "abcdxxxx", 0.666667),
      // prefix cap 4 (probed against DuckDB)
      ("prefixaaaa", "prefixbbbb", 0.84),
      ("aaaaaaa", "aaaaaab", 0.942857),
      // empty-string convention: 0.0, both-empty included
      ("", "", 0.0), ("a", "", 0.0), ("", "abc", 0.0),
      // zero-window exact-position matching
      ("ab", "ba", 0.0), ("a", "a", 1.0),
      ("abcdef", "abcdef", 1.0))
    val s = spark
    import s.implicits._
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .withColumn("jw", round(jwCol(col("a"), col("b")), 6))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for ((a, b, want) <- cases)
      assert(got((a, b)) == want, s"'$a' vs '$b': got ${got((a, b))}, want $want")
  }

  test("randomized agreement with the independent replay") {
    val rnd = new scala.util.Random(271828)
    def word() = (0 until rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val cases = Vector.fill(300)((word(), word()))
    val s = spark
    import s.implicits._
    val got = cases.toDF("a", "b")
      .withColumn("jw", jwCol(col("a"), col("b")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for ((a, b) <- cases)
      assert(got((a, b)) == replay(a, b), s"'$a' vs '$b'")
  }

  test("range, identity and boost-dominance properties") {
    val rnd = new scala.util.Random(31337)
    def word() = (1 to 1 + rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val cases = Vector.fill(250)((word(), word()))
    val s = spark
    import s.implicits._
    val rows = cases.toDF("a", "b").select(
      col("a"), col("b"),
      jwCol(col("a"), col("b")).as("ab"),
      jwCol(col("b"), col("a")).as("ba")).collect()
    for (r <- rows) {
      val (a, b, ab, ba) =
        (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3))
      assert(ab >= 0.0 && ab <= 1.0, s"range '$a' '$b'")
      assert(ab == ba, s"symmetry '$a' '$b'")
      if (a == b) assert(ab == 1.0, s"identity '$a'")
      else assert(ab < 1.0, s"distinct strings below 1: '$a' '$b'")
    }
  }

  test("SQL registration and null semantics") {
    val s = spark
    graft.GraftExtensions.register(s)
    val r = s.sql(
      "SELECT round(jaro_winkler('martha', 'marhta'), 6) AS j, " +
        "jaro_winkler(CAST(NULL AS STRING), 'x') AS n").collect()(0)
    assert(r.getDouble(0) == 0.961111)
    assert(r.isNullAt(1))
  }
}
