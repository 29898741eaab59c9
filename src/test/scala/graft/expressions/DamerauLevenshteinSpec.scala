package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftShims

/** The unrestricted Damerau-Levenshtein expression is checked against an
  * INDEPENDENT definition: DL(a,b) is by definition the minimum number of
  * insert / delete / substitute / adjacent-transpose operations turning a
  * into b, so a breadth-first search over actual string states is a
  * ground-truth oracle for short strings — it shares no code or
  * recurrence with the Lowrance-Wagner matrix under test.
  */
class DamerauLevenshteinSpec extends SparkSpec {

  private def dlCol(a: Column, b: Column): Column =
    GraftShims.column(DamerauLevenshtein(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Ground truth by BFS over edit operations. */
  private def bfsDl(a: String, b: String): Int = {
    if (a == b) return 0
    val maxLen = math.max(a.length, b.length) + 2
    var frontier = Set(a)
    val seen = scala.collection.mutable.Set(a)
    var d = 0
    val alphabet = (a + b).toSet
    while (d < 12) {
      d += 1
      val next = scala.collection.mutable.Set[String]()
      for (s <- frontier) {
        val edits = scala.collection.mutable.Set[String]()
        for (i <- 0 to s.length; c <- alphabet)
          edits += s.substring(0, i) + c + s.substring(i) // insert
        for (i <- 0 until s.length)
          edits += s.substring(0, i) + s.substring(i + 1) // delete
        for (i <- 0 until s.length; c <- alphabet)
          edits += s.substring(0, i) + c + s.substring(i + 1) // substitute
        for (i <- 0 until s.length - 1)
          edits += s.substring(0, i) + s(i + 1) + s(i) + s.substring(i + 2) // transpose
        for (e <- edits if e.length <= maxLen && !seen(e)) {
          if (e == b) return d
          seen += e; next += e
        }
      }
      frontier = next.toSet
    }
    sys.error(s"BFS budget exhausted for '$a' -> '$b'")
  }

  test("known distances, incl. the OSA-vs-unrestricted separator") {
    val cases = Seq(
      ("", "", 0), ("", "abc", 3), ("abc", "", 3), ("abc", "abc", 0),
      ("ab", "ba", 1),          // one transpose
      ("abcd", "acbd", 1),      // interior transpose
      ("CA", "ABC", 2),         // unrestricted: transpose + insert (OSA says 3)
      ("kitten", "sitting", 3), // plain Levenshtein territory
      ("a cat", "an act", 2))
    val s = spark
    import s.implicits._
    val df = cases.toDF("a", "b", "want")
      .withColumn("got", dlCol(col("a"), col("b")))
    val bad = df.filter(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("randomized agreement with the BFS ground truth") {
    val rnd = new scala.util.Random(42)
    def word() = (0 until rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val cases = Vector.fill(120)((word(), word()))
    val s = spark
    import s.implicits._
    val got = cases.toDF("a", "b")
      .withColumn("got", dlCol(col("a"), col("b")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    for ((a, b) <- cases)
      assert(got((a, b)) == bfsDl(a, b), s"'$a' vs '$b'")
  }

  test("metric properties and the Levenshtein bound") {
    val rnd = new scala.util.Random(7)
    def word() = (0 until rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val cases = Vector.fill(200)((word(), word()))
    val s = spark
    import s.implicits._
    val rows = cases.toDF("a", "b").select(
      col("a"), col("b"),
      dlCol(col("a"), col("b")).as("ab"),
      dlCol(col("b"), col("a")).as("ba"),
      levenshtein(col("a"), col("b")).as("lev")).collect()
    for (r <- rows) {
      val (a, b, ab, ba, lev) =
        (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(ab == ba, s"symmetry '$a' '$b'")
      assert(ab <= lev, s"DL must not exceed Levenshtein: '$a' '$b'")
      assert(ab >= math.abs(a.length - b.length), s"length bound '$a' '$b'")
      assert((ab == 0) == (a == b), s"identity '$a' '$b'")
    }
  }

  test("SQL registration and null semantics") {
    val s = spark
    graft.GraftExtensions.register(s)
    val r = s.sql(
      "SELECT damerau_levenshtein('CA', 'ABC') AS d, " +
        "damerau_levenshtein(CAST(NULL AS STRING), 'x') AS n").collect()(0)
    assert(r.getInt(0) == 2)
    assert(r.isNullAt(1))
  }
}
