package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dictionaryMatch must equal the brute-force definition (all distinct
  * pairs, same-block predicate, DL ≤ k) and find the planted typo pairs
  * with correct multiplicities. */
class FuzzyMatchSpec extends SparkSpec {

  private def firstToken(c: org.apache.spark.sql.Column) =
    element_at(split(c, " "), 1)

  test("planted typos are found with multiplicities; cross-block pairs are not candidates") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      "red widget", "red widget", "red widgte", // transposition, dl=1
      "red wdget",                              // deletion, dl=1
      "blue bolt", "blue blot",                 // transposition in another block
      "red bolt"                                // same block as widgets but far away
    ).toDF("name")
    val got = FuzzyMatch.dictionaryMatch(rows, "name", firstToken, 2)
      .select("name_a", "name_b", "n_a", "n_b", "dl")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSet
    assert(got.contains(("red widget", "red widgte", 2L, 1L, 1)))
    assert(got.contains(("red wdget", "red widget", 1L, 2L, 1)))
    assert(got.contains(("blue blot", "blue bolt", 1L, 1L, 1)))
    // "red widgte" vs "red wdget" are also within 2 of each other
    assert(got.forall { case (a, b, _, _, _) =>
      a < b && firstTokenOf(a) == firstTokenOf(b) })
    // far-away same-block name produces no pair
    assert(!got.exists { case (a, b, _, _, _) => a == "red bolt" || b == "red bolt" })
  }

  private def firstTokenOf(sv: String): String = sv.split(" ")(0)

  test("blocked result == brute-force definition on the part dictionary") {
    val s = spark
    val part = graft.Tables.part(s, "/root/testdata/sf0.001")
    val got = FuzzyMatch.dictionaryMatch(part, "p_name", firstToken, 3)
    // brute force: all distinct-name pairs, then the same predicates
    val dict = part.groupBy(col("p_name").as("name")).agg(count(lit(1)).as("n"))
    val brute = dict.as("a").crossJoin(dict.as("b"))
      .filter(col("a.name") < col("b.name"))
      .filter(firstToken(col("a.name")) === firstToken(col("b.name")))
      .withColumn("dl", FuzzyMatch.damerauLevenshtein(col("a.name"), col("b.name")))
      .filter(col("dl") <= 3)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        levenshtein(col("a.name"), col("b.name")).as("lev"), col("dl"))
    assert(got.count() > 0)
    assert(got.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(got).count() == 0)
  }
}
