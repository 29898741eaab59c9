package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gopher-style repetition signals: duplicate token / n-gram fractions. */
class TextRepetitionSpec extends SparkSpec {

  private def fracs(text: String): (Double, Double, Double) = {
    import spark.implicits._
    val row = Seq(text).toDF("text")
      .select(TextAnalysis.tokens(col("text")).as("t"))
      .select(
        TextAnalysis.dupTokenFrac(col("t")).as("tok"),
        TextAnalysis.dupNgramFrac(col("t"), 2).as("bi"),
        TextAnalysis.dupNgramFrac(col("t"), 3).as("tri"))
      .head()
    (row.getDouble(0), row.getDouble(1), row.getDouble(2))
  }

  test("all-distinct text has zero repetition in every signal") {
    assert(fracs("one two three four five") === ((0.0, 0.0, 0.0)))
  }

  test("fully repeated text: (n-1)/n duplicate tokens and n-grams") {
    // tokens: 4×"spam" → dup 3/4; bigrams: 3ד spam spam" → dup 2/3;
    // trigrams: 2× → dup 1/2
    val (tok, bi, tri) = fracs("spam spam spam spam")
    assert(tok === 0.75)
    assert(bi === 0.6667)
    assert(tri === 0.5)
  }

  test("repeated phrase with distinct words shows up at n-gram level only") {
    // "a b c a b c": every token duplicated (3 distinct of 6 → 0.5);
    // bigrams: [a b, b c, c a, a b, b c] → 3 distinct of 5 → 0.4
    val (tok, bi, _) = fracs("a b c a b c")
    assert(tok === 0.5)
    assert(bi === 0.4)
  }

  test("short and empty docs produce 0, not 1 (no evidence ≠ all dup)") {
    assert(fracs("") === ((0.0, 0.0, 0.0)))
    assert(fracs("word") === ((0.0, 0.0, 0.0)))
    assert(fracs("two words") === ((0.0, 0.0, 0.0))) // one bigram, no trigram
  }
}
