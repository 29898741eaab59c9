package graft.expressions

import graft.SparkSpec
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

/** The single-pass tokenizer must agree exactly with
  * `filter(split(lower(text), "\\W+"), _ <> '')` — edge strings plus the
  * whole sf0.001 document corpus. */
class AsciiWordTokensSpec extends SparkSpec {

  private val edges = Seq(
    "Hello World",
    "  leading  and trailing  ",
    "punct!@#$%^&*()between",
    "under_score_kept_4ever",
    "MixedCASE123",
    "",
    "---",
    "unicode café naïve 中文 mixed",
    "tab\tnl\nret\r",
    "a",
    "numbers 007 42x")

  test("edge strings: custom expression == regex reference") {
    val s = spark
    import s.implicits._
    val df = edges.toDF("text")
    val both = df.select(
      TextAnalysis.tokens(col("text")).as("fast"),
      TextAnalysis.tokensHof(col("text")).as("ref"))
    val rows = both.as[(Seq[String], Seq[String])].collect()
    rows.zip(edges).foreach { case ((fast, ref), src) =>
      assert(fast == ref, s"mismatch on '$src'")
    }
  }

  test("document corpus: custom expression == regex reference") {
    val s = spark
    import s.implicits._
    val mismatches = graft.Tables.documents(s, "/root/testdata/sf0.001")
      .select(TextAnalysis.tokens(col("text")).as("fast"),
        TextAnalysis.tokensHof(col("text")).as("ref"))
      .filter(not(col("fast") === col("ref")))
      .count()
    assert(mismatches == 0)
  }

  test("null text yields null, not a crash") {
    val s = spark
    import s.implicits._
    val out = Seq(Option.empty[String], Some("a b")).toDF("text")
      .select(TextAnalysis.tokens(col("text")).as("t"))
      .as[Option[Seq[String]]].collect().toSet
    assert(out == Set(None, Some(Seq("a", "b"))))
  }
}
