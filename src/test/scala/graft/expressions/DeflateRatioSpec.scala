package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DEFLATE ratio: redundancy ordering, bounds, determinism, null/empty
  * handling, and equivalence to a direct JVM Deflater run. */
class DeflateRatioSpec extends SparkSpec {

  private def ratios(texts: Seq[String]): Map[String, Double] = {
    val s = spark
    import s.implicits._
    texts.toDF("t")
      .select(col("t"), DeflateRatio.ratio(col("t")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("repetitive text compresses far below varied text") {
    val spam = "buy now " * 200
    val prose = (1 to 200).map(i => s"w${i * 7919 % 1000}").mkString(" ")
    val got = ratios(Seq(spam, prose))
    assert(got(spam) < 0.05, s"spam ratio ${got(spam)}")
    assert(got(prose) > 0.3, s"prose ratio ${got(prose)}")
    assert(got(spam) < got(prose))
  }

  test("empty is 1.0; nulls stay null; short strings may exceed 1 (framing)") {
    val s = spark
    import s.implicits._
    val got = Seq(Some(""), None, Some("a"))
      .toDF("t").select(DeflateRatio.ratio(col("t"))).collect()
    assert(got(0).getDouble(0) === 1.0)
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0) >= 1.0)
  }

  test("matches a direct Deflater run and is partitioning-invariant") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val one = docs.coalesce(1)
      .select(col("doc_id"), DeflateRatio.ratio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val many = docs.repartition(7)
      .select(col("doc_id"), DeflateRatio.ratio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(one === many)
    // spot-check one row against the UTF8String-level function
    val (id, txt) = docs.select(col("doc_id"), col("text"))
      .head() match { case row => (row.getLong(0), row.getString(1)) }
    assert(one(id) === DeflateRatio.ratioOf(
      org.apache.spark.unsafe.types.UTF8String.fromString(txt)))
  }

  test("non-string input is rejected at analysis") {
    val s = spark
    import s.implicits._
    val ex = intercept[Exception] {
      Seq(1L).toDF("v").select(DeflateRatio.ratio(col("v"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string")
      || ex.getMessage.contains("deflate_ratio"), ex.getMessage)
  }
}
