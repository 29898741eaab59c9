package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextAnalysis.scrubPii]] redaction rules and the x36 decayed-sum
  * aggregate — contract tests on crafted rows (the oracle pair checks
  * the corpus-scale behavior). */
class PiiScrubSpec extends SparkSpec {

  private def scrub(text: String): String = {
    import spark.implicits._
    Seq(text).toDF("t").select(TextAnalysis.scrubPii(col("t"))).head().getString(0)
  }

  test("email tokens mask before the digit rule can half-eat them") {
    assert(scrub("write bob.smith+x@corp-mail.example.com today")
      === "write <EMAIL> today")
    // an email whose local part is one long digit run still masks as ONE
    // email token, not an <ID> inside a mangled address
    assert(scrub("1234567890@mail.example.org") === "<EMAIL>")
  }

  test("digit runs: years survive, >=5-digit identifiers mask") {
    assert(scrub("born 1984 acct 123456789 zip 02139")
      === "born 1984 acct <ID> zip <ID>") // zips are 5 digits: masked too
    assert(scrub("call 555-867-5309 x7") === "call 555-867-5309 x7") // runs < 5
    assert(scrub("imei 490154203237518") === "imei <ID>")
  }

  test("piiHits counts matches the rewrite would take") {
    import spark.implicits._
    val n = Seq("id 111111 and 222222 but 1999").toDF("t")
      .select(TextAnalysis.piiHits(col("t"), "[0-9]{5,}")).head().getInt(0)
    assert(n === 2)
  }

  test("x36 decayed sum matches the hand-rolled recurrence") {
    import spark.implicits._
    // one user, three events in time order: S = v1*a^2 + v2*a + v3
    val rows = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (1L, 30L, 4.0))
      .toDF("user_id", "ts", "event_id") // placeholder names, fixed below
    val ev = rows.toDF("user_id", "ts", "value")
      .withColumn("event_id", col("ts"))
    val byUser = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val ordered = byUser.orderBy(col("ts"), col("event_id"))
    val got = ev
      .select(col("user_id"), col("value"),
        row_number().over(ordered).as("rn"),
        count(lit(1)).over(byUser).as("cnt"))
      .groupBy("user_id")
      .agg(round(sum(col("value") * pow(lit(0.9), col("cnt") - col("rn"))), 4)
        .as("s"))
      .head().getDouble(1)
    val want = BigDecimal(1.0 * 0.81 + 2.0 * 0.9 + 4.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === want)
  }
}
