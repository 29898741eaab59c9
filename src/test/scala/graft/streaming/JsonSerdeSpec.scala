package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The serde edge (reference `serdes/JsonSerde.scala:10-36`): structured
  * payloads ride as JSON strings; schema is declared exactly at the edge
  * (from_json on read, to_json on write), null-safe in both directions —
  * the Spark equivalent of a Jackson serde with DefaultScalaModule. */
case class ProductValue(merchant: String, name: String)

class JsonSerdeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("merchant", StringType), StructField("name", StringType)))

  test("from_json/to_json round-trip preserves the payload; nulls stay null") {
    val s = spark
    import s.implicits._
    val in = Seq(
      Rec("3 bands", """{"merchant":"adidas","name":"3 bands"}""", 0, 1),
      Rec("bad", "not json at all", 0, 2),
      Rec("gone", null, 0, 3)).toDS()

    val decoded = in.withColumn("pv", from_json(col("value"), schema))
    val rows = decoded.select(col("key"), col("pv.merchant"), col("pv.name"))
      .as[(String, String, String)].collect().toSet
    assert(rows == Set(
      ("3 bands", "adidas", "3 bands"),
      ("bad", null, null),    // malformed → null struct fields (PERMISSIVE)
      ("gone", null, null)))  // null in → null out (null-safe read)

    val roundTrip = decoded.filter(col("key") === "3 bands")
      .select(to_json(col("pv")).as("v")).as[String].head()
    assert(roundTrip == """{"merchant":"adidas","name":"3 bands"}""")
  }

  test("typed view: Dataset[ProductValue] via Encoders.product") {
    val s = spark
    import s.implicits._
    val typed = Seq(Rec("k", """{"merchant":"puma","name":"x"}""", 0, 1)).toDS()
      .select(from_json(col("value"), schema).as("pv"))
      .select(col("pv.*")).as[ProductValue]
    assert(typed.collect().toList == List(ProductValue("puma", "x")))
  }
}
