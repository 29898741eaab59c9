package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Joins.salted]] — exact equivalence to the plain equi-join on a
  * skewed fixture, the plan-level scatter/replicate shape, and the
  * precondition checks. */
class SaltedJoinSpec extends SparkSpec {

  import spark.implicits._

  // one celebrity key (0) carrying most of the fact rows + a long tail
  private def skewedFacts = (0 until 600).map { i =>
    val k = if (i < 400) 0L else (i % 37).toLong
    (k, i.toLong, s"f$i")
  }.toDF("fk", "row_id", "payload")

  private def dims = (0L until 37L).map(k => (k, s"dim$k")).toDF("pk", "attr")

  test("salted join ≡ plain join, row for row") {
    val plain = skewedFacts.join(dims, col("fk") === col("pk"))
      .select("row_id", "attr").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Joins.salted(skewedFacts, dims, "fk", "pk",
        Seq(col("row_id")), buckets = 8)
      .select("row_id", "attr").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain)
    assert(plain.size === 600, "every fact row must match exactly once")
  }

  test("hot key rows spread across salt buckets; small side replicates ×buckets") {
    val b = 8
    val salts = skewedFacts.filter(col("fk") === 0L)
      .withColumn("s", pmod(hash(col("row_id")), lit(b)))
      .select("s").distinct().count()
    assert(salts > 1, "the celebrity key must scatter over >1 reducer")
    // replicate side: the plan carries a Generate (explode) over the
    // literal salt sequence — buckets × |small| rows feed the join
    val plan = Joins.salted(skewedFacts, dims, "fk", "pk",
      Seq(col("row_id")), buckets = b).queryExecution.optimizedPlan.toString
    assert(plan.contains("Generate explode"), plan)
  }

  test("deterministic salt: re-running lands rows in identical buckets") {
    val once = Joins.salted(skewedFacts, dims, "fk", "pk",
      Seq(col("row_id")), buckets = 8).orderBy("row_id").collect()
    val again = Joins.salted(skewedFacts, dims, "fk", "pk",
      Seq(col("row_id")), buckets = 8).orderBy("row_id").collect()
    assert(once.toSeq === again.toSeq)
  }

  test("preconditions: shared names, reserved columns, bucket count") {
    val sharedName = dims.withColumnRenamed("attr", "payload")
    intercept[IllegalArgumentException] {
      Joins.salted(skewedFacts, sharedName, "fk", "pk", Seq(col("row_id")), 4)
    }
    intercept[IllegalArgumentException] {
      Joins.salted(skewedFacts.withColumn("__graft_salt", lit(1)),
        dims, "fk", "pk", Seq(col("row_id")), 4)
    }
    intercept[IllegalArgumentException] {
      Joins.salted(skewedFacts, dims, "fk", "pk", Seq(col("row_id")), 0)
    }
  }
}
