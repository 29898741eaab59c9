package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Concat-order chunking: bins target the budget, overflow only by the
  * straddling document, and the layout is partitioning-invariant. */
class PackingSpec extends SparkSpec {

  test("bin totals overflow by strictly less than their last document") {
    val s = spark
    import s.implicits._
    val budget = 100
    val docs = (1L to 400L).map(i => (i, 1L + (i * 7919) % 60)).toDF("id", "nt")
    val packed = Packing.packByBudget(docs, col("id"), col("nt"), budget, buckets = 8)
    val bins = packed.groupBy("bucket", "bin")
      .agg(sum("n_tokens").as("total"), max("n_tokens").as("biggest"),
        count(lit(1)).as("cnt"))
      .collect()
    assert(bins.nonEmpty)
    bins.foreach { r =>
      val (total, biggest) = (r.getLong(2), r.getLong(3))
      assert(total < budget + biggest,
        s"bin ${r.get(0)}/${r.get(1)}: total=$total biggest=$biggest budget=$budget")
    }
    // every document placed exactly once
    assert(packed.count() == 400)
  }

  test("layout is invariant to input partitioning") {
    val s = spark
    import s.implicits._
    val docs = (1L to 300L).map(i => (i, 1L + i % 40))
    val one = Packing.packByBudget(docs.toDF("id", "nt").coalesce(1),
        col("id"), col("nt"), 64, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val many = Packing.packByBudget(docs.toDF("id", "nt").repartition(13),
        col("id"), col("nt"), 64, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(one == many)
  }

  test("non-positive budget is rejected") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      Packing.packByBudget(Seq((1L, 2L)).toDF("id", "nt"), col("id"), col("nt"), 0)
    }
  }
}
