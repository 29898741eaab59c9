package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Write-side bucketing: a join on the bucket key between two tables with
  * the same bucket count must plan WITHOUT any Exchange — the shuffle was
  * paid once at write time. */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed-bucketed equi join plans with no Exchange; rows match the plain join") {
    val s = spark
    val orders = graft.Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = graft.Tables.lineitem(s, dir)
      .select("l_orderkey", "l_quantity")

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4,
      sortBy = Seq("o_orderkey"))
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4, sortBy = Seq("o_orderkey"))
    try {
      // force the non-broadcast path: co-location is about the big-big case
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("b_orders").join(s.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)

      // sanity contrast: the same join on plain (unbucketed) frames shuffles
      val plain = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))

      // and the bucketed layout did not change the answer
      val a = joined.agg(count(lit(1)), sum("l_quantity")).head()
      val b = plain.agg(count(lit(1)), sum("l_quantity")).head()
      assert(a == b)
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    val s = spark
    Bucketing.writeBucketed(
      graft.Tables.orders(s, dir).select("o_orderkey", "o_totalprice"),
      "b_orders_agg", "o_orderkey", 4)
    try {
      val agg = s.table("b_orders_agg").groupBy("o_orderkey")
        .agg(sum("o_totalprice").as("t"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed groupBy still shuffles:\n$plan")
    } finally s.sql("DROP TABLE IF EXISTS b_orders_agg")
  }
}
