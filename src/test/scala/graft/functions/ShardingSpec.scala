package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rendezvous sharding: the movement-minimality THEOREM (adding a shard
  * can only move a key TO the new shard), plus load balance and the
  * pure-projection plan shape. */
class ShardingSpec extends SparkSpec {

  private lazy val assigned = {
    val s = spark
    import s.implicits._
    (0L until 5000L).toDF("k")
      .select(col("k"),
        Sharding.hrwShard(col("k"), 8).as("s8"),
        Sharding.hrwShard(col("k"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("every moved key lands on the NEW shard — movement minimality") {
    val moved = assigned.filter { case (_, s8, s9) => s8 != s9 }
    assert(moved.nonEmpty)
    assert(moved.forall(_._3 == 8L),
      "a survivor shard won a key it did not already own")
  }

  test("moved fraction concentrates near 1/9, survivors keep their keys") {
    val frac = assigned.count { case (_, s8, s9) => s8 != s9 }.toDouble / 5000
    assert(frac > 1.0 / 9 - 0.02 && frac < 1.0 / 9 + 0.02, s"moved $frac")
  }

  test("loads balance: every shard within 30% of the uniform share") {
    val loads = assigned.groupBy(_._2).view.mapValues(_.length)
    assert(loads.size == 8)
    val uniform = 5000.0 / 8
    assert(loads.values.forall(n => n > uniform * 0.7 && n < uniform * 1.3),
      loads.toMap.toString)
  }

  test("assignment is a pure projection — no exchange in the plan") {
    val s = spark
    import s.implicits._
    val plan = (0L until 10L).toDF("k")
      .select(Sharding.hrwShard(col("k"), 8).as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
