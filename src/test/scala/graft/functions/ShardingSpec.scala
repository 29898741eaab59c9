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

  private lazy val ring = {
    val s = spark
    import s.implicits._
    Sharding.ringGrowth((0L until 5000L).toDF("k"), "k", 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("ring: every moved key lands on the NEW shard's vnodes") {
    val moved = ring.filter { case (_, s8, s9) => s8 != s9 }
    assert(moved.nonEmpty)
    assert(moved.forall(_._3 == 8L))
  }

  test("ring: successor rule replayed directly in scala agrees") {
    // independent replay of the wrap-around successor over md5 positions
    def h(x: String): Long =
      java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
        .take(15), 16)
    val vn = for (s <- 0 until 9; v <- 0 until 4) yield (s.toLong, h(s"$s:$v"))
    def assign(kpos: Long, n: Int): Long = {
      val cand = vn.filter(_._1 < n)
      cand.filter(_._2 >= kpos).sortBy(c => (c._2, c._1)).headOption
        .getOrElse(cand.minBy(c => (c._2, c._1)))._1
    }
    ring.take(500).foreach { case (k, s8, s9) =>
      val kpos = h(k.toString)
      assert(assign(kpos, 8) == s8 && assign(kpos, 9) == s9, s"key $k")
    }
  }

  test("ring: all shards populated; balance rougher than HRW as documented") {
    val loads = ring.groupBy(_._2).view.mapValues(_.length)
    assert(loads.size == 8)
    assert(loads.values.forall(_ > 0))
  }
}
