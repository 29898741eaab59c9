package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Salted skew treatments must be result-identical to the direct forms —
  * checked on the harness tables, where user_id/event_type give real
  * repeated keys. */
class SkewSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("saltedDistinctCount equals direct countDistinct") {
    val e = Tables.events(spark, dir)
    val direct = e.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinctCount(e, Seq("event_type"), "user_id", 8, "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("saltedDistinctCount matches count(DISTINCT) NULL semantics, incl. all-NULL groups") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", Some(1)), ("a", Some(1)), ("a", Some(2)), ("a", None), // nulls not counted
      ("b", None), ("b", None)                                     // all-NULL group → 0 row
    ).toDF("k", "v")
    val direct = df.groupBy("k").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinctCount(df, Seq("k"), "v", 4, "n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct == Map("a" -> 2L, "b" -> 0L))
    assert(salted == direct)
  }

  test("AQE splits a genuinely skewed sort-merge join at runtime") {
    // The t6/x9 scale notes lean on AQE's skew-join split as the
    // runtime backstop for hot keys; this pins that the mechanism
    // actually FIRES (OptimizeSkewedJoin marks the join skew=true /
    // AQEShuffleRead reports skewed splits) rather than existing only
    // in comments. Thresholds are shrunk so a ~99%-one-key join
    // qualifies at spec scale; configs are restored afterwards.
    val conf = spark.conf
    val wanted = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = wanted.keys.map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    wanted.foreach { case (k, v) => conf.set(k, v) }
    try {
      val pad = "x" * 64
      val left = spark.range(0, 100000).select(
        when(col("id") % 100 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        concat(lit(pad), col("id")).as("payload"))
      val right = spark.range(0, 1000).select(col("id").as("k2"),
        concat(lit(pad), col("id")).as("rpay"))
      val j = left.join(right, col("k") === col("k2"))
      // collect() (not count()) — count() wraps j in a NEW aggregate
      // QueryExecution, leaving j's own adaptive plan unfinalized
      // 99,000 hot-key rows + the 10 sub-1000 multiples of 100
      assert(j.collect().length === 99010)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"), plan)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("saltedJoin equals plain join (inner, with a genuinely hot key)") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey", "l_quantity")
    val part = Tables.part(spark, dir).select(col("p_partkey"), col("p_name"))
    val direct = li.join(part, li("l_partkey") === part("p_partkey"))
      .groupBy("p_name").agg(round(sum("l_quantity"), 2).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedJoin(li, part, "l_partkey", "p_partkey", 4)
      .groupBy("p_name").agg(round(sum("l_quantity"), 2).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == direct)
  }
}
