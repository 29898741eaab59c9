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
