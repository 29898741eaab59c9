package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.dsl._

/** The reference topologies written against the facade, near-verbatim. */
class DslSpec extends SparkSpec {

  test("square-pipe topology (TopologiesTest.scala:26-47): mapValues v*v") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[Rec]
    val q = in.toDS()
      .mapValues(v => (v.toInt * v.toInt).toString)
      .writeStream.format("memory").queryName("dsl_square").outputMode("append").start()
    try {
      in.addData(Rec("hmida", "1", 0, 1), Rec("lamba", "2", 0, 2))
      q.processAllAvailable()
      val out = s.table("dsl_square").as[Rec].collect().sortBy(_.seq).map(_.value).toList
      assert(out == List("1", "4"))
    } finally q.stop()
  }

  test("wordcount shape: flatMapValues split + selectKey + toTable") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[Rec]
    val q = in.toDS()
      .flatMapValues(line => line.toLowerCase(java.util.Locale.ROOT).split("\\W+").toSeq.filter(_.nonEmpty))
      .selectKey((_, word) => word)
      .filterNotNullKeys
      .toTable
      .writeStream.format("memory").queryName("dsl_wc").outputMode("append").start()
    try {
      in.addData(Rec("l1", "Hello hello Spark", 0, 1))
      q.processAllAvailable()
      val keys = s.table("dsl_wc").as[Change].collect().map(_.key).sorted.toList
      assert(keys == List("hello", "hello", "spark"))
    } finally q.stop()
  }

  test("FK join through the facade matches the direct operator") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val left = MemoryStream[Rec]
    val right = MemoryStream[Rec]
    val fkOf: String => String = v => { val f = v.split('|')(0); if (f.isEmpty) null else f }
    val q = left.toDS().fkJoin(right.toDS(), fkOf, "left")
      .writeStream.format("memory").queryName("dsl_fk").outputMode("append").start()
    try {
      left.addData(Rec("3 bands", "adidas|3 bands", 0, 1))
      right.addData(Rec("adidas", "3", 0, 2))
      q.processAllAvailable()
      val out = s.table("dsl_fk").as[FkJoinChange].collect().sortBy(_.seq).toList
      assert(out == List(
        FkJoinChange("3 bands", "adidas|3 bands", null, deleted = false, 1),
        FkJoinChange("3 bands", "adidas|3 bands", "3", deleted = false, 2)))
    } finally q.stop()
  }

  test("cogroup capability (KeyValueGroupedDataset.cogroup, batch)") {
    val s = spark
    import s.implicits._
    val a = Seq(Rec("k1", "a1", 0, 1), Rec("k2", "a2", 0, 2)).toDS().groupByKey(_.key)
    val b = Seq(Rec("k1", "b1", 0, 3)).toDS().groupByKey(_.key)
    val merged = a.cogroup(b) { (k, as, bs) =>
      Iterator(k -> (as.map(_.value).toList ++ bs.map(_.value).toList).sorted)
    }.collect().toMap
    assert(merged == Map("k1" -> List("a1", "b1"), "k2" -> List("a2")))
  }
}
