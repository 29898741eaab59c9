package graft.streaming

import graft.SparkSpec
import graft.functions.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The reference's WordCount / LineSplit / Pipe topologies as streams
  * (fixture 11; `WordCount.java:53-58`, `LineSplit.java:48`, `Pipe.java:44`). */
class WordCountStreamSpec extends SparkSpec {

  test("streaming wordcount: running per-word counts in update mode") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[String]
    val counts = in.toDF().select(
        explode(TextAnalysis.tokens(col("value"))).as("word"))
      .groupBy("word").count()
    val q = counts.writeStream.format("memory").queryName("wc").outputMode("update").start()
    try {
      in.addData("Hello Kafka Streams")
      q.processAllAvailable()
      in.addData("hello spark streams")
      q.processAllAvailable()
      val finalCounts = s.table("wc")
        .groupBy("word").agg(max("count").as("cnt"))
        .as[(String, Long)].collect().toMap
      assert(finalCounts == Map(
        "hello" -> 2L, "kafka" -> 1L, "streams" -> 2L, "spark" -> 1L))
      // update mode emitted the intermediate hello=1 before hello=2
      val helloEmissions = s.table("wc").filter(col("word") === "hello")
        .select("count").as[Long].collect().sorted.toList
      assert(helloEmissions == List(1L, 2L), "continuous changelog emission per batch")
    } finally q.stop()
  }

  test("identity pipe and line split are stateless pass-throughs") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val in = MemoryStream[String]
    val q = in.toDF().select(explode(split(col("value"), "\\W+")).as("word"))
      .filter(col("word") =!= "")
      .writeStream.format("memory").queryName("linesplit").outputMode("append").start()
    try {
      in.addData("all streams lead to kafka")
      q.processAllAvailable()
      assert(s.table("linesplit").as[String].collect().toList ==
        List("all", "streams", "lead", "to", "kafka"))
    } finally q.stop()
  }
}
