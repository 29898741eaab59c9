package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Streaming decontamination: stream-static semi-join on shingle digests
  * against a static benchmark set; one verdict row per contaminated doc. */
class StreamDecontaminateSpec extends SparkSpec {

  private val base = 1700000000L
  private def ts(off: Long) = new Timestamp((base + off) * 1000)
  case class Doc(id: Long, text: String, ts: Timestamp)

  test("docs sharing an n-gram with the benchmark are flagged exactly once") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val in = MemoryStream[Doc]
    val q = StreamDecontaminate.contaminatedIds(
        in.toDF(), bench, "id", "text", "ts", "10 minutes", shingleN = 3)
      .writeStream.format("memory").queryName("sdecon").outputMode("append").start()
    try {
      in.addData(
        // two overlapping 3-grams ("quick brown fox", "brown fox jumps"):
        // must still emit ONE row
        Doc(1, "a quick brown fox jumps high", ts(0)),
        Doc(2, "nothing in common here", ts(1)),
        Doc(3, "over the lazy dog it went", ts(2)))
      q.processAllAvailable()
      val ids = s.table("sdecon").as[(Long, Timestamp)].collect().map(_._1).toList
      assert(ids.sorted == List(1L, 3L))
      assert(ids.count(_ == 1L) == 1) // multi-shingle match collapsed
    } finally q.stop()
  }

  test("streamed verdicts equal the batch decontaminate flags on the corpus (sf0.001)") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    import org.apache.spark.sql.functions.col

    val docs = graft.Tables.documents(s, "/root/testdata/sf0.001")
    val bench = docs.filter(col("doc_id") % 41 === 0)
    val corpusRows = docs.filter(col("doc_id") % 41 =!= 0)
      .select("doc_id", "text").as[(Long, String)].collect()

    val in = MemoryStream[Doc]
    val q = StreamDecontaminate.contaminatedIds(
        in.toDF().toDF("doc_id", "text", "ts"), bench,
        "doc_id", "text", "ts", "10 minutes", shingleN = 5)
      .writeStream.format("memory").queryName("sdecon3").outputMode("append").start()
    try {
      corpusRows.grouped(corpusRows.length / 3 + 1).zipWithIndex.foreach {
        case (chunk, i) =>
          in.addData(chunk.map { case (id, text) => Doc(id, text, ts(i * 60)) }.toSeq)
          q.processAllAvailable()
      }
      val streamed = s.table("sdecon3").select("doc_id").as[Long].collect().toSet
      val batch = graft.functions.DedupOps.decontaminate(
          docs.filter(col("doc_id") % 41 =!= 0), bench, "doc_id", "text", shingleN = 5)
        .filter(col("contaminated"))
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("clean stream emits nothing; token-less docs do not crash the probe") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val bench = Seq((100L, "x y z w v")).toDF("id", "text")
    val in = MemoryStream[Doc]
    val q = StreamDecontaminate.contaminatedIds(
        in.toDF(), bench, "id", "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("sdecon2").outputMode("append").start()
    try {
      in.addData(Doc(1, "all clear", ts(0)), Doc(2, "", ts(1)))
      q.processAllAvailable()
      assert(s.table("sdecon2").count() == 0)
    } finally q.stop()
  }
}
