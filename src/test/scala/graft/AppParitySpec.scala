package graft

import graft.state.{StateHttpServer, StateQueries}
import graft.streaming.{ChangelogSink, Rec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.net.{HttpURLConnection, URI}
import java.nio.file.Files
import scala.io.Source

/** End-to-end parity with the reference's flagship app composition:
  * WordCount (`WordCount.java:53-58` — source → flatMap → groupBy →
  * count, materialized as "counts-store") with its Interactive-Queries
  * face (`IQueriesService.java:78-109` point lookup over the store) and
  * a materialized output table (the `.to(topic)` sink as a queryable
  * view). One spec, the whole pipe: edge serde → stateful agg →
  * changelog → state query + HTTP + sink. */
class AppParitySpec extends SparkSpec {

  private def get(port: Int, path: String): (Int, String) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = if (is == null) "" else Source.fromInputStream(is, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  test("WordCount app: source → count changelog → counts-store HTTP + materialized sink") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val ckpt = Files.createTempDirectory("graft_app_ckpt").toString
    val sinkCkpt = Files.createTempDirectory("graft_app_sink_ckpt").toString
    val table = Files.createTempDirectory("graft_app_table").toString + "/counts"

    // Two queries must NOT share one MemoryStream: its commit() truncates
    // the shared batch buffer, so the slower query can read empty batches.
    // Feed two streams the same records (two consumer groups of one topic).
    val in1 = MemoryStream[Rec]
    val in2 = MemoryStream[Rec]
    // the reference topology: flatMapValues(split) → groupBy(word) → count
    def counts(ds: org.apache.spark.sql.Dataset[Rec]) = ds.toDF()
      .select(explode(graft.expressions.AsciiWordTokens.tokens(col("value"))).as("word"),
        col("seq"))
      .groupBy("word")
      .agg(count(lit(1)).as("count"), max("seq").as("seq"))
    // "counts-store": the update-mode changelog checkpointed for state reads
    val q = counts(in1.toDS()).select(col("word"), col("count"))
      .writeStream.format("memory").queryName("counts_app")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    // the .to(topic) sink as a materialized table (word → latest count)
    val sink = ChangelogSink.start(
      counts(in2.toDS())
        .select(col("word").as("key"), col("count").cast("string").as("value"),
          col("seq"))
        .as[(String, String, Long)].map { case (k, v, seq) =>
          graft.streaming.Change(k, v, null, seq)
        },
      table, sinkCkpt, outputMode = "update")
    try {
      val feed = Seq(
        Rec("k1", "Hello Kafka Streams", 0, 1),
        Rec("k2", "All streams lead to Kafka", 0, 2),
        Rec("k3", "Join Kafka Summit", 0, 3))
      in1.addData(feed)
      in2.addData(feed)
      q.processAllAvailable()
      sink.processAllAvailable()

      // interactive query over the store (reference point lookup shape)
      val st = StateQueries.flattened(s, ckpt)
        .select(col("key_word").as("word"), col("value_count").as("cnt"))
      val kafka = StateQueries.point(st, col("word") === "kafka")
        .as[(String, Long)].collect().toList
      assert(kafka == List(("kafka", 3L)))

      // same lookup through the HTTP facade
      val srv = new StateHttpServer(s)
        .registerView("counts-store", () => st, keyCol = "word")
      val port = srv.start()
      try {
        val (c, b) = get(port, "/state/keyvalue/counts-store/kafka")
        assert(c == 200 && b == """[{"word":"kafka","cnt":3}]""")
      } finally srv.stop()

      // the sink table holds the same final counts
      val sinkRows = s.read.parquet(table)
        .select(col("key"), col("value").cast("long").as("cnt"))
        .as[(String, Long)].collect().toMap
      assert(sinkRows("kafka") == 3L && sinkRows("streams") == 2L && sinkRows("hello") == 1L)
    } finally { q.stop(); sink.stop() }
  }
}
