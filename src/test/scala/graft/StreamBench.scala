package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.file.Files

/** One replayed document row (top-level: Spark's codegen needs an
  * outer-free constructor for the product encoder). */
case class StreamBenchDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

/** One replayed image row (binary BMP bytes). */
case class StreamBenchImg(doc_id: Long, content: Array[Byte],
                          ets: java.sql.Timestamp)

/** One replayed embedding row. */
case class StreamBenchVec(vec_id: Long, embedding: Seq[Float],
                          ets: java.sql.Timestamp)

/** Streaming throughput harness (not part of the library surface):
  * replays the sf events table through three representative streaming
  * operators in fixed-size micro-batches and reports rows/s plus final
  * state size — the measured numbers SCALE.md quotes next to the batch
  * sf-curves. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.StreamBench"
  *
  * Method: MemoryStream input (the spec harness), chunked adds, wall
  * time from first add to last processAllAvailable; state rows from the
  * final progress event. Min-of-1 by design — streaming runs amortize
  * their own warmup (10+ micro-batches each), and the number of
  * interest is sustained rows/s, not cold-start. */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val chunk = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNK", "10000").toInt
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sql = spark.sqlContext

    def stateRows(q: StreamingQuery): Long = {
      val p = q.lastProgress
      if (p == null || p.stateOperators == null) -1L
      else p.stateOperators.map(_.numRowsTotal).sum
    }

    def run[T](name: String, rows: Seq[T])
              (start: MemoryStream[T] => StreamingQuery)
              (implicit enc: org.apache.spark.sql.Encoder[T]): Unit = {
      val in = MemoryStream[T]
      val q = start(in)
      val t0 = System.nanoTime()
      rows.grouped(chunk).foreach { b => in.addData(b); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      val st = stateRows(q)
      q.stop()
      println(f"""{"stream":"$name","rows":${rows.size},"sec":$sec%.3f,""" +
        f""""rows_per_sec":${(rows.size / sec).toLong},"micro_batches":${
          (rows.size + chunk - 1) / chunk},"state_rows":$st}""")
    }

    // shared input: the events table, ordered by time (arrival ~ event
    // order, the realistic replay), collected once
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts_sec"),
        col("event_type"), col("value"), col("props"))
      .orderBy("ts_sec", "event_id")
      .collect()

    // 1. daily-cell maintainer: update-mode agg + absolute-value upsert
    run[(String, Long, Long)]("daily_cells",
      ev.toSeq.map(r => (r.getString(3), r.getLong(2),
        math.round(r.getDouble(4) * 1000)))) { in =>
      val dir = Files.createTempDirectory("sb_cells").toString
      streaming.StreamDailyCells.start(
        in.toDS().toDF("g", "ts_sec", "milli"),
        dir + "/table", dir + "/ckpt")
    }

    // 2. exact dedup at ingest: fingerprint + dropDuplicatesWithinWatermark
    //    (props as the document text: realistic near-unique payloads)
    run[StreamBenchDoc]("dedup_fingerprint",
      ev.toSeq.map(r => StreamBenchDoc(r.getLong(0), r.getString(5),
        new java.sql.Timestamp(r.getLong(2) * 1000)))) { in =>
      streaming.StreamDedup
        .firstPerFingerprint(in.toDS().toDF(), "text", "ts", "1 hour")
        .writeStream.format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("sb_dedup").toString)
        .outputMode("append").start()
    }

    // 3. transformWithState top-k: per-user totals + global leaderboard
    // (RocksDB provider scoped to this query only — transformWithState
    // needs column families; the agg queries above run the default
    // HDFS-backed store, and a global RocksDB setting makes them fight
    // over instance locks under processAllAvailable)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    run[streaming.StreamTopK.UserEvent]("topk_leaderboard",
      ev.toSeq.map(r => streaming.StreamTopK.UserEvent(
        r.getLong(1), r.getLong(0), r.getLong(2), r.getDouble(4)))) { in =>
      streaming.StreamTopK.topK(in.toDS(), k = 10)
        .writeStream.format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("sb_topk").toString)
        .outputMode("append").start()
    }

    // 4. streaming image near-dup: map-side decode + pHash, banded
    //    bucket state (10,000 synthetic BMPs, m5 corpus shape: 5,000
    //    brightness-rescaled pairs — every row decodes a real image)
    run[StreamBenchImg]("image_neardup",
      (0L until 10000L).map { id =>
        val (amp, base) = if (id % 2 == 0) (4, 128) else (3, 140)
        StreamBenchImg(id,
          graft.multimodal.SyntheticMedia.bmpPatternBytes(id / 2, amp, base),
          new java.sql.Timestamp((1700000000L + id) * 1000))
      }) { in =>
      streaming.StreamImageNearDup
        .pairs(in.toDF(), "doc_id", "content", "ets", "1 hour", maxDist = 0)
        .writeStream.format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("sb_imgdup").toString)
        .outputMode("append").start()
    }

    // 5. streaming embedding near-dup: map-side SRP signature + banded
    //    bucket state with exact cosine verification (the sf embeddings
    //    table replayed; every row computes a 16-bit SRP over 64 dims)
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
    run[StreamBenchVec]("embedding_neardup",
      emb.toSeq.zipWithIndex.map { case (r, i) =>
        StreamBenchVec(r.getLong(0), r.getSeq[Float](1),
          new java.sql.Timestamp((1700000000L + i) * 1000))
      }) { in =>
      streaming.StreamEmbeddingNearDup
        .pairs(in.toDF(), "vec_id", "embedding", "ets", "1 hour",
          threshold = 0.9)
        .writeStream.format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("sb_vecdup").toString)
        .outputMode("append").start()
    }

    spark.stop()
  }
}
