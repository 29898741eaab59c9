package graft.kafka

import graft.GraftSession
import graft.streaming.KafkaEdges
import org.apache.spark.sql.functions._

/** Throughput probe for the wire-protocol Kafka edge (not a test — run
  * via `Test/runMain graft.kafka.KafkaScratch [nRecords]`). Measures:
  *   1. raw client produce over the socket (records/s),
  *   2. Spark `graft-kafka` streaming read → memory sink (records/s),
  *   3. Spark streaming read → `graft-kafka` sink produce (records/s).
  * Numbers land in SCALE.md. */
object KafkaScratch {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val broker = new MiniBroker(numPartitions = 4)
    val client = new MiniKafkaClient("localhost", broker.port)
    try {
      // 1. raw wire produce, 1k-record batches
      val payload = ("x" * 100).getBytes("UTF-8")
      val t0 = System.nanoTime()
      (0 until n).grouped(1000).foreach { batch =>
        client.produce("in", batch.head % 4, batch.map(i =>
          Wire.WireRecord(0L, i.toLong, s"k$i".getBytes("UTF-8"), payload)).toSeq)
      }
      val produceSec = (System.nanoTime() - t0) / 1e9
      println(f"KAFKA_SCRATCH produce     $n%8d rec ${produceSec}%7.2f s ${n / produceSec}%10.0f rec/s")

      // 1b. same batches gzip-wrapped (compression.type=gzip shape):
      // CPU cost of the wrapper vs bytes saved on the wire. Sizes are
      // measured in an untimed pre-pass so the timed loop does exactly
      // what a compressing producer does: encode-gzip-send
      val sizeProbe = (0 until 1000).map(i =>
        Wire.WireRecord(0L, i.toLong, s"k$i".getBytes("UTF-8"), payload))
      val rawBytes = Wire.encodeMessageSet(sizeProbe).length
      val gzBytes = Wire.encodeMessageSetGzip(sizeProbe).length
      val tg = System.nanoTime()
      (0 until n).grouped(1000).foreach { batch =>
        client.produce("ingz", batch.head % 4, batch.map(i =>
          Wire.WireRecord(0L, i.toLong, s"k$i".getBytes("UTF-8"), payload)).toSeq,
          gzip = true)
      }
      val gzSec = (System.nanoTime() - tg) / 1e9
      println(f"KAFKA_SCRATCH produce/gz  $n%8d rec ${gzSec}%7.2f s ${n / gzSec}%10.0f rec/s " +
        f"wire ${gzBytes * 100.0 / rawBytes}%5.1f%% of plain")

      // 2. streaming read → memory sink
      val t1 = System.nanoTime()
      val src = KafkaEdges.source(spark, broker.bootstrapServers, "in",
        format = "graft-kafka")
      val q = src.writeStream.format("memory").queryName("kb_read")
        .outputMode("append").start()
      q.processAllAvailable()
      val readSec = (System.nanoTime() - t1) / 1e9
      val got = spark.table("kb_read").count()
      q.stop()
      println(f"KAFKA_SCRATCH read        $got%8d rec ${readSec}%7.2f s ${got / readSec}%10.0f rec/s")

      // 3. streaming read → graft-kafka sink (full produce path)
      val t2 = System.nanoTime()
      val src2 = KafkaEdges.source(spark, broker.bootstrapServers, "in",
        format = "graft-kafka")
      val q2 = KafkaEdges.sink(src2, broker.bootstrapServers, "out",
          java.nio.file.Files.createTempDirectory("kb").toString,
          format = "graft-kafka")
        .outputMode("append").start()
      q2.processAllAvailable()
      val sinkSec = (System.nanoTime() - t2) / 1e9
      q2.stop()
      val outCount = (0 until 4).map(p =>
        client.offsetFor("out", p, latest = true)).sum
      println(f"KAFKA_SCRATCH read+sink   $outCount%8d rec ${sinkSec}%7.2f s ${outCount / sinkSec}%10.0f rec/s")
    } finally {
      client.close()
      broker.close()
      spark.stop()
    }
  }
}
