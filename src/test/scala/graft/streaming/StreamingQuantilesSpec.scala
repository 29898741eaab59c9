package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The t12 histogram-quantile shape ported to streaming: a running
  * (source, n_chars) count in update mode IS the quantile state — per-key
  * state is one long, bounded by distinct lengths per source, never by
  * rows. Quantile extraction reads the latest histogram emission, exactly
  * as a monitoring dashboard would; replaying the corpus must land on the
  * same type-1 quantiles as the batch operator. */
class StreamingQuantilesSpec extends SparkSpec {

  test("running length histogram replays to the batch t12 quantiles (sf0.001)") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext

    val dir = "/root/testdata/sf0.001"
    val rows = Tables.documents(s, dir)
      .select(col("source"), col("n_chars")).as[(String, Long)].collect()

    val in = MemoryStream[(String, Long)]
    val hist = in.toDF().toDF("source", "n_chars")
      .groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
    val q = hist.writeStream.format("memory").queryName("lenhist")
      .outputMode("update").start()
    try {
      rows.grouped(rows.length / 3 + 1).foreach { chunk =>
        in.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // latest count per (source, n_chars) = the final histogram; the
      // quantile state is histogram-sized, strictly below the row count
      val finalHist = s.table("lenhist")
        .groupBy("source", "n_chars").agg(max("c").as("c"))
        .as[(String, Long, Long)].collect()
      assert(finalHist.length < rows.length,
        s"histogram (${finalHist.length}) did not compress the corpus (${rows.length})")

      // read quantiles off the streamed histogram, plain Scala
      val streamedQ = finalHist.groupBy(_._1).flatMap { case (src, hs) =>
        val sorted = hs.sortBy(_._2)
        val n = sorted.map(_._3).sum
        Seq(0.25, 0.5, 0.75, 0.9).map { q =>
          val rank = math.ceil(n * q)
          val cums = sorted.scanLeft(0L)(_ + _._3).tail
          (src, q) -> sorted(cums.indexWhere(_ >= rank))._2
        }
      }.toMap

      val batch = graft.SparkEntry.queries("t12_length_quantiles")(s, dir)
        .as[(String, Double, Long)].collect()
        .map { case (src, qq, v) => (src, qq) -> v }.toMap
      assert(streamedQ == batch,
        s"stream/batch divergence: stream=$streamedQ batch=$batch")
    } finally q.stop()
  }
}
