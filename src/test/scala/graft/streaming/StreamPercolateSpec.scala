package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamPercolate.Alert
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** [[StreamPercolate]]: stream alerts equal the batch replay over the
  * same records, multi-batch arrival changes nothing, tombstones and
  * non-matching documents stay silent. */
class StreamPercolateSpec extends SparkSpec {

  private val queries = Seq(
    ("alert-hashjoin", Seq("hash", "join")),
    ("alert-merge", Seq("merge")),
    ("alert-impossible", Seq("hash", "zzzmissing")))

  test("stream alerts ≡ batch replay across micro-batches; tombstones silent") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val recs = Seq(
      Rec("d1", "hash join hash", 1000L, 1),
      Rec("d2", "merge sort", 2000L, 2),
      Rec("d3", "scan filter", 3000L, 3),      // matches nothing
      Rec("d4", null, 4000L, 4),               // tombstone: silent
      Rec("d5", "join hash merge", 5000L, 5))  // matches two queries
    val in = MemoryStream[Rec]
    val name = s"sperc${System.nanoTime()}"
    val q = StreamPercolate.alerts(in.toDS(), queries)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(recs.take(2)); q.processAllAvailable()
      in.addData(recs.drop(2)); q.processAllAvailable()
      val got = s.table(name).as[Alert].collect().toSet
      val want = StreamPercolate.alertsBatch(recs.toDF(), queries)
        .as[(String, String, Long)].collect()
        .map(t => Alert(t._1, t._2, t._3)).toSet
      assert(got == want)
      assert(got == Set(
        Alert("alert-hashjoin", "d1", 1000L),
        Alert("alert-merge", "d2", 2000L),
        Alert("alert-hashjoin", "d5", 5000L),
        Alert("alert-merge", "d5", 5000L)))
      assert(!got.exists(_.query_id == "alert-impossible"))
    } finally q.stop()
  }
}
