package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Count-Min properties beyond the oracle: the mergeable-summary law
  * (cell addition of shard sketches = whole-corpus sketch), the ≥
  * guarantee over EVERY value (not just the probed top-k), and the
  * streaming twin (an update-mode aggregation over the same cell keys
  * converges to the batch counters). */
class CountMinSpec extends SparkSpec {

  private def words(n: Int, seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    // Zipf-ish: small vocabulary with heavy repeats
    Seq.fill(n)(s"w${(math.sqrt(rnd.nextInt(400)).toInt)}")
  }

  test("shard sketches merge by cell addition into the whole-corpus sketch") {
    val s = spark
    import s.implicits._
    val all = words(600, 7)
    val (shardA, shardB) = all.splitAt(250)
    def cms(ws: Seq[String]) =
      Sketches.cmsCounters(ws.toDF("w"), "w", depth = 4, width = 32)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = cms(all)
    val merged = (cms(shardA).toSeq ++ cms(shardB).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(merged == whole)
  }

  test("the estimate dominates the true count for EVERY value") {
    val s = spark
    import s.implicits._
    val df = words(800, 11).toDF("w")
    val exact = df.groupBy("w").agg(count(lit(1)).as("tc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.cmsEstimates(df, "w", depth = 4, width = 32,
        topN = exact.size)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(est.keySet == exact.keySet)
    for ((w, (tc, e)) <- est) {
      assert(tc == exact(w), w)
      assert(e >= tc, s"$w: estimate $e below true $tc")
    }
  }

  test("streaming update-mode counters converge to the batch sketch") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val all = words(500, 13)
    val in = MemoryStream[String]
    val name = s"cms${System.nanoTime()}"
    val q = Sketches.cmsCounters(in.toDF().withColumnRenamed("value", "w"),
        "w", depth = 4, width = 32)
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      all.grouped(180).foreach { b => in.addData(b); q.processAllAvailable() }
      val got = s.table(name)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = Sketches.cmsCounters(all.toDF("w"), "w", depth = 4, width = 32)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want)
    } finally q.stop()
  }
}
