package graft.streaming

import graft.SparkSpec
import graft.functions.{Aggregators, KeyedHit}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The KMV buffer as STREAMING state: a continuous distinct-count sketch
  * per group whose state is k digests per group — never the value set.
  * Duplicates across micro-batches must not grow the buffer (set
  * semantics survive the state-store round trip). */
class StreamingKmvSpec extends SparkSpec {

  test("running distinct sketch per group across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val k = 32
    val pick = udaf(Aggregators.topKByKey(k), Encoders.product[KeyedHit])
    val in = MemoryStream[(String, Long)] // (group, user)
    val sketch = in.toDF().toDF("grp", "user")
      .groupBy("grp")
      .agg(pick(md5(col("user").cast("string")), lit(0L)).as("tk"))
      .select(col("grp"), size(col("tk.hits")).as("n_distinct"))
    val q = sketch.writeStream.format("memory").queryName("kmv")
      .outputMode("update").start()
    try {
      in.addData((1L to 10L).map(u => ("a", u)): _*)
      q.processAllAvailable()
      in.addData((6L to 15L).map(u => ("a", u)): _*)  // 5 overlap, 5 new
      in.addData(Seq(("b", 1L), ("b", 1L), ("b", 2L)): _*)
      q.processAllAvailable()
      // below k the sketch is exact: a saw 15 distinct users (5 of batch 2
      // were duplicates and must not inflate the buffer), b deduped to 2 —
      // and batch 1's interim a=10 emission proves continuous updates
      val emissions = s.table("kmv").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSet
      assert(emissions.contains(("a", 10)))
      assert(emissions.contains(("a", 15)))
      assert(emissions.contains(("b", 2)))
    } finally q.stop()
  }
}
