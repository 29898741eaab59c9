package graft.streaming

import graft.SparkSpec
import graft.functions.{Aggregators, ScoredHit}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous top-k leaderboard: the bounded [[Aggregators.topK]] UDAF in
  * a streaming aggregation (update mode). The same map-side-partial
  * contract that makes it scale in batch bounds streaming state to k
  * entries per group — the leaderboard never stores the score history. */
class StreamingTopKSpec extends SparkSpec {

  test("update-mode leaderboard keeps the running top-3 per region") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val topk = udaf(Aggregators.topK(3), Encoders.product[ScoredHit])
    val in = MemoryStream[(String, Long, Double)] // (region, player, score)
    val board = in.toDF().toDF("region", "player", "score")
      .groupBy("region")
      .agg(topk(col("score"), col("player")).as("tk"))
      .select(col("region"), posexplode(col("tk.hits")))
      .select(col("region"), (col("pos") + 1).cast("long").as("rank"),
        col("col.neighbor_id").as("player"), col("col.sim").as("score"))
    val q = board.writeStream.format("memory").queryName("board")
      .outputMode("update").start()
    try {
      in.addData(("eu", 1L, 10.0), ("eu", 2L, 30.0), ("us", 9L, 5.0))
      q.processAllAvailable()
      in.addData(("eu", 3L, 20.0), ("eu", 4L, 40.0), ("eu", 5L, 1.0))
      q.processAllAvailable()
      val emitted = s.table("board").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      // final eu leaderboard (scores 10,30,20,40,1 → players 4, 2, 3)
      assert(Set(("eu", 1L, 4L, 40.0), ("eu", 2L, 2L, 30.0), ("eu", 3L, 3L, 20.0))
        .subsetOf(emitted))
      // batch-1 interim leader was re-emitted earlier (update-mode changelog)
      assert(emitted.contains(("eu", 1L, 2L, 30.0)))
      // us never changed after batch 1 and player 5 (score 1) never ranked
      assert(emitted.contains(("us", 1L, 9L, 5.0)))
      assert(!emitted.exists(e => e._1 == "eu" && e._3 == 5L))
    } finally q.stop()
  }
}
