package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** KGroupedTable.aggregate(adder, subtractor) semantics: the incremental
  * streaming re-aggregation must equal a from-scratch batch replay under
  * upserts, deletes, and keys migrating between groups. */
object TableAggregateSpec {
  // standalone object: lambdas must not capture the (non-serializable) suite
  def grpOf(v: String): String = v.split('|')(0)
  def amtOf(v: String): Long = v.split('|')(1).toLong
}

class TableAggregateSpec extends SparkSpec {
  import TableAggregateSpec.{amtOf, grpOf}

  test("adder/subtractor re-aggregation under upserts, deletes, and group migration") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val feeds = Seq(
      Seq(Rec("u1", "a|10", 1, 1), Rec("u2", "a|5", 1, 2), Rec("u3", "b|7", 1, 3)),
      Seq(Rec("u1", "b|20", 2, 4)), // u1 migrates a → b: −10 from a, +20 to b
      Seq(Rec("u2", null, 3, 5)))   // tombstone: a retracts u2's 5

    // batch truth: the same operator over a one-shot replay
    val truth = TableAggregate.sumByGroup(
        KTableStream.changes(s.createDataset(feeds.flatten)), grpOf, amtOf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(truth == Map("a" -> (0L, 0L), "b" -> (27L, 2L)))

    // incremental: micro-batches; each update-mode emission overwrites its
    // group — the final state must equal the batch replay
    val in = MemoryStream[Rec]
    var state = Map.empty[String, (Long, Long)]
    val q = TableAggregate.sumByGroup(KTableStream.changes(in.toDS()), grpOf, amtOf)
      .writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          state += r.getString(0) -> (r.getLong(1), r.getLong(2))
        }
      }.start()
    try {
      feeds.foreach { f => in.addData(f: _*); q.processAllAvailable() }
      assert(state == truth)
    } finally q.stop()
  }

  test("randomized replay equivalence: incremental == batch on random tables") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val recs = (1 to 60).map { i =>
        val key = s"u${rnd.nextInt(8)}"
        val value =
          if (rnd.nextInt(5) == 0) null // tombstone
          else s"g${rnd.nextInt(3)}|${rnd.nextInt(100)}"
        Rec(key, value, i.toLong, i.toLong)
      }
      // INDEPENDENT truth — plain Scala fold, no Spark operator involved:
      // apply the recs in seq order to a map, then aggregate the survivors.
      // (Using the operator's own one-batch run as truth would let a
      // systematic adder/subtractor bug cancel out on both sides.)
      val finalTable = recs.sortBy(_.seq).foldLeft(Map.empty[String, String]) {
        case (m, r) => if (r.value == null) m - r.key else m + (r.key -> r.value)
      }
      val truth = finalTable.values.groupBy(grpOf)
        .map { case (g, vs) => g -> (vs.map(amtOf).sum, vs.size.toLong) }
      // groups whose keys all vanished keep a (0, 0) row in the operator's
      // running state — add them so the comparison is exact
      val touched = recs.flatMap(r => Option(r.value)).map(grpOf).toSet
      val expected = touched.map(g => g -> truth.getOrElse(g, (0L, 0L))).toMap

      val in = MemoryStream[Rec]
      var state = Map.empty[String, (Long, Long)]
      val q = TableAggregate.sumByGroup(KTableStream.changes(in.toDS()), grpOf, amtOf)
        .writeStream.outputMode("update")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.collect().foreach { r =>
            state += r.getString(0) -> (r.getLong(1), r.getLong(2))
          }
        }.start()
      try {
        recs.grouped(13).foreach { f => in.addData(f: _*); q.processAllAvailable() }
        assert(state == expected, s"seed $seed")
      } finally q.stop()
    }
  }
}
