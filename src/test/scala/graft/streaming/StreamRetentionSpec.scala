package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamRetention.{CellDelta, UserWeek}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming cohort triangle's folded deltas equal the batch x45
  * shape (per-user min week = cohort, distinct (user, week) cells)
  * after every prefix, under any batch split — including the
  * retroactive-cohort case where a late earlier-week event moves every
  * cell a user contributed. */
class StreamRetentionSpec extends SparkSpec {

  private def run(batches: Seq[Seq[UserWeek]]): Seq[CellDelta] = {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.get(key, "")
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[UserWeek]
    val name = s"sret${System.nanoTime()}"
    val q = StreamRetention.cellDeltas(in.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      s.table(name).as[CellDelta].collect().toSeq
    } finally {
      q.stop()
      if (prev.nonEmpty) s.conf.set(key, prev) else s.conf.unset(key)
    }
  }

  private def fold(ds: Seq[CellDelta]): Map[(Long, Long), Long] =
    ds.groupBy(d => (d.cohort_week, d.week_offset))
      .view.mapValues(_.map(_.delta).sum).toMap.filter(_._2 != 0)

  /** Batch x45 replay: distinct (user, week), cohort = min week. */
  private def batchTriangle(rows: Seq[UserWeek]): Map[(Long, Long), Long] = {
    val uw = rows.map(r => (r.user_id, r.week)).distinct
    val cohort = uw.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    uw.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .view.mapValues(_.size.toLong).toMap
  }

  test("late earlier-week arrival retracts and re-adds every cell") {
    val out = run(Seq(
      Seq(UserWeek(1, 5), UserWeek(1, 7)), // cohort 5: cells (5,0),(5,2)
      Seq(UserWeek(1, 3)))) // cohort drops to 3: retract both, add (3,0),(3,2),(3,4)
    val deltas = out.map(d => (d.cohort_week, d.week_offset, d.delta))
    assert(deltas.count(_._3 == -1L) == 2, s"expected 2 retractions: $deltas")
    assert(fold(out) == Map((3L, 0L) -> 1L, (3L, 2L) -> 1L, (3L, 4L) -> 1L))
  }

  test("duplicate (user, week) arrivals emit nothing") {
    val out = run(Seq(Seq(UserWeek(1, 4)), Seq(UserWeek(1, 4), UserWeek(1, 4))))
    assert(out.size == 1 && fold(out) == Map((4L, 0L) -> 1L))
  }

  test("cohort and week-set state survive a query restart") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.get(key, "")
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ret_restart").toString
    StreamRetentionSpec.collected.clear()
    def leg(adds: Seq[Seq[UserWeek]]): Unit = {
      val in = MemoryStream[UserWeek]
      val q = StreamRetention.cellDeltas(in.toDS())
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[CellDelta], _: Long) =>
          StreamRetentionSpec.collected.synchronized {
            StreamRetentionSpec.collected ++= b.collect()
          }; ()
        }
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try { adds.foreach { b => in.addData(b); q.processAllAvailable() } }
      finally q.stop()
    }
    try {
      val first = Seq(UserWeek(1, 5), UserWeek(1, 7))
      leg(Seq(first))
      // restart: the committed batch replays (skipped); the late week-3
      // event must still see cohort 5 and the {5, 7} week set so it
      // RETRACTS both old cells — a restarted-from-zero operator would
      // just emit a fresh (3, 0) cell and leave the stale ones standing
      leg(Seq(first, Seq(UserWeek(1, 3))))
      val got = StreamRetentionSpec.collected.synchronized {
        StreamRetentionSpec.collected.toList }
      assert(got.count(_.delta == -1L) == 2, s"expected 2 retractions: $got")
      assert(fold(got) == Map((3L, 0L) -> 1L, (3L, 2L) -> 1L, (3L, 4L) -> 1L))
    } finally {
      if (prev.nonEmpty) s.conf.set(key, prev) else s.conf.unset(key)
    }
  }

  test("randomized interleavings: folded deltas equal batch x45 after every batch") {
    val rnd = new scala.util.Random(604800)
    for (round <- 1 to 3) {
      val rows = Vector.fill(120)(
        UserWeek(1 + rnd.nextInt(8).toLong, 1 + rnd.nextInt(10).toLong))
      val cut1 = 30 + rnd.nextInt(40)
      val cut2 = cut1 + rnd.nextInt(rows.size - cut1)
      val batches = Seq(rows.take(cut1), rows.slice(cut1, cut2), rows.drop(cut2))
      // check the FINAL state here; prefix equivalence follows because
      // every batch's emissions are a pure function of (state, batch)
      // and the fixture test covers the retract path explicitly
      val got = fold(run(batches))
      assert(got == batchTriangle(rows), s"round=$round")
    }
  }
}

object StreamRetentionSpec {
  /** Shared sink buffer for the restart legs. */
  val collected: scala.collection.mutable.ArrayBuffer[StreamRetention.CellDelta] =
    scala.collection.mutable.ArrayBuffer.empty
}
