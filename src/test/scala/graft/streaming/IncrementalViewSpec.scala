package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

/** [[IncrementalView]]: delta-maintained (group, n_keys, total) view of
  * a KTable change feed must EQUAL a from-scratch recompute of the
  * table's live rows after every micro-batch — through upserts,
  * overwrites, and deletes — and batch redelivery must be a no-op. */
class IncrementalViewSpec extends SparkSpec {

  // top-level object members: the operator ships these functions into
  // executor closures, and a spec-class method would drag `this` along
  import IncrementalViewSpec.{groupOf, valueOf}

  /** Independent full recompute: replay the raw records into a
    * latest-per-key map, drop tombstones, aggregate live rows. */
  private def recompute(recs: Seq[Rec]): Set[(String, Long, Long)] = {
    val latest = recs.groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.seq).value }
    // toSeq first: collect on a Map would re-key by group and DROP pairs
    latest.toSeq.collect { case (k, v) if v != null => (groupOf(k), valueOf(v)) }
      .groupBy(_._1)
      .map { case (g, vs) => (g, vs.size.toLong, vs.map(_._2).sum) }
      .toSet
  }

  test("maintained view ≡ full recompute across multi-batch replays with deletes") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val table = Files.createTempDirectory("graft_iview").toString + "/view"
    val ckpt = Files.createTempDirectory("graft_iview_ckpt").toString
    val in = MemoryStream[Rec]
    val q = IncrementalView.start(KTableStream.changes(in.toDS()),
      groupOf, valueOf, table, ckpt)

    def viewNow(): Set[(String, Long, Long)] =
      IncrementalView.view(s, table)
        .collect().map(g => (g.group, g.n_keys, g.total)).toSet

    val fed = scala.collection.mutable.ArrayBuffer.empty[Rec]
    def feed(recs: Rec*): Unit = {
      fed ++= recs
      in.addData(recs: _*)
      q.processAllAvailable()
      assert(viewNow() == recompute(fed.toSeq),
        s"view diverged from recompute after seq ${recs.last.seq}")
    }

    try {
      // batch 1: inserts across two groups
      feed(Rec("a-1", "5", 0, 1), Rec("a-2", "7", 0, 2), Rec("b-1", "3", 0, 3))
      assert(viewNow() == Set(("a", 2L, 12L), ("b", 1L, 3L)))
      // batch 2: overwrite (subtractor −5, adder +10), delete, new key
      feed(Rec("a-1", "10", 0, 4), Rec("a-2", null, 0, 5), Rec("b-2", "4", 0, 6))
      assert(viewNow() == Set(("a", 1L, 10L), ("b", 2L, 7L)))
      // batch 3: empty a group entirely — it must LEAVE the view
      feed(Rec("a-1", null, 0, 7))
      assert(viewNow() == Set(("b", 2L, 7L)))
      // batch 4: resurrect a deleted key; totals telescope exactly
      feed(Rec("a-2", "9", 0, 8), Rec("b-1", "6", 0, 9))
      assert(viewNow() == Set(("a", 1L, 9L), ("b", 2L, 10L)))
    } finally q.stop()
  }

  test("foreachBatch redelivery of an applied batch is a no-op") {
    val s = spark
    import s.implicits._
    val table = Files.createTempDirectory("graft_iview_replay").toString + "/view"
    val b1 = Seq(Change("a-1", "5", null, 1), Change("b-1", "3", null, 2)).toDS()
    IncrementalView.applyBatch(b1, groupOf, valueOf, table, batchId = 0)
    val b2 = Seq(Change("a-1", "8", "5", 3)).toDS()
    IncrementalView.applyBatch(b2, groupOf, valueOf, table, batchId = 1)
    val after = IncrementalView.view(s, table)
      .collect().map(g => (g.group, g.n_keys, g.total)).toSet
    assert(after == Set(("a", 1L, 8L), ("b", 1L, 3L)))
    // redeliver batch 1 (at-least-once): the delta must NOT double-apply
    IncrementalView.applyBatch(b2, groupOf, valueOf, table, batchId = 1)
    val replayed = IncrementalView.view(s, table)
      .collect().map(g => (g.group, g.n_keys, g.total)).toSet
    assert(replayed == after, "redelivered batch double-applied its delta")
  }

  test("a fresh batch id after redelivery still applies (high-water mark, not a latch)") {
    val s = spark
    import s.implicits._
    val table = Files.createTempDirectory("graft_iview_hwm").toString + "/view"
    IncrementalView.applyBatch(
      Seq(Change("g-1", "2", null, 1)).toDS(), groupOf, valueOf, table, batchId = 0)
    IncrementalView.applyBatch( // stale redelivery
      Seq(Change("g-1", "2", null, 1)).toDS(), groupOf, valueOf, table, batchId = 0)
    IncrementalView.applyBatch( // genuinely new batch
      Seq(Change("g-2", "5", null, 2)).toDS(), groupOf, valueOf, table, batchId = 1)
    val rows = IncrementalView.view(s, table)
      .collect().map(g => (g.group, g.n_keys, g.total)).toSet
    assert(rows == Set(("g", 2L, 7L)))
  }
}

object IncrementalViewSpec {
  val groupOf: String => String = _.takeWhile(_ != '-')
  val valueOf: String => Long = _.toLong
}
