package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

/** [[IncrementalIndex]]: the delta-maintained (term, df, total_tf)
  * inverted-index statistics must EQUAL a from-scratch recompute of the
  * live documents after every micro-batch — through document upserts,
  * rewrites, deletes, and resurrections — and redelivery is a no-op. */
class IncrementalIndexSpec extends SparkSpec {

  /** Independent recompute: latest-per-doc, drop tombstones, count. */
  private def recompute(recs: Seq[Rec]): Set[(String, Long, Long)] = {
    val latest = recs.groupBy(_.key).map { case (k, rs) => k -> rs.maxBy(_.seq).value }
    val live = latest.toSeq.collect { case (_, v) if v != null =>
      IncrementalIndex.termCounts(v) }
    live.flatMap(_.keySet).distinct.map { t =>
      (t, live.count(_.contains(t)).toLong, live.map(_.getOrElse(t, 0L)).sum)
    }.toSet
  }

  test("maintained index ≡ recompute through rewrites, deletes, resurrection") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val table = Files.createTempDirectory("graft_iidx").toString + "/index"
    val ckpt = Files.createTempDirectory("graft_iidx_ckpt").toString
    val in = MemoryStream[Rec]
    val q = IncrementalIndex.start(KTableStream.changes(in.toDS()), table, ckpt)

    def indexNow(): Set[(String, Long, Long)] =
      IncrementalIndex.index(s, table)
        .collect().map(t => (t.term, t.df, t.total_tf)).toSet

    val fed = scala.collection.mutable.ArrayBuffer.empty[Rec]
    def feed(recs: Rec*): Unit = {
      fed ++= recs
      in.addData(recs: _*)
      q.processAllAvailable()
      assert(indexNow() == recompute(fed.toSeq),
        s"index diverged after seq ${recs.last.seq}")
    }

    try {
      feed(Rec("d1", "spark streams spark", 0, 1),
        Rec("d2", "kafka streams", 0, 2))
      assert(indexNow() == Set(
        ("spark", 1L, 2L), ("streams", 2L, 2L), ("kafka", 1L, 1L)))
      // rewrite d1: 'spark' tf 2→1, gains 'joins'; subtractor must
      // retract the OLD text exactly
      feed(Rec("d1", "spark joins", 0, 3))
      assert(indexNow() == Set(
        ("spark", 1L, 1L), ("joins", 1L, 1L),
        ("streams", 1L, 1L), ("kafka", 1L, 1L)))
      // delete d2: its terms' df telescopes; 'kafka' leaves the index
      feed(Rec("d2", null, 0, 4))
      assert(indexNow() == Set(("spark", 1L, 1L), ("joins", 1L, 1L)))
      // resurrect d2 with new content
      feed(Rec("d2", "kafka joins kafka", 0, 5))
      assert(indexNow() == Set(
        ("spark", 1L, 1L), ("joins", 2L, 2L), ("kafka", 1L, 2L)))
    } finally q.stop()
  }

  test("redelivered batch is a no-op; later batch ids still apply") {
    val s = spark
    import s.implicits._
    val table = Files.createTempDirectory("graft_iidx2").toString + "/index"
    val one = Seq(Change("d1", "alpha beta", null, 1L)).toDS()
    IncrementalIndex.applyBatch(one, table, batchId = 0L)
    val after = IncrementalIndex.index(s, table).collect().toSet
    // redelivery of batch 0 must not double-count
    IncrementalIndex.applyBatch(one, table, batchId = 0L)
    assert(IncrementalIndex.index(s, table).collect().toSet == after)
    // a fresh batch id applies (high-water mark, not a latch)
    val two = Seq(Change("d2", "beta gamma", null, 2L)).toDS()
    IncrementalIndex.applyBatch(two, table, batchId = 1L)
    val got = IncrementalIndex.index(s, table)
      .collect().map(t => (t.term, t.df, t.total_tf)).toSet
    assert(got == Set(("alpha", 1L, 1L), ("beta", 2L, 2L), ("gamma", 1L, 1L)))
  }
}
