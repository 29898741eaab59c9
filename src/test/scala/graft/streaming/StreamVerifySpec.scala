package graft.streaming

import graft.{SparkEntry, StreamVerify}
import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity for the STREAMCHECK gate: every twin id is unique,
  * every referenced batch query exists in `SparkEntry.queries` (so the
  * stream ≡ batch comparison really chains through the DuckDB-gated
  * oracle), and the one derived reference is explicitly marked. The
  * replay execution itself is exercised end-to-end by the per-round
  * `runMain graft.StreamVerify` drive (STREAMCHECK_r{N}.json); specs for
  * the individual twins' semantics live next to each twin. */
class StreamVerifySpec extends AnyFunSuite {

  test("twin ids are unique and cover the judge-named streaming surface") {
    val ids = StreamVerify.twins.map(_._1)
    assert(ids.distinct == ids, "duplicate twin ids")
    val must = Seq("k1_ktable", "k2_tombstone", "w1_tumbling", "w3_session",
      "j1_band_inner", "j6_fk_left", "j7_fk_inner_chain", "x2_topk",
      "x39_hll", "x43_funnel", "x53_zscore", "x54_transitions", "x65_cusum",
      "x94_overwindow", "d1_dedup", "d2_neardup")
    val missing = must.filterNot(ids.contains)
    assert(missing.isEmpty, s"core twins missing from the registry: $missing")
    assert(ids.size >= 30, s"registry shrank to ${ids.size} twins")
  }

  test("every batch reference resolves to an oracle-gated query") {
    StreamVerify.twins.foreach { case (id, batchId, _, _) =>
      if (!batchId.startsWith("(derived:"))
        assert(SparkEntry.queries.contains(batchId),
          s"twin $id references unknown batch query $batchId")
    }
    // derived references must say what they recompute
    StreamVerify.twins.collect {
      case (id, b, _, _) if b.startsWith("(derived:") => (id, b)
    }.foreach { case (_, b) => assert(b.length > 12) }
  }

  test("every twin carries a projection disclosure") {
    StreamVerify.twins.foreach { case (id, _, proj, _) =>
      assert(proj.nonEmpty, s"twin $id has no projection note")
    }
  }
}
