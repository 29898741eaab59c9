package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** [[Aggregators.spaceSaving]] — plain-Scala laws (no Spark session
  * needed: Aggregator reduce/merge are pure functions):
  *  1. exact regime (capacity ≥ distinct): counts equal true counts with
  *     zero error, regardless of how the stream is split and merged;
  *  2. bounded buffer: the sketch never exceeds capacity under overflow;
  *  3. the SpaceSaving guarantee cnt − err ≤ true ≤ cnt holds for every
  *     surviving entry after arbitrary split + merge. */
class SpaceSavingSpec extends AnyFunSuite {

  private def drain(agg: org.apache.spark.sql.expressions.Aggregator[
      String, HeavyBuf, HeavySketch], items: Seq[String]): HeavySketch =
    agg.finish(items.foldLeft(agg.zero)(agg.reduce))

  private val rnd = new scala.util.Random(11)
  private val stream: Seq[String] =
    Seq.fill(2000)(s"w${(math.pow(rnd.nextDouble(), 2) * 50).toInt}") // skewed

  test("exact when capacity covers the vocabulary, under any split") {
    val agg = Aggregators.spaceSaving(64) // 50 distinct < 64
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val whole = drain(agg, stream)
    assert(whole.hits.map(h => h.item -> h.cnt).toMap == truth)
    assert(whole.hits.forall(_.err == 0L))

    // split into 7 uneven chunks, reduce each, merge pairwise
    val parts = stream.grouped(311).map(c => c.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = agg.finish(parts.reduce(agg.merge))
    assert(merged.hits.map(h => h.item -> h.cnt).toMap == truth)
    assert(merged.hits.forall(_.err == 0L))
  }

  test("buffer stays bounded and the count guarantee holds under overflow") {
    val capacity = 16
    val agg = Aggregators.spaceSaving(capacity) // 50 distinct > 16: evictions
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

    // single-stream
    val whole = drain(agg, stream)
    assert(whole.hits.size <= capacity)
    whole.hits.foreach { h =>
      val t = truth(h.item)
      assert(t <= h.cnt && h.cnt - h.err <= t,
        s"${h.item}: true $t outside [${h.cnt - h.err}, ${h.cnt}]")
    }

    // split + merge (partial-aggregation path)
    val parts = stream.grouped(173).map(c => c.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = agg.finish(parts.reduce(agg.merge))
    assert(merged.hits.size <= capacity)
    merged.hits.foreach { h =>
      val t = truth(h.item)
      assert(t <= h.cnt && h.cnt - h.err <= t,
        s"merged ${h.item}: true $t outside [${h.cnt - h.err}, ${h.cnt}]")
    }
    // the genuinely heavy items must survive eviction: top-3 true counts
    val top3 = truth.toSeq.sortBy(-_._2).take(3).map(_._1).toSet
    assert(top3.subsetOf(merged.hits.map(_.item).toSet),
      s"heavy items evicted: $top3 vs ${merged.hits.map(_.item)}")
  }
}
