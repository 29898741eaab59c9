package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored neighbor inside a bounded top-k buffer. */
case class ScoredHit(sim: Double, neighbor_id: Long)

/** Bounded top-k buffer — kept sorted (sim desc, id asc), never more than
  * k elements, so partial-aggregate shuffle payloads are O(k) regardless
  * of input size. */
case class TopKHits(hits: Seq[ScoredHit])

/** One (sort key, id) pair inside a bounded k-smallest-by-key buffer. */
case class KeyedHit(key: String, id: Long)

/** Bounded k-smallest buffer ordered (key asc, id asc). */
case class TopKKeyed(hits: Seq[KeyedHit])

/** One SpaceSaving counter: estimated count and its error bound
  * (`cnt − err ≤ true count ≤ cnt`). */
case class HeavyHit(item: String, cnt: Long, err: Long)

/** Bounded heavy-hitter sketch — never more than `capacity` entries. */
case class HeavySketch(hits: Seq[HeavyHit])

/** Mutable SpaceSaving buffer: item → [cnt, err]. Kryo-encoded (only
  * serialized at shuffle boundaries); mutated in place per input row. */
class HeavyBuf(val counts: java.util.HashMap[String, Array[Long]])
  extends Serializable

/** Typed custom aggregates — the general form of the reference's
  * `Reducer` hook (`IntegerAdd`, reference `TopologiesTest.scala:355-357`;
  * SURVEY.md §2.8). A Spark `Aggregator[IN, BUF, OUT]` gets map-side
  * partial merging for free (`reduce` + `merge`), the same contract a
  * Kafka Streams reducer satisfies, but distributed. Register with
  * `functions.udaf(...)` for untyped/SQL use. */
object Aggregators {

  /** The reference's IntegerAdd, verbatim semantics: associative sum. */
  val longAdd: Aggregator[Long, Long, Long] = new Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Long): Long = b + a
    override def merge(b1: Long, b2: Long): Long = b1 + b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Bounded top-k by (sim desc, neighbor_id asc). As a Spark `Aggregator`
    * it gets map-side partial aggregation: each input partition reduces to
    * at most k hits per group BEFORE the shuffle, so a top-k over n scored
    * rows moves k·partitions rows per group instead of n — the
    * distributed-top-k shape `TakeOrderedAndProject` uses, generalized to
    * per-group. */
  def topK(k: Int): Aggregator[ScoredHit, TopKHits, TopKHits] =
    new Aggregator[ScoredHit, TopKHits, TopKHits] {
      private def worseThanLast(a: ScoredHit, last: ScoredHit): Boolean =
        a.sim < last.sim || (a.sim == last.sim && a.neighbor_id >= last.neighbor_id)
      private def prune(s: Seq[ScoredHit]): Seq[ScoredHit] =
        s.sortBy(h => (-h.sim, h.neighbor_id)).take(k)
      override def zero: TopKHits = TopKHits(Vector.empty)
      // hot path: the buffer is maintained sorted, so an accepted row is a
      // positional insert (O(k) copy), not a re-sort — reduce() runs once
      // per scored input row
      override def reduce(b: TopKHits, a: ScoredHit): TopKHits =
        if (b.hits.size >= k && worseThanLast(a, b.hits.last)) b
        else {
          val at = b.hits.indexWhere(h =>
            a.sim > h.sim || (a.sim == h.sim && a.neighbor_id < h.neighbor_id))
          val pos = if (at < 0) b.hits.size else at
          TopKHits(((b.hits.take(pos) :+ a) ++ b.hits.drop(pos)).take(k))
        }
      override def merge(a: TopKHits, b: TopKHits): TopKHits =
        TopKHits(prune(a.hits ++ b.hits))
      override def finish(r: TopKHits): TopKHits = r
      override def bufferEncoder: Encoder[TopKHits] = Encoders.product[TopKHits]
      override def outputEncoder: Encoder[TopKHits] = Encoders.product[TopKHits]
    }

  /** Bounded k-smallest by (key asc, id asc) — the string-ordered sibling
    * of [[topK]], for deterministic per-group subset selection (e.g. "the
    * k rows with the smallest content hash per class"). SET semantics: an
    * exact (key, id) duplicate is inserted once — which makes the buffer
    * double as a KMV distinct sketch ([[Sketches.kmvDistinct]]). Same scale
    * contract: each partition reduces to ≤ k hits per group map-side, so
    * the shuffle moves k·partitions rows per group — never the group. */
  def topKByKey(k: Int): Aggregator[KeyedHit, TopKKeyed, TopKKeyed] = {
    require(k > 0, s"topKByKey needs k > 0, got $k")
    new Aggregator[KeyedHit, TopKKeyed, TopKKeyed] {
      private def lt(a: KeyedHit, b: KeyedHit): Boolean =
        a.key < b.key || (a.key == b.key && a.id < b.id)
      private def prune(s: Seq[KeyedHit]): Seq[KeyedHit] =
        s.sortBy(h => (h.key, h.id)).distinct.take(k)
      override def zero: TopKKeyed = TopKKeyed(Vector.empty)
      override def reduce(b: TopKKeyed, a: KeyedHit): TopKKeyed =
        // a null sort key (hash of a NULL value) is no observation at all —
        // the count(DISTINCT …) convention of ignoring NULLs
        if (a.key == null) b
        else if (b.hits.size >= k && !lt(a, b.hits.last)) b
        else {
          val at = b.hits.indexWhere(h => lt(a, h))
          val pos = if (at < 0) b.hits.size else at
          // sorted buffer ⇒ a duplicate of `a` can only sit right before
          // the insertion point (it satisfies neither lt(a,·) nor lt(·,a))
          if (pos > 0 && !lt(b.hits(pos - 1), a)) b
          else TopKKeyed(((b.hits.take(pos) :+ a) ++ b.hits.drop(pos)).take(k))
        }
      override def merge(a: TopKKeyed, b: TopKKeyed): TopKKeyed =
        TopKKeyed(prune(a.hits ++ b.hits))
      override def finish(r: TopKKeyed): TopKKeyed = r
      override def bufferEncoder: Encoder[TopKKeyed] = Encoders.product[TopKKeyed]
      override def outputEncoder: Encoder[TopKKeyed] = Encoders.product[TopKKeyed]
    }
  }

  /** SpaceSaving heavy hitters (Metwally et al. 2005) with the mergeable-
    * summaries merge (Agarwal et al. 2012): track at most `capacity`
    * (item, count, err) entries; when full, the incoming item evicts the
    * minimum-count entry and inherits its count as error bound. The
    * guarantee `cnt − err ≤ true ≤ cnt` survives arbitrary merges, and
    * when the distinct-item count never exceeds `capacity` the sketch is
    * EXACT and order-independent (the regime the SQL oracle checks).
    *
    * Scale contract: a corpus-wide heavy-hitter query moves ONE ≤
    * capacity-entry sketch per partition across the wire — no word-keyed
    * shuffle of the corpus, unlike groupBy(word).count + top-k. That is
    * the difference between a full-vocabulary exchange and O(partitions ·
    * capacity) at 100 TB. */
  def spaceSaving(capacity: Int): Aggregator[String, HeavyBuf, HeavySketch] = {
    require(capacity > 0, s"spaceSaving needs capacity > 0, got $capacity")
    new Aggregator[String, HeavyBuf, HeavySketch] {
      override def zero: HeavyBuf = new HeavyBuf(new java.util.HashMap())
      // The buffer is MUTATED in place — the sanctioned pattern for typed
      // Aggregator buffers (Spark keeps the object between reduce calls
      // and only runs the encoder at shuffle boundaries), which makes the
      // hot path (an already-tracked item) an O(1) HashMap bump instead
      // of an O(capacity) scan + full-buffer copy per input row. Eviction
      // still scans for the min — it only fires when the sketch is full
      // AND the item is untracked, which skew makes rare by construction.
      override def reduce(b: HeavyBuf, item: String): HeavyBuf = {
        if (item == null) return b
        val cur = b.counts.get(item)
        if (cur != null) cur(0) += 1
        else if (b.counts.size < capacity) b.counts.put(item, Array(1L, 0L))
        else {
          // evict the minimum count (item asc tie-break keeps single-stream
          // behavior deterministic); the newcomer inherits its count as err
          var minItem: String = null
          var minCnt = Long.MaxValue
          val it = b.counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue()(0)
            if (c < minCnt || (c == minCnt && e.getKey < minItem)) {
              minItem = e.getKey; minCnt = c
            }
          }
          b.counts.remove(minItem)
          b.counts.put(item, Array(minCnt + 1, minCnt))
        }
        b
      }
      override def merge(a: HeavyBuf, b: HeavyBuf): HeavyBuf = {
        // a FULL sketch bounds any unseen item's count by its min count;
        // a non-full sketch has seen everything (missing ⇒ exactly 0)
        def floor(s: HeavyBuf): Long =
          if (s.counts.size < capacity || s.counts.isEmpty) 0L
          else {
            var m = Long.MaxValue
            s.counts.values().forEach(v => if (v(0) < m) m = v(0))
            m
          }
        val fa = floor(a); val fb = floor(b)
        import scala.jdk.CollectionConverters._
        val keys = a.counts.keySet().asScala ++ b.counts.keySet().asScala
        val merged = keys.toSeq.map { it =>
          val ha = Option(a.counts.get(it)); val hb = Option(b.counts.get(it))
          HeavyHit(it,
            ha.map(_(0)).getOrElse(fa) + hb.map(_(0)).getOrElse(fb),
            ha.map(_(1)).getOrElse(fa) + hb.map(_(1)).getOrElse(fb))
        }.sortBy(h => (-h.cnt, h.item)).take(capacity)
        val out = new HeavyBuf(new java.util.HashMap())
        merged.foreach(h => out.counts.put(h.item, Array(h.cnt, h.err)))
        out
      }
      override def finish(r: HeavyBuf): HeavySketch = {
        import scala.jdk.CollectionConverters._
        HeavySketch(r.counts.entrySet().asScala.toSeq
          .map(e => HeavyHit(e.getKey, e.getValue()(0), e.getValue()(1)))
          .sortBy(h => (-h.cnt, h.item)))
      }
      override def bufferEncoder: Encoder[HeavyBuf] = Encoders.kryo[HeavyBuf]
      override def outputEncoder: Encoder[HeavySketch] = Encoders.product[HeavySketch]
    }
  }

  /** Numerically-stable mean via (sum, count) buffer — demonstrates a
    * composite buffer the way a real sketch would carry one. */
  val doubleMean: Aggregator[Double, (Double, Long), Double] =
    new Aggregator[Double, (Double, Long), Double] {
      override def zero: (Double, Long) = (0.0, 0L)
      override def reduce(b: (Double, Long), a: Double): (Double, Long) =
        (b._1 + a, b._2 + 1)
      override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
        (a._1 + b._1, a._2 + b._2)
      override def finish(r: (Double, Long)): Double =
        if (r._2 == 0) 0.0 else r._1 / r._2
      override def bufferEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
