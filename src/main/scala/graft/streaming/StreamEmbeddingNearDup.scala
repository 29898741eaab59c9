package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming embedding (semantic) near-duplicate detection — the
  * continuous twin of the batch embedding-dedup family (d6/d8): every
  * arriving vector is bucketed MAP-SIDE by a signed-random-projection
  * (SRP) signature (Charikar 2002 — the cosine-LSH public construction:
  * bit j = sign⟨v, r_j⟩ with deterministic ±1 hyperplanes), the
  * signature split into (maxDiff + 1) bands (the simhashPairsBanded
  * pigeonhole: any two signatures within Hamming ≤ maxDiff share a
  * band), and a pair is emitted the moment two vectors share a band
  * bucket within the watermark horizon AND their EXACT cosine clears
  * the threshold — verified in the processor from stored vectors, so
  * emitted similarities are true values, not estimates.
  *
  * Detection contract (what the spec pins, stream ≡ batch replay):
  * pairs whose SRP signatures agree on ≥ 1 band and whose cosine ≥
  * `threshold`, over in-horizon data. SRP blocking trades recall for
  * state locality exactly like the batch IVF-cell/salted-block paths —
  * truly similar vectors have close signatures (P[bit differs] =
  * angle/π), so near-dups land in shared bands with high probability,
  * while the expected bucket occupancy stays rate·horizon / 2^bits.
  *
  * Scale: the stream shuffles (band, key, vector) rows once; per-bucket
  * state is the list of live (id, ts, vector) entries — horizon-bounded
  * and bucket-local (never a corpus-wide structure). Eviction is
  * prune-on-access plus an event-time timer per entry.
  */
object StreamEmbeddingNearDup {

  /** An exact-verified near-dup pair (a < b, cosine ≥ threshold,
    * rounded to 6 — the d-family readout convention). */
  case class VecPair(a: Long, b: Long, cosine: Double)

  private[streaming] case class BandRow(doc_id: Long, band: Int, key: Long,
                                        vec: Seq[Float],
                                        ets: java.sql.Timestamp) {
    def tsMs: Long = ets.getTime
  }

  private[streaming] case class Stored(doc_id: Long, ts_ms: Long,
                                       vec: Seq[Float])

  /** Deterministic ±1 hyperplane weight for (bit j, dimension i) — a
    * splitmix64-style integer mix, identical on every JVM and shared
    * with the spec's independent replay. */
  def srpWeight(j: Int, i: Int): Int = {
    var z = j.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xC2B2AE3D27D4EB4FL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    if ((z & 1L) == 0L) 1 else -1
  }

  /** The b-bit SRP signature of a vector (bit j set iff ⟨v, r_j⟩ > 0;
    * ties to 0 — deterministic). Accumulation runs in ascending
    * dimension order, so the float→double sum is order-fixed. */
  def srpSignature(vec: Seq[Float], bits: Int): Long = {
    var sig = 0L
    var j = 0
    while (j < bits) {
      var s = 0.0
      var i = 0
      val n = vec.length
      while (i < n) { s += vec(i).toDouble * srpWeight(j, i); i += 1 }
      if (s > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Exact cosine of two stored vectors (doubles, ascending order). */
  def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  private[streaming] class BucketMatcher(threshold: Double)
      extends StatefulProcessor[(Int, Long), BandRow, VecPair] {
    @transient private var docs: ListState[Stored] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      docs = getHandle.getListState[Stored]("docs",
        Encoders.product[Stored], TTLConfig.NONE)

    private def live(wm: Long): Seq[Stored] =
      docs.get().filter(_.ts_ms >= wm).toSeq

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandRow],
                                 timers: TimerValues): Iterator[VecPair] = {
      val wm = timers.getCurrentWatermarkInMs()
      var stored = live(wm)
      val out = Seq.newBuilder[VecPair]
      rows.toSeq.sortBy(r => (r.tsMs, r.doc_id)).foreach { r =>
        stored.foreach { s =>
          if (s.doc_id != r.doc_id) {
            // exact verify IN the processor — the emitted similarity is
            // the true cosine, not the LSH estimate
            val c = cosine(s.vec, r.vec)
            if (c >= threshold)
              out += VecPair(math.min(s.doc_id, r.doc_id),
                math.max(s.doc_id, r.doc_id),
                math.floor(c * 1e6 + 0.5) / 1e6)
          }
        }
        if (!stored.exists(_.doc_id == r.doc_id)) {
          stored = stored :+ Stored(r.doc_id, r.tsMs, r.vec)
          getHandle.registerTimer(r.tsMs) // GC when the watermark passes
        }
      }
      docs.put(stored.toArray)
      out.result().iterator
    }

    override def handleExpiredTimer(key: (Int, Long), timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[VecPair] = {
      val keep = live(timers.getCurrentWatermarkInMs())
      if (keep.isEmpty) docs.clear() else docs.put(keep.toArray)
      Iterator.empty
    }
  }

  /** Exact near-dup pairs over a vector stream. `vecs` must carry
    * `idCol` (long), `vecCol` (array<float>) and `tsCol` (timestamp);
    * `horizon` is the allowed lateness AND pairing window. The SRP
    * signature has `bits` bits split into `maxDiff + 1` bands. */
  def pairs(vecs: DataFrame, idCol: String, vecCol: String, tsCol: String,
            horizon: String, threshold: Double = 0.9, bits: Int = 16,
            maxDiff: Int = 3): Dataset[VecPair] = {
    require(bits >= 1 && bits <= 64, s"bits out of range: $bits")
    require(maxDiff >= 0 && maxDiff < bits, s"maxDiff out of range: $maxDiff")
    val spark = vecs.sparkSession
    import spark.implicits._
    val numBands = maxDiff + 1
    val w = bits / numBands
    // signature map-side, then banding as column arithmetic
    val signed = vecs
      .select(col(idCol).cast("long").as("_id"), col(vecCol).as("_v"),
        col(tsCol).as("_t"))
      .as[(Long, Seq[Float], java.sql.Timestamp)]
      .map { case (id, v, t) => (id, v, srpSignature(v, bits), t) }
      .toDF("doc_id", "vec", "sig", "ets")
      .withWatermark("ets", horizon)
    val bandStructs = (0 until numBands).map { b =>
      val hi = if (b == numBands - 1) bits else (b + 1) * w
      val width = hi - b * w
      val mask = if (width == 64) -1L else (1L << width) - 1L
      struct(lit(b).as("band"),
        shiftrightunsigned(col("sig"), b * w).bitwiseAND(lit(mask)).as("key"))
    }
    signed
      .select(col("doc_id"), col("vec"), col("ets"),
        explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.key").as("key"),
        col("vec"), col("ets"))
      .as[BandRow]
      .groupByKey(r => (r.band, r.key))
      .transformWithState(new BucketMatcher(threshold),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
