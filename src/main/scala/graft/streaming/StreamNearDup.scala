package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming MinHash-LSH near-duplicate detection — the continuous twin
  * of the batch `DedupOps.minhashLsh` candidate generator: every
  * arriving document is banded by the SAME codegen'd signature
  * ([[graft.expressions.MinHashSignature]], identical hash family and
  * band layout), and a candidate pair is emitted the moment two
  * documents land in the same (band, sig) bucket within the watermark
  * horizon.
  *
  * Semantics contract (the StreamDedup horizon discipline): the
  * watermark delay IS the dedup horizon — a stored bucket entry dies
  * once the watermark passes its event time, so a duplicate arriving
  * later than the horizon legitimately pairs with nothing (matching a
  * batch run windowed to the horizon). Within a micro-batch, rows fold
  * in (ts, doc_id) order; pairs are canonical (a < b) and may repeat
  * across bands — downstream consumers dedup with the same
  * watermark-scoped `dropDuplicates` the batch chain's `distinct()`
  * performs (the spec compares distinct sets).
  *
  * Scale: state per LSH bucket is the list of live (doc_id, ts) entries
  * — LSH's whole point is that buckets are tiny (the batch plan's
  * bucket-local join, here bucket-local state); eviction is
  * prune-on-access plus an event-time timer per entry, so idle buckets
  * clear themselves when the watermark passes. The banding projection
  * is stateless map-side work, exactly the batch plan's shape.
  */
object StreamNearDup {

  /** One banded row of an arriving document (`ets` carries the
    * watermarked event-time column through to the processor; `full` is
    * the complete MinHash signature, kept so matches can be SCORED from
    * state without a second pass). */
  private[streaming] case class BandRow(doc_id: Long, band: Int, sig: String,
                                        full: Seq[Long],
                                        ets: java.sql.Timestamp) {
    def tsMs: Long = ets.getTime
  }

  /** A same-bucket candidate pair (a < b), tagged with the band and
    * scored by the MinHash Jaccard estimator (matching signature
    * components / numHashes — the d16-calibrated estimate; exact verify
    * would need document text in state, which a stream cannot afford). */
  case class CandidatePair(a: Long, b: Long, band: Int, est_jaccard: Double)

  private[streaming] case class Stored(doc_id: Long, ts_ms: Long,
                                       full: Seq[Long])

  private[streaming] class BucketMatcher
      extends StatefulProcessor[(Int, String), BandRow, CandidatePair] {
    @transient private var docs: ListState[Stored] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      docs = getHandle.getListState[Stored]("docs",
        Encoders.product[Stored], TTLConfig.NONE)

    private def live(wm: Long): Seq[Stored] =
      docs.get().filter(_.ts_ms >= wm).toSeq

    override def handleInputRows(key: (Int, String), rows: Iterator[BandRow],
                                 timers: TimerValues): Iterator[CandidatePair] = {
      val wm = timers.getCurrentWatermarkInMs()
      var stored = live(wm)
      val out = Seq.newBuilder[CandidatePair]
      rows.toSeq.sortBy(r => (r.tsMs, r.doc_id)).foreach { r =>
        stored.foreach { s =>
          if (s.doc_id != r.doc_id) {
            val matches = s.full.iterator.zip(r.full.iterator)
              .count { case (x, y) => x == y }
            out += CandidatePair(math.min(s.doc_id, r.doc_id),
              math.max(s.doc_id, r.doc_id), key._1,
              matches.toDouble / r.full.size)
          }
        }
        if (!stored.exists(_.doc_id == r.doc_id)) {
          stored = stored :+ Stored(r.doc_id, r.tsMs, r.full)
          // GC point: fires once the watermark passes this entry
          getHandle.registerTimer(r.tsMs)
        }
      }
      docs.put(stored.toArray)
      out.result().iterator
    }

    override def handleExpiredTimer(key: (Int, String), timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[CandidatePair] = {
      val keep = live(timers.getCurrentWatermarkInMs())
      if (keep.isEmpty) docs.clear() else docs.put(keep.toArray)
      Iterator.empty
    }
  }

  /** Candidate near-dup pairs over a document stream. `docs` must carry
    * `idCol` (long), `textCol` (string) and `tsCol` (timestamp); the
    * watermark `horizon` is both the allowed lateness and the pairing
    * window. Band parameters mirror [[graft.functions.DedupOps.minhashLsh]]
    * defaults — identical buckets, so stream ≡ batch on in-horizon data
    * is a structural fact, not a tuning coincidence. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     tsCol: String, horizon: String,
                     numHashes: Int = 12, rowsPerBand: Int = 3,
                     shingleN: Int = 3): Dataset[CandidatePair] = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val spark = docs.sparkSession
    import spark.implicits._
    val numBands = numHashes / rowsPerBand
    val sig = graft.expressions.MinHashSignature.sig(
      coalesce(graft.functions.TextAnalysis.tokens(col(textCol)), array()),
      numHashes, shingleN)
    // per-band bucket string: the batch lshBands concat_ws('|') layout
    val bandStructs = (0 until numBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", (0 until rowsPerBand).map(r =>
          element_at(col("__mh"), b * rowsPerBand + r + 1).cast("string")): _*)
          .as("sig"))
    }
    docs
      .select(col(idCol).as("doc_id"), col(tsCol).as("ets"), sig.as("__mh"))
      .withWatermark("ets", horizon)
      .select(col("doc_id"), col("ets"), col("__mh"),
        explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"),
        col("__mh").as("full"), col("ets"))
      .as[BandRow]
      .groupByKey(r => (r.band, r.sig))
      .transformWithState(new BucketMatcher,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
