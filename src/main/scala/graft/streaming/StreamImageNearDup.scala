package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming image near-duplicate detection — the continuous twin of the
  * batch `PerceptualHash.nearDupImagePairs` chain (m5/m7): every arriving
  * image is decoded and pHashed MAP-SIDE (the same per-partition codec
  * niche as the batch `imagePHashes`), banded by the SAME
  * (maxDist + 1)-band pigeonhole layout as
  * [[graft.functions.DedupOps.simhashPairsBanded]], and a pair is emitted
  * the moment two images share a band bucket within the watermark
  * horizon — EXACT-verified: the full 64-bit hash lives in bucket state,
  * so emitted pairs carry the true XOR-popcount Hamming distance and
  * pairs above `maxDist` never leave the processor (unlike the text
  * MinHash twin, which can only estimate from state).
  *
  * Semantics contract (the StreamDedup/StreamNearDup horizon
  * discipline): the watermark delay IS the pairing window — a stored
  * entry dies once the watermark passes its event time. Pairs are
  * canonical (a < b) and may repeat across bands; consumers dedup the
  * same way the batch chain's `distinct()` does (the spec compares
  * distinct sets).
  *
  * Scale: image BYTES never enter state or any exchange — the stream
  * shuffles only (band, key, hash) rows, and per-bucket state is the
  * list of live (doc_id, ts, hash64) entries, pigeonhole-small for the
  * same reason the batch join is bucket-local. Eviction is
  * prune-on-access plus an event-time timer per entry.
  */
object StreamImageNearDup {

  /** An exact-verified near-dup pair (a < b, hamming ≤ maxDist). */
  case class ImagePair(a: Long, b: Long, hamming: Int)

  private[streaming] case class BandRow(doc_id: Long, band: Int, key: Long,
                                        full: Long, ets: java.sql.Timestamp) {
    def tsMs: Long = ets.getTime
  }

  private[streaming] case class Stored(doc_id: Long, ts_ms: Long, full: Long)

  private[streaming] class BucketMatcher(maxDist: Int)
      extends StatefulProcessor[(Int, Long), BandRow, ImagePair] {
    @transient private var docs: ListState[Stored] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      docs = getHandle.getListState[Stored]("docs",
        Encoders.product[Stored], TTLConfig.NONE)

    private def live(wm: Long): Seq[Stored] =
      docs.get().filter(_.ts_ms >= wm).toSeq

    override def handleInputRows(key: (Int, Long), rows: Iterator[BandRow],
                                 timers: TimerValues): Iterator[ImagePair] = {
      val wm = timers.getCurrentWatermarkInMs()
      var stored = live(wm)
      val out = Seq.newBuilder[ImagePair]
      rows.toSeq.sortBy(r => (r.tsMs, r.doc_id)).foreach { r =>
        stored.foreach { s =>
          if (s.doc_id != r.doc_id) {
            // exact precision filter IN the processor — the batch
            // chain's bit_count(ha ^ hb) <= maxDist, verified here
            val d = java.lang.Long.bitCount(s.full ^ r.full)
            if (d <= maxDist)
              out += ImagePair(math.min(s.doc_id, r.doc_id),
                math.max(s.doc_id, r.doc_id), d)
          }
        }
        if (!stored.exists(_.doc_id == r.doc_id)) {
          stored = stored :+ Stored(r.doc_id, r.tsMs, r.full)
          getHandle.registerTimer(r.tsMs) // GC when the watermark passes
        }
      }
      docs.put(stored.toArray)
      out.result().iterator
    }

    override def handleExpiredTimer(key: (Int, Long), timers: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[ImagePair] = {
      val keep = live(timers.getCurrentWatermarkInMs())
      if (keep.isEmpty) docs.clear() else docs.put(keep.toArray)
      Iterator.empty
    }
  }

  /** Exact near-dup pairs over an image stream. `images` must carry
    * `idCol` (long), `contentCol` (binary image bytes) and `tsCol`
    * (timestamp); `horizon` is both the allowed lateness and the pairing
    * window. Band layout mirrors `simhashPairsBanded(maxDist)` — recall
    * by pigeonhole is the same theorem as the batch join's. Undecodable
    * rows emit nothing (the `imagePHashes` chain semantics). */
  def pairs(images: DataFrame, idCol: String, contentCol: String,
            tsCol: String, horizon: String, maxDist: Int = 2): Dataset[ImagePair] = {
    require(maxDist >= 0 && maxDist < 64, s"maxDist out of range: $maxDist")
    val spark = images.sparkSession
    import spark.implicits._
    val numBands = maxDist + 1
    val w = 64 / numBands
    // decode + hash per partition (imperative pixel loops — the batch
    // imagePHashes niche), before the watermark: only scalar rows flow on
    val hashed = images
      .select(col(idCol).cast("long").as("_id"), col(contentCol).as("_c"),
        col(tsCol).as("_t"))
      .as[(Long, Array[Byte], java.sql.Timestamp)]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes, ets) =>
          val img =
            if (bytes == null) null
            else
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes))
              catch { case scala.util.control.NonFatal(_) => null }
          if (img == null || img.getWidth == 0 || img.getHeight == 0) None
          else Some((id, graft.multimodal.PerceptualHash.phash64(img), ets))
        }
      }
      .toDF("doc_id", "full", "ets")
      .withWatermark("ets", horizon)
    // the simhashPairsBanded band layout: band b covers [b·w, hi)
    val bandStructs = (0 until numBands).map { b =>
      val hi = if (b == numBands - 1) 64 else (b + 1) * w
      val width = hi - b * w
      val mask = if (width == 64) -1L else (1L << width) - 1L
      struct(lit(b).as("band"),
        shiftrightunsigned(col("full"), b * w).bitwiseAND(lit(mask)).as("key"))
    }
    hashed
      .select(col("doc_id"), col("full"), col("ets"),
        explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.key").as("key"),
        col("full"), col("ets"))
      .as[BandRow]
      .groupByKey(r => (r.band, r.key))
      .transformWithState(new BucketMatcher(maxDist),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
