package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import java.awt.image.BufferedImage

/** Perceptual image hashing — the image-dedup analog of text SimHash.
  *
  * Classic DCT pHash (public algorithm): grayscale AREA-AVERAGE resize
  * to 32×32 (explicit box filter — no AWT rescale ops, so the doubles
  * are identical on every JVM), 2-D DCT-II, the top-left 8×8
  * low-frequency block minus the DC term, thresholded at its median →
  * a 64-bit signature (63 informative bits). Crops, re-encodes,
  * brightness shifts, and resizes move few bits; unrelated images
  * differ in ~half.
  *
  * Scale story: hashing is pure map-side per-partition work
  * (decode + O(32³) arithmetic per image), and pair generation reuses
  * [[graft.functions.DedupOps.simhashPairsBanded]] — the SAME
  * (maxDist+1)-band pigeonhole blocking that keeps 64-bit Hamming
  * near-dup sub-quadratic on a 100 TB corpus. No new join machinery,
  * no all-pairs stage. */
object PerceptualHash {

  val Size = 32
  val Block = 8

  /** 64-bit pHash of a decoded image. Deterministic pure-JVM
    * arithmetic; no randomness, no platform-dependent codecs. */
  def phash64(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    require(w > 0 && h > 0, "empty image")
    // box-filter grayscale downsample: each target cell averages its
    // source rectangle (integer-partitioned, every source pixel used
    // exactly once when w,h >= Size)
    val g = Array.ofDim[Double](Size, Size)
    var by = 0
    while (by < Size) {
      val y0 = by * h / Size
      val y1 = math.max(y0 + 1, (by + 1) * h / Size)
      var bx = 0
      while (bx < Size) {
        val x0 = bx * w / Size
        val x1 = math.max(x0 + 1, (bx + 1) * w / Size)
        var s = 0.0
        var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val p = img.getRGB(x, y)
            s += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
              0.114 * (p & 0xff)
            n += 1
            x += 1
          }
          y += 1
        }
        g(by)(bx) = if (n == 0) 0.0 else s / n
        bx += 1
      }
      by += 1
    }
    // separable 2-D DCT-II; only the first Block output rows/cols are
    // ever read, so compute just those (O(Block·Size²) per axis)
    val cos = Array.tabulate(Block, Size)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / (2.0 * Size)))
    val rows = Array.ofDim[Double](Size, Block) // DCT along x, per row
    var y = 0
    while (y < Size) {
      var u = 0
      while (u < Block) {
        var s = 0.0
        var x = 0
        while (x < Size) { s += g(y)(x) * cos(u)(x); x += 1 }
        rows(y)(u) = s
        u += 1
      }
      y += 1
    }
    val dct = Array.ofDim[Double](Block, Block) // DCT along y
    var v = 0
    while (v < Block) {
      var u = 0
      while (u < Block) {
        var s = 0.0
        var yy = 0
        while (yy < Size) { s += rows(yy)(u) * cos(v)(yy); yy += 1 }
        dct(v)(u) = s
        u += 1
      }
      v += 1
    }
    // 63 AC coefficients, median threshold (63 is odd: element 31)
    val coefs = new Array[Double](Block * Block - 1)
    var i = 0
    v = 0
    while (v < Block) {
      var u = 0
      while (u < Block) {
        if (u != 0 || v != 0) { coefs(i) = dct(v)(u); i += 1 }
        u += 1
      }
      v += 1
    }
    val med = coefs.sorted.apply(31)
    var hash = 0L
    i = 0
    while (i < 63) {
      if (coefs(i) > med) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** (doc_id, simhash) pHash table for an image corpus — decode +
    * hash as per-partition imperative work (the mapPartitions niche:
    * genuinely imperative pixel loops). Undecodable / non-image rows
    * emit NO row, the same chain semantics as
    * [[graft.functions.DedupOps.simhash64]]. Column names match the
    * banded-pairs contract directly. */
  def imagePHashes(records: Dataset[MediaRecord]): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        val img =
          if (r.content == null) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null || img.getWidth == 0 || img.getHeight == 0) None
        else Some((r.id, phash64(img)))
      }
    }.toDF("doc_id", "simhash")
  }

  /** Image near-dup pairs at Hamming distance ≤ maxDist: pHash per
    * image, then the established banded self-join — perfect recall by
    * pigeonhole, exact XOR-popcount precision filter. The hash table is
    * SNAPSHOTTED first (localCheckpoint): the banded join reads it from
    * both sides, and an unsnapshotted lineage would re-decode the whole
    * image corpus per side (plan-audited: 4 decode stages → 1). The
    * snapshot is 2 columns × |corpus| rows — nothing next to pixels. */
  def nearDupImagePairs(records: Dataset[MediaRecord], maxDist: Int): DataFrame =
    graft.functions.DedupOps.simhashPairsBanded(
      imagePHashes(records).localCheckpoint(false), maxDist)
}
