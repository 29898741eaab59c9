package graft.multimodal

import graft.SparkSpec
import java.awt.image.BufferedImage

/** DCT pHash: invariance to mild edits, separation of unrelated images,
  * and the banded-pairs reuse end-to-end over real PNG bytes. */
class PerceptualHashSpec extends SparkSpec {

  /** Deterministic smooth test image in RELATIVE coordinates (so a
    * resize resamples the same continuous picture), built from the DCT
    * basis itself with a dense 1/f-decaying spectrum and alternating
    * signs: EVERY low-frequency coefficient is populated and distinct,
    * so the median threshold has clear margins — pHash's intended
    * operating regime (natural images, not sparse/flat spectra whose
    * near-median bits are noise). */
  private def baseImage(w: Int = 64, h: Int = 64, shift: Int = 0,
                        remix: Boolean = false): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val u0 = (x + 0.5) / w
      val v0 = (y + 0.5) / h
      var s = 128.0
      for (fu <- 0 until 8; fv <- 0 until 8; if fu + fv > 0) {
        val sgn = if (((fu * 7 + fv * 3) & 1) == 0) 1 else -1
        // a visible structural edit: flip the sign of one diagonal's
        // components — deterministically moves a handful of hash bits
        val flip = if (remix && fu + fv == 3) -1 else 1
        s += sgn * flip * 16.0 / (1 + fu + fv) *
          math.cos(math.Pi * fu * u0) * math.cos(math.Pi * fv * v0)
      }
      val l = math.max(0, math.min(255, s.round.toInt + shift))
      img.setRGB(x, y, (l << 16) | (l << 8) | l)
    }
    img
  }

  /** Unrelated image: deterministic pseudo-noise (LCG over pixel index). */
  private def noiseImage(w: Int = 64, h: Int = 64): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var s = 12345L
    for (y <- 0 until h; x <- 0 until w) {
      s = s * 6364136223846793005L + 1442695040888963407L
      img.setRGB(x, y, ((s >>> 24) & 0xffffff).toInt)
    }
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("hash is deterministic and edit-tolerant, unrelated images are far") {
    val base = PerceptualHash.phash64(baseImage())
    assert(base === PerceptualHash.phash64(baseImage()))
    // brightness shift: small Hamming move
    assert(dist(base, PerceptualHash.phash64(baseImage(shift = 12))) <= 6)
    // resize (same content at 96×96): small move
    assert(dist(base, PerceptualHash.phash64(baseImage(96, 96))) <= 6)
    // unrelated noise: far (≈32 expected; assert a wide margin)
    assert(dist(base, PerceptualHash.phash64(noiseImage())) >= 16)
    // a visible structural change moves some bits
    assert(dist(base, PerceptualHash.phash64(baseImage(remix = true))) >= 1)
  }

  test("near-dup pairs via the banded Hamming join find edits, not noise") {
    import spark.implicits._
    val meta = MediaMeta("image/png", 64, 64, 0L, 0, 0)
    val records = Seq(
      MediaRecord(1L, meta, png(baseImage())),
      MediaRecord(2L, meta, png(baseImage(shift = 12))),   // near-dup of 1
      MediaRecord(3L, meta, png(baseImage(96, 96))),       // resized dup of 1
      MediaRecord(4L, meta, png(noiseImage())),            // unrelated
      MediaRecord(5L, meta, Array[Byte](1, 2, 3))          // undecodable: no row
    ).toDS()
    val hashes = PerceptualHash.imagePHashes(records)
    assert(hashes.count() === 4) // undecodable row dropped, chain semantics
    val pairs = PerceptualHash.nearDupImagePairs(records, maxDist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"edit pair missing: $pairs")
    assert(pairs.contains((1L, 3L)), s"resize pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"noise image joined a near-dup pair: $pairs")
  }
}
