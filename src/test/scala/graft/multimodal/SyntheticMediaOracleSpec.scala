package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

/** The theorems behind the m3/m4/m5 oracle rows: id-deterministic pixel
  * and sample content whose pHash / spectral features are EXACT
  * arithmetic on the id. Every claim the DuckDB oracle states is proved
  * here over the full residue space, through the same real codec path
  * (BMP → ImageIO → phash64; WAV → javax.sound → FFT) the queries run. */
class SyntheticMediaOracleSpec extends AnyFunSuite {

  private def decode(bytes: Array[Byte]) =
    ImageIO.read(new ByteArrayInputStream(bytes))

  test("pHash of the DCT-basis pattern equals the arithmetic mask (350 ids)") {
    // 350 > 315 = lcm(63, 5): covers every (offset, step) residue and
    // crosses the wraparound
    for (g <- 0L until 350L) {
      val img = decode(SyntheticMedia.bmpPatternBytes(g))
      assert(img.getWidth == 32 && img.getHeight == 32)
      assert(PerceptualHash.phash64(img) == SyntheticMedia.maskHash(g),
        s"pattern $g: pHash != mask")
    }
  }

  test("pHash is invariant to the m5 brightness rescale (amp 3, base 140)") {
    for (g <- 0L until 350L) {
      val a = decode(SyntheticMedia.bmpPatternBytes(g, amp = 4, base = 128))
      val b = decode(SyntheticMedia.bmpPatternBytes(g, amp = 3, base = 140))
      assert(!java.util.Arrays.equals(
        SyntheticMedia.bmpPatternBytes(g, 4, 128),
        SyntheticMedia.bmpPatternBytes(g, 3, 140)),
        "the two renderings must differ at the byte level")
      assert(PerceptualHash.phash64(a) == PerceptualHash.phash64(b),
        s"pattern $g: brightness rescale moved a bit")
    }
  }

  test("masks are unique within a 315-id window (the m5 restriction)") {
    val hashes = (0L until 315L).map(SyntheticMedia.maskHash)
    assert(hashes.distinct.size == 315)
    // and every mask has exactly 31 bits — the median-threshold invariant
    assert(hashes.forall(h => java.lang.Long.bitCount(h) == 31))
    assert(hashes.forall(h => (h & (1L << 63)) == 0L), "bit 63 never set")
  }

  test("pattern pixels never clamp (the linearity the proof needs)") {
    for (g <- 0L until 315L; (amp, base) <- Seq((4, 128), (3, 140))) {
      val px = SyntheticMedia.patternPixels(g, amp, base).flatten
      assert(px.min > 0 && px.max < 255, s"pattern $g ($amp,$base) clamped")
    }
  }

  test("video containers parse back to the id formulas (mp4 v0/v1 + avi)") {
    // ids 0..119 cover every residue the formulas read (lcm of 2,4,5,97
    // not needed — the field arithmetic is checked directly per id) and
    // both mvhd/tkhd box versions
    for (id <- 0L until 120L) {
      val m = Multimodal.parseMeta(SyntheticMedia.videoBytes(id))
      if (id % 2 == 0) {
        assert(m.mediaType == "video/mp4", s"id $id")
        assert(m.durationMs == SyntheticMedia.mp4Duration(id) * 1000 / 600)
      } else {
        assert(m.mediaType == "video/avi", s"id $id")
        assert(m.durationMs ==
          SyntheticMedia.aviUsPerFrame(id) * SyntheticMedia.aviFrames(id) / 1000)
      }
      assert(m.width == SyntheticMedia.width(id), s"id $id width")
      assert(m.height == SyntheticMedia.height(id), s"id $id height")
    }
  }

  test("MJPEG AVI clips walk and decode back to the id formulas") {
    // 96 ids: two full cycles of lcm(8, 16, 12) = 48
    for (id <- 0L until 96L) {
      val bytes = SyntheticMedia.mjpegAviBytes(id)
      assert(Multimodal.mediaType(bytes) == "video/avi", s"id $id")
      val chunks = Multimodal.aviVideoChunks(bytes)
      assert(chunks.length == SyntheticMedia.mjpegFrameCount(id), s"id $id count")
      chunks.foreach { c =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(c))
        assert(img != null, s"id $id: frame failed to decode")
        assert(img.getWidth == SyntheticMedia.mjpegFrameW(id))
        assert(img.getHeight == SyntheticMedia.mjpegFrameH(id))
      }
      // and the avih metadata agrees with the movi contents
      val m = Multimodal.parseMeta(bytes)
      assert(m.width == SyntheticMedia.mjpegFrameW(id))
      assert(m.durationMs == 40L * SyntheticMedia.mjpegFrameCount(id))
    }
  }

  test("tone WAV spectral features equal the id formulas (all 48 residues)") {
    // (id % 8, id % 48) pairs are determined by id % 48 (8 | 48), so 48
    // ids cover every (rate, bin) combination that can ever occur
    for (id <- 0L until 48L) {
      val k = SyntheticMedia.toneBin(id)
      val rate = SyntheticMedia.toneRate(id)
      val hzPerBin = rate.toDouble / 1024.0
      val Some((r, dom, cen, rol, flat)) =
        AudioSpectral.features(SyntheticMedia.wavToneBytes(id))
      assert(r == rate)
      // dominant and rolloff are EXACT doubles — the oracle states them
      assert(dom == k * rate / 1024.0, s"id $id dominant: $dom vs bin $k")
      assert(rol == (k + 1) * rate / 1024.0, s"id $id rolloff: $rol")
      // centroid sits within 1e-2 bins of k: integer-rounding to a bin
      // index has 0.5-bin margin, 50x the observed error
      val cb = cen / hzPerBin
      assert(math.abs(cb - k) < 1e-2, s"id $id centroid $cb bins vs $k")
      assert(math.round(cb) == k)
      // a pure tone is maximally non-flat
      assert(flat < 0.01, s"id $id flatness $flat")
    }
  }
}
