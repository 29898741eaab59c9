package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the untrusted-MP4 walker guards: each test
  * surgically corrupts a valid synthetic container the way a hostile
  * (or just broken) corpus file would be, and asserts the walk bails
  * bounded instead of allocating or amplifying. */
class Mp4HardeningSpec extends AnyFunSuite {

  /** Offset of `fourcc`'s payload in b (first occurrence). */
  private def payloadOf(b: Array[Byte], fourcc: String): Int = {
    val pat = fourcc.getBytes("US-ASCII")
    val i = b.indices.indexWhere(i => i + 4 <= b.length &&
      b(i) == pat(0) && b(i + 1) == pat(1) && b(i + 2) == pat(2) && b(i + 3) == pat(3))
    assert(i > 0, s"$fourcc not found")
    i + 4
  }

  private def be32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  test("stsz declaring 2^31 fixed-size samples yields no samples, no allocation") {
    val bytes = SyntheticMedia.mjpegMp4Bytes(5L).clone()
    val stsz = payloadOf(bytes, "stsz") // version/flags(4) fixed(4) count(4)
    be32(bytes, stsz + 4, 1)            // fixed_size = 1
    be32(bytes, stsz + 8, Int.MaxValue) // sample_count = 2^31 − 1
    // must return (empty) promptly — the total-bytes bound rejects the
    // count before Array.fill can attempt a 17 GB allocation
    assert(Multimodal.mp4VideoSamples(bytes).isEmpty)
  }

  test("sizes summing past the file bail after at most one file's worth of copies") {
    val bytes = SyntheticMedia.mjpegMp4Bytes(4L).clone() // 5 frames
    val stsz = payloadOf(bytes, "stsz")
    val n = 5
    // every declared size = half the file: per-sample bounds pass at
    // offset 0 but Σ sizes ≈ 2.5× the file — the copied-bytes cap must
    // stop the walk within one file's worth
    val half = bytes.length / 2
    (0 until n).foreach(i => be32(bytes, stsz + 12 + 4 * i, half))
    val stco = payloadOf(bytes, "stco")
    val nChunks = ((bytes(stco + 4) & 0xff) << 24 |
      (bytes(stco + 5) & 0xff) << 16 | (bytes(stco + 6) & 0xff) << 8 |
      (bytes(stco + 7) & 0xff))
    (0 until nChunks).foreach(i => be32(bytes, stco + 8 + 4 * i, 0))
    val out = Multimodal.mp4VideoSamples(bytes)
    assert(out.map(_.length.toLong).sum <= bytes.length,
      s"copied ${out.map(_.length.toLong).sum} bytes from a ${bytes.length}-byte file")
  }

  test("an avcC advertising two SPS entries bails to None (stub), not a misparse") {
    val bytes = SyntheticMedia.h264Mp4Bytes(3L).clone()
    assert(Multimodal.mp4Avc1Track(bytes).isDefined, "sanity: pristine file parses")
    val avcc = payloadOf(bytes, "avcC")
    assert((bytes(avcc + 5) & 0x1f) == 1, "sanity: generator writes numSPS=1")
    bytes(avcc + 5) = (bytes(avcc + 5) | 0x02).toByte // numSPS := 3-ish (≠1)
    assert(Multimodal.mp4Avc1Track(bytes).isEmpty,
      "multi-SPS avcC must bail rather than misread the second SPS as PPS count")
  }

  test("a truncated avcC (7 payload bytes) is rejected by the bounds check") {
    val bytes = SyntheticMedia.h264Mp4Bytes(2L).clone()
    val avccSize = payloadOf(bytes, "avcC") - 8 // box size field offset
    be32(bytes, avccSize, 8 + 7) // shrink the box to 7 payload bytes
    // the walker reads boxes by their declared size: parseAvcC must see
    // cs+8 > ce and return None instead of indexing past the box
    assert(Multimodal.mp4Avc1Track(bytes).isEmpty)
  }
}
