package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The I_PCM H.264 subset is LOSSLESS — so unlike every other codec in
  * the media family, these tests can demand pixel-exact equality, not
  * statistics. */
class H264Spec extends AnyFunSuite {

  private def frame(w: Int, h: Int, seed: Int): H264.Frame = {
    val rnd = new scala.util.Random(seed)
    val y = new Array[Byte](w * h); rnd.nextBytes(y)
    val cb = new Array[Byte](w * h / 4); rnd.nextBytes(cb)
    val cr = new Array[Byte](w * h / 4); rnd.nextBytes(cr)
    H264.Frame(w, h, y, cb, cr)
  }

  private def roundTrip(f: H264.Frame): H264.Frame = {
    val nals = Seq(H264.encodeSpsNal(f.width, f.height),
      H264.encodePpsNal(), H264.encodeIdrIPcmNal(f))
    val out = H264.decodeNals(nals)
    assert(out.length == 1)
    out.head
  }

  test("random frames round-trip pixel-exactly (MB-aligned dims)") {
    for (seed <- 1 to 5) {
      val f = frame(32, 16, seed)
      val g = roundTrip(f)
      assert(g.width == 32 && g.height == 16)
      assert(java.util.Arrays.equals(g.y, f.y), "luma")
      assert(java.util.Arrays.equals(g.cb, f.cb), "cb")
      assert(java.util.Arrays.equals(g.cr, f.cr), "cr")
    }
  }

  test("non-multiple-of-16 dims round-trip exactly through SPS cropping") {
    val f = frame(18, 22, 42) // mbW=2 (crop 7×2 px), mbH=2 (crop 5×2 px)
    val g = roundTrip(f)
    assert(g.width == 18 && g.height == 22)
    assert(java.util.Arrays.equals(g.y, f.y))
    assert(java.util.Arrays.equals(g.cb, f.cb))
    assert(java.util.Arrays.equals(g.cr, f.cr))
  }

  test("all-zero planes survive emulation prevention") {
    // a zero plane is a wall of 0x00 — the EBSP layer must escape every
    // 0x000000 run and strip it back out
    val f = H264.Frame(16, 16, new Array[Byte](256),
      new Array[Byte](64), new Array[Byte](64))
    val idr = H264.encodeIdrIPcmNal(f)
    // the escape byte really is present on the wire
    assert(idr.sliding(3).exists(s =>
      s(0) == 0 && s(1) == 0 && s(2) == 3), "no emulation-prevention bytes")
    val g = roundTrip(f)
    assert(java.util.Arrays.equals(g.y, f.y))
  }

  test("Exp-Golomb codecs agree with the spec's worked examples") {
    // 9.1: codeNum 0→'1', 1→'010', 2→'011', 3→'00100' …
    val w = new H264.BitWriter
    Seq(0, 1, 2, 3, 4, 5, 6, 7).foreach(w.ue)
    w.trailing()
    val r = new H264.BitReader(w.toArray)
    Seq(0, 1, 2, 3, 4, 5, 6, 7).foreach(v => assert(r.ue() == v))
    val w2 = new H264.BitWriter
    Seq(0, 1, -1, 2, -2, 7, -9).foreach(w2.se)
    w2.trailing()
    val r2 = new H264.BitReader(w2.toArray)
    Seq(0, 1, -1, 2, -2, 7, -9).foreach(v => assert(r2.se() == v))
  }

  test("out-of-subset macroblocks and slices are rejected loudly, not misdecoded") {
    val sps = H264.parseSps(H264.encodeSpsNal(16, 16))
    // mb_type beyond the I-slice range (26): not an intra macroblock
    val w = new H264.BitWriter
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
    w.u(0, 1); w.u(0, 1); w.se(0)
    w.ue(26)
    w.trailing()
    val nal = Array((3 << 5 | 5).toByte) ++ w.toArray
    val e = intercept[IllegalArgumentException](H264.decodeIdr(nal, sps))
    assert(e.getMessage.contains("not an I-slice macroblock"))
    // a truncated Intra_4x4 macroblock (header only, no mode/residual
    // bits) dies as a clean parse error, never a silent frame
    val w2 = new H264.BitWriter
    w2.ue(0); w2.ue(7); w2.ue(0); w2.u(0, 4); w2.ue(0)
    w2.u(0, 1); w2.u(0, 1); w2.se(0)
    w2.ue(0) // mb_type I_4x4 with nothing behind it
    w2.trailing()
    val nal2 = Array((3 << 5 | 5).toByte) ++ w2.toArray
    intercept[IllegalArgumentException](H264.decodeIdr(nal2, sps))
  }

  test("a malformed SPS declaring huge dims dies as a parse error, not an alloc") {
    val w = new H264.BitWriter
    w.u(66, 8); w.u(0, 8); w.u(10, 8)
    w.ue(0); w.ue(0); w.ue(2); w.ue(0); w.u(0, 1)
    w.ue((1 << 20) - 1) // pic_width_in_mbs_minus1: a 16-million-MB row
    w.ue(0)
    w.u(1, 1); w.u(0, 1); w.u(0, 1); w.u(0, 1)
    w.trailing()
    val nal = Array((3 << 5 | 7).toByte) ++ w.toArray
    val e = intercept[IllegalArgumentException](H264.parseSps(nal))
    assert(e.getMessage.contains("implausible SPS"))
  }

  test("random garbage NALs fail cleanly (no hang, no giant alloc)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200; t <- Seq(H264.NalSps, H264.NalIdr)) {
      val body = new Array[Byte](1 + rnd.nextInt(64))
      rnd.nextBytes(body)
      val nal = Array((3 << 5 | t).toByte) ++ body
      val r = scala.util.Try {
        if (t == H264.NalSps) { H264.parseSps(nal); () }
        else H264.decodeNals(Seq(H264.encodeSpsNal(16, 16),
          H264.encodePpsNal(), nal))
      }
      // some random SPS bodies can legitimately parse; decode of random
      // slice data must fail (the I_PCM walk demands mb_type 25 and
      // enough raw bytes) — either way nothing hangs or allocates big
      if (t == H264.NalIdr) assert(r.isFailure, "garbage slice accepted")
    }
  }

  test("synthetic H.264-in-MP4: avcC + samples decode to the id arithmetic") {
    for (id <- Seq(0L, 1L, 7L, 38L, 123L)) {
      val bytes = SyntheticMedia.h264Mp4Bytes(id)
      // the JPEG walker must NOT claim this track
      assert(Multimodal.mp4VideoSamples(bytes).isEmpty)
      val Some((sps, pps, lenSize, samples)) = Multimodal.mp4Avc1Track(bytes)
      assert(samples.length == SyntheticMedia.h264FrameCount(id))
      val frames = samples.flatMap(s =>
        H264.decodeNals(Seq(sps, pps) ++ Multimodal.avccNals(s, lenSize)))
      assert(frames.length == samples.length)
      frames.zipWithIndex.foreach { case (f, i) =>
        assert(f.width == SyntheticMedia.h264FrameW(id))
        assert(f.height == SyntheticMedia.h264FrameH(id))
        val want = SyntheticMedia.h264FrameLuma(id, i).toByte
        assert(f.y.forall(_ == want), s"frame $i luma plane")
        assert(f.cb.forall(_ == 128.toByte) && f.cr.forall(_ == 128.toByte))
      }
    }
  }

  test("Mp4FrameDecoder pools real H.264 pixels (no stub fallback)") {
    val id = 11L
    val bytes = SyntheticMedia.h264Mp4Bytes(id)
    val meta = Multimodal.parseMeta(bytes)
    val feats = Mp4FrameDecoder.decodeBatch(Seq((meta, bytes))).head
    val n = SyntheticMedia.h264FrameCount(id)
    // feature layout: nTotal/1000, w/4096, h/4096, meanR, meanG, meanB,
    // meanLuma, motion — with constant grey frames R=G=B=luma exactly
    assert(math.abs(feats(0) - n / 1000f) < 1e-6)
    assert(math.abs(feats(1) - SyntheticMedia.h264FrameW(id) / 4096f) < 1e-6)
    assert(math.abs(feats(2) - SyntheticMedia.h264FrameH(id) / 4096f) < 1e-6)
    val lumas = (0 until n).map(i => SyntheticMedia.h264FrameLuma(id, i) / 255.0)
    assert(math.abs(feats(6) - lumas.sum / n) < 1e-5, "pooled mean luma")
    val motion = lumas.sliding(2).map { case Seq(a, b) => math.abs(b - a) }
      .sum / (n - 1)
    assert(math.abs(feats(7) - motion) < 1e-5, "luma motion")
  }
}
