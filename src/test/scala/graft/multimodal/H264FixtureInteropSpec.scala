package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation check for the H.264 I_PCM subset.
  * `scripts/h264_fixture_gen.py` is a SECOND, independent encoding of
  * the same public spec text (NAL/emulation prevention, Exp-Golomb,
  * baseline SPS with cropping, CAVLC PPS, I_PCM slices), sharing no
  * code with [[H264]]. Its committed byte fixtures are held against the
  * Scala side in BOTH directions — the decoder must recover pixel-exact
  * planes from the Python bytes, and the encoder must reproduce the
  * Python bytes exactly (the subset fixes every header field, so two
  * correct implementations are byte-equal). An Exp-Golomb length bug or
  * a wrong crop unit that cancels between H264's own encoder and
  * decoder cannot cancel against an implementation in another
  * language — the same discipline as `KafkaFixtureInteropSpec`. */
class H264FixtureInteropSpec extends AnyFunSuite {

  private lazy val fx: Map[String, Array[Byte]] = {
    val in = getClass.getResourceAsStream("/h264_ipcm_fixtures.txt")
    assert(in != null, "h264_ipcm_fixtures.txt missing — run scripts/h264_fixture_gen.py")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { l =>
      val Array(name, hex) = l.trim.split(" ", 2)
      name -> hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }.toMap
    finally src.close()
  }

  private val W = 18
  private val H = 22
  // the fixture generator's stated pixel formulas, re-derived here
  private def formulaFrame: H264.Frame = {
    val y = Array.tabulate(W * H)(i => ((7 * i + 3) % 256).toByte)
    val cb = Array.tabulate(W / 2 * (H / 2))(i => ((5 * i + 11) % 256).toByte)
    val cr = Array.tabulate(W / 2 * (H / 2))(i => ((3 * i + 29) % 256).toByte)
    H264.Frame(W, H, y, cb, cr)
  }

  test("Scala decoder recovers pixel-exact planes from the Python bytes") {
    val frames = H264.decodeNals(Seq(
      fx("sps_18x22"), fx("pps"), fx("idr_18x22_formula")))
    assert(frames.length == 1)
    val f = frames.head
    val want = formulaFrame
    assert(f.width == W && f.height == H)
    assert(java.util.Arrays.equals(f.y, want.y), "luma plane")
    assert(java.util.Arrays.equals(f.cb, want.cb), "cb plane")
    assert(java.util.Arrays.equals(f.cr, want.cr), "cr plane")
  }

  test("Scala encoder reproduces the Python bytes exactly") {
    assert(java.util.Arrays.equals(H264.encodeSpsNal(W, H), fx("sps_18x22")),
      "SPS bytes differ from the spec-derived encoding")
    assert(java.util.Arrays.equals(H264.encodePpsNal(), fx("pps")),
      "PPS bytes differ from the spec-derived encoding")
    assert(java.util.Arrays.equals(
      H264.encodeIdrIPcmNal(formulaFrame), fx("idr_18x22_formula")),
      "IDR I_PCM bytes differ from the spec-derived encoding")
  }

  test("the zero-plane wall (dense emulation prevention) matches both ways") {
    val zero = H264.Frame(16, 16, new Array[Byte](256),
      new Array[Byte](64), new Array[Byte](64))
    assert(java.util.Arrays.equals(H264.encodeSpsNal(16, 16), fx("sps_16x16")))
    assert(java.util.Arrays.equals(
      H264.encodeIdrIPcmNal(zero), fx("idr_16x16_zero")),
      "zero-plane IDR differs — emulation-prevention placement disagrees")
    val f = H264.decodeNals(Seq(
      fx("sps_16x16"), fx("pps"), fx("idr_16x16_zero"))).head
    assert(f.y.forall(_ == 0) && f.cb.forall(_ == 0) && f.cr.forall(_ == 0))
  }
}
