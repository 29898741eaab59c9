package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Unit checks of the B-slice machinery against independently-computed
  * expectations (no fixture files): the default bi-prediction average,
  * per-list prediction through the B paths, spatial-direct derivation
  * cases, colZero behavior, and the loud subset refusals. */
class H264BInterSpec extends AnyFunSuite {

  private val zeroCd = Array.fill(2)(new Array[Int](4))
  private val zeroCa = Array.fill(2, 4)(new Array[Int](16))
  private def noLuma = Array.fill(16)(new Array[Int](16))

  /** IDR (gradient) + P (uniform DC shift over zero-motion MC) — the
    * two references every test stream starts from: ref0 (newer) =
    * gradient + 4·shift, ref1 (older) = gradient. */
  private def gopPrefix(w: Int, h: Int, shift: Int): Seq[Array[Byte]] = {
    val grad = Array.tabulate(w * h)(i => ((i % w) * 3 + (i / w) * 5).toByte)
    val flat = Array.fill(w * h / 4)(128.toByte)
    val idr = H264.encodeIdrIPcmNal(
      H264.Frame(w, h, grad, flat.clone(), flat.clone()))
    val pLuma = Array.fill(16) {
      val a = new Array[Int](16); a(0) = shift; a
    }
    val mbW = w / 16; val mbH = h / 16
    // QP 28 (26 + 2): a DC level c dequantizes so the constant inverse
    // transform adds exactly 4·c per pixel — the m13 oracle algebra
    val p = H264Inter.encodePSliceNal(mbW, mbH, 1, 26, 2,
      Seq.fill(mbW * mbH)(H264Inter.P16Choice(0, 0, pLuma, 0, 0,
        zeroCd, zeroCa)))
    Seq(H264.encodeSpsNal(w, h, numRefFrames = 2), H264.encodePpsNal(),
      idr, p)
  }

  private def decodeWithB(w: Int, h: Int, shift: Int,
                          choices: Seq[H264BInter.BMbChoice],
                          colZero: (Int, Int) => Boolean = (_, _) => false)
      : Seq[H264.Frame] =
    H264.decodeNals(gopPrefix(w, h, shift) :+
      H264BInter.encodeBSliceNal(w / 16, h / 16, 2, 26, 0, choices, colZero))

  test("B_Bi averages the two full interpolations ((p0 + p1 + 1) >> 1)") {
    // ref1 = gradient G, ref0 = G + 4·3; B_Bi with zero vectors must
    // land on (G + 12 + G + 1) >> 1 per pixel — computed independently
    val frames = decodeWithB(16, 16, 3,
      Seq(H264BInter.B16Choice(2, (0, 0), (0, 0), noLuma, 0, 0,
        zeroCd, zeroCa)))
    assert(frames.size == 3)
    val g = frames(0).y; val out = frames(2).y
    for (i <- 0 until 256) {
      val p0 = math.min(255, (g(i) & 0xff) + 12)
      val p1 = g(i) & 0xff
      assert((out(i) & 0xff) == ((p0 + p1 + 1) >> 1), s"pixel $i")
    }
    // chroma: both refs at 128 → average 128
    assert(frames(2).cb.forall(_ == 128.toByte))
  }

  test("B_L0 predicts from the newer reference, B_L1 from the older") {
    val l0 = decodeWithB(16, 16, 3,
      Seq(H264BInter.B16Choice(0, (0, 0), (0, 0), noLuma, 0, 0,
        zeroCd, zeroCa)))
    assert(java.util.Arrays.equals(l0(2).y, l0(1).y), "L0 != P frame")
    val l1 = decodeWithB(16, 16, 3,
      Seq(H264BInter.B16Choice(1, (0, 0), (0, 0), noLuma, 0, 0,
        zeroCd, zeroCa)))
    assert(java.util.Arrays.equals(l1(2).y, l1(0).y), "L1 != IDR frame")
  }

  test("B_L1 quarter-pel MC matches the 6-tap filter computed independently") {
    // step-edge IDR as list1; L1 with mv (2, 0) is the pure half-horiz
    // position — the same independent expectation as the P-slice test,
    // now through the B path and the OLDER reference
    val w = 16; val h = 16
    val stepY = Array.tabulate(w * h)(i => (if (i % w < 8) 0 else 255).toByte)
    val flat = Array.fill(w * h / 4)(128.toByte)
    val idr = H264.encodeIdrIPcmNal(
      H264.Frame(w, h, stepY, flat.clone(), flat.clone()))
    val p = H264Inter.encodePSliceNal(1, 1, 1, 26, 0,
      Seq(H264Inter.P16Choice(0, 0, noLuma, 0, 0, zeroCd, zeroCa)))
    val b = H264BInter.encodeBSliceNal(1, 1, 2, 26, 0,
      Seq(H264BInter.B16Choice(1, (0, 0), (2, 0), noLuma, 0, 0,
        zeroCd, zeroCa)), (_, _) => false)
    val frames = H264.decodeNals(
      Seq(H264.encodeSpsNal(w, h, 2), H264.encodePpsNal(), idr, p, b))
    def px(x: Int, y: Int): Int =
      stepY(y * w + math.max(0, math.min(w - 1, x))) & 0xff
    for (y <- 0 until h; x <- 0 until w) {
      val want = math.max(0, math.min(255,
        (px(x - 2, y) - 5 * px(x - 1, y) + 20 * px(x, y) + 20 * px(x + 1, y)
          - 5 * px(x + 2, y) + px(x + 3, y) + 16) >> 5))
      assert((frames(2).y(y * w + x) & 0xff) == want, s"($x,$y)")
    }
  }

  test("direct with no inter neighbors is zero-mv bi-prediction") {
    // a 1-MB B frame whose only MB is B_Direct: directZeroPrediction →
    // both lists at zero vectors → the bi average
    val frames = decodeWithB(16, 16, 3,
      Seq(H264BInter.BDirectChoice(noLuma, 0, 0, zeroCd, zeroCa)))
    val g = frames(0).y; val out = frames(2).y
    for (i <- 0 until 256) {
      val p0 = math.min(255, (g(i) & 0xff) + 12)
      assert((out(i) & 0xff) == ((p0 + (g(i) & 0xff) + 1) >> 1), s"pixel $i")
    }
  }

  test("colZero zeroes a direct MB's vectors exactly where the colocated moved little") {
    // GOP: IDR(G), P1(mv stationary-or-moving, +8), P2(mv 0, +4), B.
    // The B's colocated picture is P1 (RefPicList1[0]); its motion
    // decides colZero. MB0 = B_Bi with vector (4, 0) — the direct MB1
    // inherits it through the B/C/D-unavailable → A rule, and colZero
    // then zeroes it exactly when P1 was (near-)stationary.
    val w = 32; val h = 16
    val grad = Array.tabulate(w * h)(i => ((i % w) * 3 + (i / w) * 5).toByte)
    def run(p1Mv: (Int, Int)): (Seq[H264.Frame], Seq[H264.Frame] => Unit) = {
      val flat = Array.fill(w * h / 4)(128.toByte)
      val idr = H264.encodeIdrIPcmNal(
        H264.Frame(w, h, grad.clone(), flat.clone(), flat.clone()))
      def pLuma(s: Int) = Array.fill(16) {
        val a = new Array[Int](16); a(0) = s; a
      }
      val (p1, p1Mot) = H264Inter.encodePSliceNalWithMotion(2, 1, 1, 26, 0,
        Seq.fill(2)(H264Inter.P16Choice(p1Mv._1, p1Mv._2, pLuma(2), 0, 0,
          zeroCd, zeroCa)))
      val p2 = H264Inter.encodePSliceNal(2, 1, 2, 26, 0,
        Seq.fill(2)(H264Inter.P16Choice(0, 0, pLuma(1), 0, 0,
          zeroCd, zeroCa)))
      val b = H264BInter.encodeBSliceNal(2, 1, 3, 26, 0, Seq(
        H264BInter.B16Choice(2, (4, 0), (4, 0), noLuma, 0, 0, zeroCd, zeroCa),
        H264BInter.BDirectChoice(noLuma, 0, 0, zeroCd, zeroCa)),
        H264BInter.colZeroOf(Some(p1Mot)))
      (H264.decodeNals(Seq(H264.encodeSpsNal(w, h, 2), H264.encodePpsNal(),
        idr, p1, p2, b)), null)
    }
    // stationary P1: colZero = true → MB1's direct vector is FORCED to
    // zero → pred(x) = (P2(x) + P1(x) + 1) >> 1, independent closed form
    val (still, _) = run((0, 0))
    val p1s = still(1).y; val p2s = still(2).y
    for (y <- 0 until 16; x <- 16 until 32) {
      val want = ((p2s(y * w + x) & 0xff) + (p1s(y * w + x) & 0xff) + 1) >> 1
      assert((still(3).y(y * w + x) & 0xff) == want, s"still ($x,$y)")
    }
    // moving P1 (|mv| > 1): colZero = false → MB1 keeps the inherited
    // (4, 0) = one-pixel shift → pred(x) = avg of both refs at x + 1
    val (moving, _) = run((8, 0))
    val p1m = moving(1).y; val p2m = moving(2).y
    def at(p: Array[Byte], x: Int, y: Int): Int =
      p(y * w + math.max(0, math.min(w - 1, x))) & 0xff
    for (y <- 0 until 16; x <- 16 until 32) {
      val want = (at(p2m, x + 1, y) + at(p1m, x + 1, y) + 1) >> 1
      assert((moving(3).y(y * w + x) & 0xff) == want, s"moving ($x,$y)")
    }
  }

  test("out-of-subset B forms are refused loudly") {
    val pre = gopPrefix(16, 16, 0)
    def bNal(body: H264.BitWriter => Unit): Array[Byte] = {
      val bw = new H264.BitWriter
      bw.ue(0); bw.ue(6); bw.ue(0); bw.u(2, 4) // header through frame_num
      body(bw)
      bw.trailing()
      H264.nonRefNonIdrNal(bw.toArray)
    }
    // temporal direct (direct_spatial_mv_pred_flag = 0)
    val temporal = bNal { bw =>
      bw.u(0, 1); bw.u(0, 1); bw.u(0, 1); bw.u(0, 1); bw.se(0)
    }
    val e1 = intercept[IllegalArgumentException](
      H264.decodeNals(pre :+ temporal))
    assert(e1.getMessage.contains("temporal"), e1.getMessage)
    // two-partition mb_type (4 = B_L0_L0_16x8)
    val twoPart = bNal { bw =>
      bw.u(1, 1); bw.u(0, 1); bw.u(0, 1); bw.u(0, 1); bw.se(0)
      bw.ue(0) // skip run
      bw.ue(4) // mb_type
    }
    val e2 = intercept[IllegalArgumentException](
      H264.decodeNals(pre :+ twoPart))
    assert(e2.getMessage.contains("mb_type 4"), e2.getMessage)
    // I_PCM inside B (mb_type 23 + 25 = 48)
    val ipcm = bNal { bw =>
      bw.u(1, 1); bw.u(0, 1); bw.u(0, 1); bw.u(0, 1); bw.se(0)
      bw.ue(0); bw.ue(48)
    }
    val e3 = intercept[IllegalArgumentException](
      H264.decodeNals(pre :+ ipcm))
    assert(e3.getMessage.contains("I_PCM"), e3.getMessage)
    // a REFERENCE B slice (nal_ref_idc != 0)
    val b = H264BInter.encodeBSliceNal(1, 1, 2, 26, 0,
      Seq(H264BInter.BSkip), (_, _) => false)
    val refB = b.clone(); refB(0) = (0x40 | (refB(0) & 0x1f)).toByte
    val e4 = intercept[IllegalArgumentException](
      H264.decodeNals(pre :+ refB))
    assert(e4.getMessage.contains("reference B"), e4.getMessage)
    // a B slice with only one prior reference (IDR alone)
    val e5 = intercept[RuntimeException](
      H264.decodeNals(pre.take(3) :+ b))
    assert(e5.getMessage.contains("reference"), e5.getMessage)
  }
}
