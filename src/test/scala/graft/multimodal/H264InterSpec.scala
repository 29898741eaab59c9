package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the P-slice machinery: the inter CBP table must be a
  * permutation (a mistranscription cannot be one), the §8.4.1.3 median
  * predictor and §8.4.1.1 skip rule on hand-built neighbor states, and
  * the loud sub-pel rejection (the subset boundary must be an error,
  * never an approximation). */
class H264InterSpec extends AnyFunSuite {

  test("the inter coded_block_pattern table is a permutation of 0..47") {
    assert(H264Inter.CbpInter.sorted.toSeq == (0 until 48),
      H264Inter.CbpInter.mkString(","))
    // and distinct from the intra column (same values, different order)
    assert(!java.util.Arrays.equals(H264Inter.CbpInter, H264Intra.CbpIntra))
  }

  test("mv prediction: median, single-match shortcut, edge special cases") {
    val mot = new H264Inter.Motion(3, 3)
    // first MB: nothing available → (0,0)
    assert(H264Inter.mvPred16x16(mot, 0, 0) == ((0, 0)))
    mot.set(0, 0, 8, 4, 1)
    // (1,0): row 0 → B/C/D outside; A available → mvA
    assert(H264Inter.mvPred16x16(mot, 1, 0) == ((8, 4)))
    mot.set(1, 0, 16, -8, 1)
    mot.set(2, 0, -4, 12, 1)
    // (0,1): A outside (ref −1), B=(8,4), C=(16,−8) → two matches →
    // median with A=(0,0): x med(0,8,16)=8, y med(0,4,−8)=0
    assert(H264Inter.mvPred16x16(mot, 0, 1) == ((8, 0)))
    mot.set(0, 1, 8, 0, 1)
    // (1,1): A=(8,0) B=(16,−8) C=(−4,12) all match → median (8, 0)
    assert(H264Inter.mvPred16x16(mot, 1, 1) == ((8, 0)))
    // intra neighbor drops out: make B intra → exactly A and C match →
    // median with B=(0,0): med(8,0,−4)=0, med(0,0,12)=0
    mot.set(1, 0, 0, 0, 2)
    assert(H264Inter.mvPred16x16(mot, 1, 1) == ((0, 0)))
    // single-match shortcut: only A inter
    mot.set(2, 0, 0, 0, 2)
    assert(H264Inter.mvPred16x16(mot, 1, 1) == ((8, 0)))
  }

  test("skip vector: zero at edges and next to stationary neighbors") {
    val mot = new H264Inter.Motion(3, 2)
    assert(H264Inter.skipMv(mot, 0, 0) == ((0, 0))) // A unavailable
    mot.set(0, 0, 8, 8, 1); mot.set(1, 0, 8, 8, 1); mot.set(2, 0, 8, 8, 1)
    assert(H264Inter.skipMv(mot, 0, 1) == ((0, 0))) // A unavailable (col 0)
    mot.set(0, 1, 8, 8, 1)
    // both neighbors moving → the 16x16 predictor
    assert(H264Inter.skipMv(mot, 1, 1) == ((8, 8)))
    // a stationary inter neighbor forces zero
    mot.set(1, 0, 0, 0, 1)
    assert(H264Inter.skipMv(mot, 1, 1) == ((0, 0)))
  }

  test("half-pel MC over a step edge matches the 6-tap filter computed independently") {
    // reference: an I_PCM frame with a vertical step edge in luma
    val w = 16; val h = 16
    val refY = Array.tabulate(w * h)(i =>
      (if (i % w < 8) 0 else 255).toByte)
    val flat = Array.fill(w * h / 4)(128.toByte)
    val idr = H264.encodeIdrIPcmNal(
      H264.Frame(w, h, refY, flat.clone(), flat.clone()))
    // P frame: one MB, mv = (2, 0) — the pure half-horizontal position
    val zeroCd = Array.fill(2)(new Array[Int](4))
    val zeroCa = Array.fill(2, 4)(new Array[Int](16))
    val pNal = H264Inter.encodePSliceNal(1, 1, 1, 26, 0,
      Seq(H264Inter.P16Choice(2, 0, Array.fill(16)(new Array[Int](16)),
        0, 0, zeroCd, zeroCa)))
    val frames = H264.decodeNals(
      Seq(H264.encodeSpsNal(w, h), H264.encodePpsNal(), idr, pNal))
    assert(frames.size == 2)
    // independent expectation: clip((E - 5F + 20G + 20H - 5I + J + 16) >> 5)
    // with edge-clamped fetches
    def px(x: Int, y: Int): Int = refY(y * w + math.max(0, math.min(w - 1, x))) & 0xff
    for (y <- 0 until h; x <- 0 until w) {
      val want = math.max(0, math.min(255,
        (px(x - 2, y) - 5 * px(x - 1, y) + 20 * px(x, y) + 20 * px(x + 1, y)
          - 5 * px(x + 2, y) + px(x + 3, y) + 16) >> 5))
      assert((frames(1).y(y * w + x) & 0xff) == want, s"($x,$y)")
    }
  }

  test("quarter-pel vectors decode (every phase is a real code path, not a refusal)") {
    val zeroCd = Array.fill(2)(new Array[Int](4))
    val zeroCa = Array.fill(2, 4)(new Array[Int](16))
    val rnd = new scala.util.Random(9L)
    val refY = Array.tabulate(256)(_ => (rnd.nextInt(256) - 128).toByte)
    val flat = Array.fill(64)(128.toByte)
    val idr = H264.encodeIdrIPcmNal(
      H264.Frame(16, 16, refY, flat.clone(), flat.clone()))
    for (fx <- 0 to 3; fy <- 0 to 3) {
      val pNal = H264Inter.encodePSliceNal(1, 1, 1, 26, 0,
        Seq(H264Inter.P16Choice(-4 + fx, 4 + fy,
          Array.fill(16)(new Array[Int](16)), 0, 0, zeroCd, zeroCa)))
      val frames = H264.decodeNals(
        Seq(H264.encodeSpsNal(16, 16), H264.encodePpsNal(), idr, pNal))
      assert(frames.size == 2, s"phase ($fx,$fy)")
    }
  }

  test("non-reference P slices (nal_ref_idc = 0) are outside the subset, loudly") {
    // decodeNals keeps every decoded picture as THE reference; a
    // conformant non-reference P frame must therefore be rejected, not
    // silently promoted to a reference later P slices would use
    val zeroCd = Array.fill(2)(new Array[Int](4))
    val zeroCa = Array.fill(2, 4)(new Array[Int](16))
    val flat = Array.fill(64)(128.toByte)
    val idr = H264.encodeIdrIPcmNal(
      H264.Frame(16, 16, Array.fill(256)(77.toByte), flat.clone(), flat.clone()))
    val pNal = H264Inter.encodePSliceNal(1, 1, 1, 26, 0,
      Seq(H264Inter.P16Choice(0, 0, Array.fill(16)(new Array[Int](16)),
        0, 0, zeroCd, zeroCa)))
    // same NAL with nal_ref_idc forced to 0 (header byte keeps type 1)
    val nonRef = pNal.clone(); nonRef(0) = (nonRef(0) & 0x1f).toByte
    val ok = H264.decodeNals(
      Seq(H264.encodeSpsNal(16, 16), H264.encodePpsNal(), idr, pNal))
    assert(ok.size == 2)
    val e = intercept[IllegalArgumentException](H264.decodeNals(
      Seq(H264.encodeSpsNal(16, 16), H264.encodePpsNal(), idr, nonRef)))
    assert(e.getMessage.contains("non-reference"), e.getMessage)
  }

  test("the 16x8/8x16 directional predictors prefer B/A/A/C respectively") {
    // left MB inter (8,4); above MB inter (−4, 12); current MB partitions
    val mot = new H264Inter.Motion(3, 3)
    mot.set(0, 1, 8, 4, 1)   // A neighbor MB of current (1,1)
    mot.set(1, 0, -4, 12, 1) // B neighbor MB
    mot.set(2, 0, 16, 0, 1)  // C neighbor MB (up-right)
    val bx0 = 4; val by0 = 4 // current MB (1,1)
    // 16x8 top prefers B
    assert(H264Inter.mvPredPartition(mot, bx0, by0, 4, 2,
      H264Inter.Part16x8Top) == ((-4, 12)))
    // 8x16 left prefers A
    assert(H264Inter.mvPredPartition(mot, bx0, by0, 2, 4,
      H264Inter.Part8x16Left) == ((8, 4)))
    // 8x16 right prefers C (block above-right of the right partition =
    // the C neighbor MB)
    assert(H264Inter.mvPredPartition(mot, bx0 + 2, by0, 2, 4,
      H264Inter.Part8x16Right) == ((16, 0)))
    // decode the top partition, then the bottom 16x8 prefers A (the
    // left MB), not the freshly decoded top partition above it
    mot.setRect(bx0, by0, 4, 2, 20, 20, 1)
    assert(H264Inter.mvPredPartition(mot, bx0, by0 + 2, 4, 2,
      H264Inter.Part16x8Bottom) == ((8, 4)))
    // directional MISS (A intra) falls back to the general process:
    // B = the freshly decoded top partition (20,20); C at (8,5) sits in
    // the undecoded right MB → D substitution → the (now intra) left MB
    // → B is the single matching reference → (20,20)
    mot.set(0, 1, 0, 0, 2)
    assert(H264Inter.mvPredPartition(mot, bx0, by0 + 2, 4, 2,
      H264Inter.Part16x8Bottom) == ((20, 20)))
  }

  test("I_PCM inside P and B-form sub_mb_types are outside the subset, loudly") {
    val sps16 = H264.encodeSpsNal(16, 16)
    val zeroCd = Array.fill(2)(new Array[Int](4))
    val zeroCa = Array.fill(2, 4)(new Array[Int](16))
    val idr = H264.encodeIdrCavlcNal(1, 1, 26, 0, Seq(H264Intra.I16Choice(
      2, cbpLumaAc = false, 0, 0, new Array[Int](16),
      Array.fill(16)(new Array[Int](16)), zeroCd, zeroCa)))
    def pSlice(body: H264.BitWriter => Unit): Array[Byte] = {
      val bw = new H264.BitWriter
      bw.ue(0); bw.ue(5); bw.ue(0); bw.u(1, 4)
      bw.u(0, 1); bw.u(0, 1); bw.u(0, 1)
      bw.se(0)
      bw.ue(0) // mb_skip_run
      body(bw)
      bw.trailing()
      H264.nonIdrNal(bw.toArray)
    }
    // I_PCM in a P slice (mb_type 30)
    val e1 = intercept[IllegalArgumentException] {
      H264.decodeNals(Seq(sps16, H264.encodePpsNal(), idr,
        pSlice(bw => bw.ue(30))))
    }
    assert(e1.getMessage.contains("subset") || e1.getMessage.contains("mb_type"),
      e1.getMessage)
    // P_8x8 with a sub_mb_type outside 0..3 (a B-slice form)
    val e2 = intercept[IllegalArgumentException] {
      H264.decodeNals(Seq(sps16, H264.encodePpsNal(), idr,
        pSlice { bw => bw.ue(3); bw.ue(4) }))
    }
    assert(e2.getMessage.contains("sub_mb_type"), e2.getMessage)
  }

  test("a P_8x8 MB with per-sub-partition vectors round-trips encode → decode") {
    val zeroCd = Array.fill(2)(new Array[Int](4))
    val zeroCa = Array.fill(2, 4)(new Array[Int](16))
    val rnd = new scala.util.Random(11L)
    val refY = Array.tabulate(256)(_ => (rnd.nextInt(256) - 128).toByte)
    val flat = Array.fill(64)(128.toByte)
    val idr = H264.encodeIdrIPcmNal(
      H264.Frame(16, 16, refY, flat.clone(), flat.clone()))
    val choice = H264Inter.P8x8Choice(
      subTypes = Array(0, 1, 2, 3),
      mvs = Seq(Seq((5, -3)), Seq((0, 0), (-7, 2)), Seq((4, 4), (1, -1)),
        Seq((2, 0), (0, 2), (-2, 0), (3, 3))),
      luma = Array.fill(16)(new Array[Int](16)),
      cbpChroma = 0, qpDelta = 0, chromaDc = zeroCd, chromaAc = zeroCa)
    val pNal = H264Inter.encodePSliceNal(1, 1, 1, 26, 0, Seq(choice))
    val frames = H264.decodeNals(
      Seq(H264.encodeSpsNal(16, 16), H264.encodePpsNal(), idr, pNal))
    assert(frames.size == 2)
    // the 8x8 sub-partition with mv (0,0) must be an exact copy of the
    // reference region (top-right 8x8, upper 8x4)
    for (y <- 0 until 4; x <- 8 until 16)
      assert(frames(1).y(y * 16 + x) == refY(y * 16 + x), s"($x,$y)")
  }
}
