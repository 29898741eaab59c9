package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation B-slice check, both directions — the
  * [[H264InterInteropSpec]] discipline applied to bi-prediction.
  * `scripts/h264_cavlc_fixture_gen.py` (B section) independently
  * encodes IDR+P(+P)+B sequences and reconstructs every frame with its
  * own spatial-direct derivation / per-list mv prediction / default
  * bi-prediction arithmetic:
  *
  *  - DECODE: `H264.decodeNals` over the Python NAL sequence must
  *    recover every Python-computed frame pixel-exactly — mixed
  *    B_Bi/B_Direct/B_L0/B_Skip/B_L1/intra macroblocks, quarter-pel
  *    phase pairs differing per list, one-list direct neighborhoods,
  *    per-4×4 colZeroFlag overrides off a real colocated P motion
  *    field, and an all-skip B picture;
  *  - ENCODE: `H264BInter.encodeBSliceNal` over the SAME recipe
  *    (restated below) must reproduce the Python bytes exactly.
  */
class H264BInterInteropSpec extends AnyFunSuite {

  private case class Fx(name: String, mbW: Int, mbH: Int,
                        nals: Seq[Array[Byte]], y: Seq[Array[Byte]],
                        cb: Seq[Array[Byte]], cr: Seq[Array[Byte]])

  private lazy val fixtures: Seq[Fx] = {
    val in = getClass.getResourceAsStream("/h264_b_fixtures.txt")
    assert(in != null,
      "h264_b_fixtures.txt missing — run scripts/h264_cavlc_fixture_gen.py")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def multi(s: String): Seq[Array[Byte]] = s.split(',').toSeq.map(hex)
    try src.getLines().map { l =>
      val p = l.trim.split(" ")
      Fx(p(0), p(1).toInt, p(2).toInt, multi(p(3)), multi(p(4)),
        multi(p(5)), multi(p(6)))
    }.toSeq
    finally src.close()
  }

  // ---- the shared recipe (formula-identical to the Python script) ------

  private def i4Levels(k: Int, m: Int): Array[Int] = {
    val lv = new Array[Int](16)
    for (p <- 0 until 16 if (p * 7 + k * 3 + m * 5) % 6 == 0) {
      var v = ((p + k + m) % 5) - 2
      if (v == 0) v = 1
      if (p == 0) v *= 3
      lv(p) = v
    }
    lv
  }

  private def i4MidLevels(k: Int, m: Int): Array[Int] = {
    val lv = new Array[Int](16)
    for (p <- 0 until 16 if (p + k + m) % 3 == 0) {
      var v = ((p + 2 * k + m) % 7) - 3
      if (v == 0) v = -2
      lv(p) = v
    }
    lv
  }

  private def i16DcLevels(m: Int): Array[Int] = {
    val lv = new Array[Int](16)
    for (p <- 0 until 16 if (p * 5 + m * 7) % 7 == 0) {
      var v = ((p + m) % 7) - 3
      if (v == 0) v = 2
      lv(p) = v
    }
    lv
  }

  private def chromaDcLevels(c: Int, m: Int): Array[Int] = {
    val lv = new Array[Int](4)
    for (p <- 0 until 4 if (p + c + m) % 2 == 0) {
      var v = ((p + c + m) % 3) - 1
      if (v == 0) v = 1
      lv(p) = v
    }
    lv
  }

  private def chromaAcLevels(c: Int, b: Int, m: Int): Array[Int] = {
    val lv = new Array[Int](16)
    for (p <- 1 until 16 if (p * 5 + b * 3 + c + m * 7) % 9 == 0) {
      var v = ((p + b + c + m) % 5) - 2
      if (v == 0) v = -1
      lv(p) = v
    }
    lv
  }

  private val ModeNeeds: Map[Int, Set[String]] = Map(
    0 -> Set("up"), 1 -> Set("left"), 2 -> Set.empty, 3 -> Set("up"),
    4 -> Set("up", "left", "upleft"), 5 -> Set("up", "left", "upleft"),
    6 -> Set("up", "left", "upleft"), 7 -> Set("up"), 8 -> Set("left"))

  private def blockAvail(mbW: Int, mbH: Int, mx: Int, my: Int, k: Int,
                         bx: Int, by: Int): Boolean = {
    if (bx < 0 || by < 0 || bx >= mbW * 4 || by >= mbH * 4) false
    else {
      val nmx = bx / 4; val nmy = by / 4
      if (nmy < my || (nmy == my && nmx < mx)) true
      else if (nmx == mx && nmy == my)
        H264Intra.Blk4x4Pos.indexOf((bx % 4, by % 4)) < k
      else false
    }
  }

  private def i4Modes(mbW: Int, mbH: Int, mx: Int, my: Int, m: Int): Array[Int] =
    Array.tabulate(16) { k =>
      val (x4, y4) = H264Intra.Blk4x4Pos(k)
      val bx = mx * 4 + x4; val by = my * 4 + y4
      val avail = Map(
        "left" -> blockAvail(mbW, mbH, mx, my, k, bx - 1, by),
        "up" -> blockAvail(mbW, mbH, mx, my, k, bx, by - 1),
        "upleft" -> blockAvail(mbW, mbH, mx, my, k, bx - 1, by - 1))
      val legal = (0 until 9).filter(mo => ModeNeeds(mo).forall(avail(_)))
      legal((k * 3 + m * 5) % legal.size)
    }

  private def chroma(m: Int, cbpChroma: Int): (Array[Array[Int]], Array[Array[Array[Int]]]) = (
    Array.tabulate(2)(c =>
      if (cbpChroma != 0) chromaDcLevels(c, m) else new Array[Int](4)),
    Array.tabulate(2, 4)((c, b) =>
      if (cbpChroma == 2) chromaAcLevels(c, b, m) else new Array[Int](16)))

  private def i4Choice(mbW: Int, mbH: Int, mx: Int, my: Int, m: Int,
                       cbpChroma: Int, qpDelta: Int,
                       chromaMode: Int): H264Intra.I4Choice = {
    val (cd, ca) = chroma(m, cbpChroma)
    H264Intra.I4Choice(i4Modes(mbW, mbH, mx, my, m), cbpChroma, qpDelta,
      Array.tabulate(16)(k => i4Levels(k, m)), cd, ca, chromaMode)
  }

  private def i16Choice(m: Int): H264Intra.I16Choice =
    H264Intra.I16Choice(2, cbpLumaAc = false, 0, 0, i16DcLevels(m),
      Array.fill(16)(new Array[Int](16)),
      Array.fill(2)(new Array[Int](4)),
      Array.fill(2, 4)(new Array[Int](16)), 0)

  private def p16Luma(k: Int, m: Int): Array[Int] =
    if (((k >> 2) + m) % 2 == 1) new Array[Int](16) else i4MidLevels(k, m)

  private def b16Spec(m: Int, t: Int, mode: Int): H264BInter.B16Choice = {
    val (cd, ca) = chroma(m + t, (m + t) % 3)
    H264BInter.B16Choice(mode,
      mv0 = ((m * 5 + t) % 13 - 6, (m * 3 + 2 * t) % 13 - 6),
      mv1 = ((m * 7 + 3 * t) % 13 - 6, (m + 5 * t) % 13 - 6),
      luma = Array.tabulate(16)(k => p16Luma(k, m + t)),
      cbpChroma = (m + t) % 3, qpDelta = (t % 3) - 1,
      chromaDc = cd, chromaAc = ca)
  }

  private def bDirectSpec(m: Int, t: Int): H264BInter.BDirectChoice = {
    val (cd, ca) = chroma(m + t, (m + t) % 3)
    H264BInter.BDirectChoice(
      luma = Array.tabulate(16)(k => p16Luma(k, m + t)),
      cbpChroma = (m + t) % 3, qpDelta = (t % 3) - 1,
      chromaDc = cd, chromaAc = ca)
  }

  private def bMixedFrame(t: Int): Seq[H264BInter.BMbChoice] =
    (0 until 4).map { m =>
      val role = (m + 2 * t) % 6
      if (m == 0 || role == 0) b16Spec(m, t, 2)
      else role match {
        case 1 => bDirectSpec(m, t)
        case 2 => b16Spec(m, t, 0)
        case 3 => H264BInter.BSkip
        case 4 => b16Spec(m, t, 1)
        case _ => H264BInter.BIntraChoice(i16Choice(m + t))
      }
    }

  private def bSubpelFrame(t: Int): Seq[H264BInter.BMbChoice] =
    (0 until 4).map { m =>
      val i = (t - 1) * 4 + m
      val base = b16Spec(m, t, 2)
      base.copy(
        mv0 = (4 * ((m + t) % 3 - 1) + (i & 3),
          4 * ((2 * m + t) % 3 - 1) + ((i >> 2) & 3)),
        mv1 = (4 * ((m + 2 * t) % 3 - 1) + ((15 - i) & 3),
          4 * ((m + t) % 3 - 1) + (((15 - i) >> 2) & 3)))
    }

  private def bOnelistFrame(t: Int): Seq[H264BInter.BMbChoice] =
    Seq(b16Spec(0, t, 0), bDirectSpec(1, t),
      b16Spec(2, t, 1), bDirectSpec(3, t))

  private def bP1Specs(t: Int): Seq[H264Inter.PMbChoice] =
    (0 until 4).map { m =>
      H264Inter.P16Choice(
        mvx = if (m % 2 == 0) (m + t) % 3 - 1 else 8 + m,
        mvy = if (m % 2 == 0) (2 * m + t) % 3 - 1 else -6 - t,
        luma = Array.tabulate(16)(k => p16Luma(k, m + t)),
        cbpChroma = 0, qpDelta = 0,
        chromaDc = Array.fill(2)(new Array[Int](4)),
        chromaAc = Array.fill(2, 4)(new Array[Int](16)))
    }

  private val idrChoices: Seq[H264Intra.MbChoice] = Seq(
    i4Choice(2, 2, 0, 0, 0, 2, 0, 0), i4Choice(2, 2, 1, 0, 1, 1, 2, 1),
    i4Choice(2, 2, 0, 1, 2, 0, 0, 2), i4Choice(2, 2, 1, 1, 3, 2, -2, 3))

  /** The full GOP NAL sequence per fixture, matching the Python
    * B_FIXTURES block (B frame t's sliceQpDelta is (t % 2) * 2). */
  private def encodeFixture(fx: Fx): Seq[Array[Byte]] = {
    val idrNal = H264.encodeIdrCavlcNal(fx.mbW, fx.mbH, initQp = 26, 0,
      idrChoices)
    val (p1Nal, p1Mot) = H264Inter.encodePSliceNalWithMotion(
      fx.mbW, fx.mbH, frameNum = 1, initQp = 26, sliceQpDelta = 0,
      bP1Specs(1))
    val twoP = fx.name == "b_colzero"
    val (prefix, colZero, nextFrameNum) =
      if (twoP) {
        val p2Nal = H264Inter.encodePSliceNal(fx.mbW, fx.mbH, frameNum = 2,
          initQp = 26, sliceQpDelta = 2, bP1Specs(2))
        (Seq(idrNal, p1Nal, p2Nal), H264BInter.colZeroOf(Some(p1Mot)), 3)
      } else
        (Seq(idrNal, p1Nal), H264BInter.colZeroOf(None), 2)
    val nB = fx.nals.size - prefix.size
    val bNals = (1 to nB).map { t =>
      val choices: Seq[H264BInter.BMbChoice] = fx.name match {
        case "b_mixed" | "b_colzero" => bMixedFrame(t)
        case "b_subpel" => bSubpelFrame(t)
        case "b_onelist" => bOnelistFrame(t)
        case "b_allskip" => Seq.fill(4)(H264BInter.BSkip)
        case other => fail(s"unknown fixture $other")
      }
      H264BInter.encodeBSliceNal(fx.mbW, fx.mbH, frameNum = nextFrameNum,
        initQp = 26, sliceQpDelta = (t % 2) * 2, choices, colZero)
    }
    prefix ++ bNals
  }

  // ---- the checks ------------------------------------------------------

  test("Scala decode of Python IDR+P+B bytes is pixel-exact on every frame") {
    assert(fixtures.size >= 5)
    fixtures.foreach { fx =>
      val sps = H264.encodeSpsNal(fx.mbW * 16, fx.mbH * 16, numRefFrames = 2)
      val pps = H264.encodePpsNal()
      val frames = H264.decodeNals(Seq(sps, pps) ++ fx.nals)
      assert(frames.size == fx.nals.size, fx.name)
      frames.zipWithIndex.foreach { case (f, i) =>
        assert(java.util.Arrays.equals(f.y, fx.y(i)),
          s"${fx.name} frame $i: luma differs")
        assert(java.util.Arrays.equals(f.cb, fx.cb(i)),
          s"${fx.name} frame $i: Cb differs")
        assert(java.util.Arrays.equals(f.cr, fx.cr(i)),
          s"${fx.name} frame $i: Cr differs")
      }
    }
  }

  test("Scala encode of the shared recipe reproduces the Python bytes") {
    fixtures.foreach { fx =>
      val nals = encodeFixture(fx)
      assert(nals.size == fx.nals.size, fx.name)
      nals.zip(fx.nals).zipWithIndex.foreach { case ((got, want), i) =>
        assert(java.util.Arrays.equals(got, want),
          s"${fx.name} NAL $i: Scala ${got.length} B != Python ${want.length} B")
      }
    }
  }

  test("the fixtures exercise every B MB kind, one-list direct, and colZero") {
    // structural coverage asserts on the recipe itself, so a fixture
    // edit cannot silently drop a path
    val roles = for (t <- 1 to 3; m <- 1 until 4)
      yield if (m == 0) 0 else (m + 2 * t) % 6
    Seq(1, 2, 3, 4, 5).foreach(r =>
      assert(roles.contains(r), s"b_mixed role $r never appears"))
    // b_colzero's P1 has both colZero-active (|mv| <= 1) and inactive MBs
    val p1mvs = (0 until 4).map(m =>
      if (m % 2 == 0) ((m + 2) % 3 - 1, (2 * m + 2) % 3 - 1) else (8 + m, -8))
    assert(p1mvs.exists(v => math.abs(v._1) <= 1 && math.abs(v._2) <= 1))
    assert(p1mvs.exists(v => math.abs(v._1) > 1 || math.abs(v._2) > 1))
    // b_onelist: MB1's only inter neighbor carries list0 only — the
    // derived refIdxL1 is −1, the single-list direct path
    val probe = new H264BInter.BMotion(2, 2)
    (0 until 4).foreach { by =>
      (0 until 4).foreach { bx => probe.setBlk(0, bx, by, 3, -2) }
    }
    val (u0, u1, v0, _) = H264BInter.deriveDirect(probe, 1, 0, (_, _) => false)
    assert(u0 && !u1 && v0.forall(_ == ((3, -2))))
  }
}
