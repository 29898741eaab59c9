package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation P-slice check, both directions — the
  * [[H264CavlcInteropSpec]] discipline applied to inter prediction.
  * `scripts/h264_cavlc_fixture_gen.py` (P section) independently encodes
  * IDR+P sequences and reconstructs every frame with its own motion
  * compensation / mv prediction / inter-residual arithmetic:
  *
  *  - DECODE: `H264.decodeNals` over the Python NAL sequence must
  *    recover every Python-computed frame pixel-exactly — mixed
  *    skip/P_L0_16x16/intra macroblocks, leading/mid/trailing skip
  *    runs, negative and border-clamping vectors, odd-pel vectors
  *    (half-phase chroma bilinear), and the cbp = 0 coded path;
  *  - ENCODE: `H264Inter.encodePSliceNal` over the SAME recipe
  *    (restated below) must reproduce the Python bytes exactly.
  */
class H264InterInteropSpec extends AnyFunSuite {

  private case class Fx(name: String, mbW: Int, mbH: Int,
                        nals: Seq[Array[Byte]], y: Seq[Array[Byte]],
                        cb: Seq[Array[Byte]], cr: Seq[Array[Byte]])

  private lazy val fixtures: Seq[Fx] = {
    val in = getClass.getResourceAsStream("/h264_p_fixtures.txt")
    assert(in != null,
      "h264_p_fixtures.txt missing — run scripts/h264_cavlc_fixture_gen.py")
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

  private def i16AcLevels(k: Int, m: Int): Array[Int] = {
    val lv = new Array[Int](16)
    for (p <- 1 until 16 if (p * 7 + k * 3 + m * 5) % 8 == 0) {
      var v = ((p + k + m) % 5) - 2
      if (v == 0) v = 1
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

  private def i16Choice(m: Int, mode: Int, ac: Boolean, cbpChroma: Int,
                        qpDelta: Int, chromaMode: Int): H264Intra.I16Choice = {
    val (cd, ca) = chroma(m, cbpChroma)
    H264Intra.I16Choice(mode, ac, cbpChroma, qpDelta, i16DcLevels(m),
      Array.tabulate(16)(k => if (ac) i16AcLevels(k, m) else new Array[Int](16)),
      cd, ca, chromaMode)
  }

  private def i4Choice(mbW: Int, mbH: Int, mx: Int, my: Int, m: Int,
                       cbpChroma: Int, qpDelta: Int,
                       chromaMode: Int): H264Intra.I4Choice = {
    val (cd, ca) = chroma(m, cbpChroma)
    H264Intra.I4Choice(i4Modes(mbW, mbH, mx, my, m), cbpChroma, qpDelta,
      Array.tabulate(16)(k => i4Levels(k, m)), cd, ca, chromaMode)
  }

  private def p16Luma(k: Int, m: Int): Array[Int] =
    if (((k >> 2) + m) % 2 == 1) new Array[Int](16) else i4MidLevels(k, m)

  private def p16Spec(m: Int, t: Int): H264Inter.P16Choice = {
    val (cd, ca) = chroma(m + t, (m + t) % 3)
    H264Inter.P16Choice(
      mvx = 4 * ((m + t) % 5 - 2), mvy = 4 * ((2 * m + t) % 5 - 2),
      luma = Array.tabulate(16)(k => p16Luma(k, m + t)),
      cbpChroma = (m + t) % 3, qpDelta = (t % 3) - 1,
      chromaDc = cd, chromaAc = ca)
  }

  private def pPartSpec(m: Int, t: Int): H264Inter.P2Choice = {
    val (cd, ca) = chroma(m + t, (m + t) % 3)
    H264Inter.P2Choice(
      vertical = (m + t) % 2 == 1,
      mv0 = ((m * 5 + t) % 11 - 5, (m * 3 + t * 2) % 11 - 5),
      mv1 = ((m * 7 + t * 3) % 11 - 5, (m + t * 5) % 11 - 5),
      luma = Array.tabulate(16)(k => p16Luma(k, m + t)),
      cbpChroma = (m + t) % 3, qpDelta = (t % 3) - 1,
      chromaDc = cd, chromaAc = ca)
  }

  private def pPartFrame(t: Int): Seq[H264Inter.PMbChoice] =
    (0 until 4).map { m =>
      (m + 2 * t) % 4 match {
        case 0 => H264Inter.PSkip
        case 1 => pPartSpec(m, t)
        case 2 => p16Spec(m, t)
        case _ => H264Inter.PIntraChoice(
          i16Choice(m + t, mode = 2, ac = false, cbpChroma = 0,
            qpDelta = 0, chromaMode = 0))
      }
    }

  private def p8Spec(m: Int, t: Int): H264Inter.P8x8Choice = {
    val subTypes = Array.tabulate(4)(i => (m + t + i) % 4)
    val nOf = Array(1, 2, 2, 4)
    val mvs = (0 until 4).map { p8 =>
      (0 until nOf(subTypes(p8))).map { s =>
        ((m * 3 + t + p8 * 5 + s * 7) % 11 - 5,
          (m + t * 3 + p8 * 2 + s * 5) % 11 - 5)
      }
    }
    val (cd, ca) = chroma(m + t, (m + t) % 3)
    H264Inter.P8x8Choice(subTypes, mvs,
      luma = Array.tabulate(16)(k => p16Luma(k, m + t)),
      cbpChroma = (m + t) % 3, qpDelta = (t % 3) - 1,
      chromaDc = cd, chromaAc = ca)
  }

  private def p8Frame(t: Int): Seq[H264Inter.PMbChoice] =
    (0 until 4).map { m =>
      (m + 3 * t) % 4 match {
        case 0 => H264Inter.PSkip
        case 1 => p8Spec(m, t)
        case 2 => pPartSpec(m, t)
        case _ => p16Spec(m, t)
      }
    }

  private def pMixedFrame(t: Int): Seq[H264Inter.PMbChoice] =
    (0 until 4).map { m =>
      (m + t) % 3 match {
        case 0 => H264Inter.PSkip
        case 1 => p16Spec(m, t)
        case _ => H264Inter.PIntraChoice(
          i16Choice(m + t, mode = 2, ac = false, cbpChroma = 0,
            qpDelta = 0, chromaMode = 0))
      }
    }

  private def pSubpelFrame(t: Int): Seq[H264Inter.PMbChoice] =
    (0 until 4).map { m =>
      val i = (t - 1) * 4 + m // sweeps all 16 (xF, yF) phase pairs
      val (cd, ca) = chroma(m + t, (m + t) % 3)
      H264Inter.P16Choice(
        mvx = 4 * ((m + t) % 3 - 1) + (i & 3),
        mvy = 4 * ((2 * m + t) % 3 - 1) + (i >> 2),
        luma = Array.fill(16)(new Array[Int](16)),
        cbpChroma = (m + t) % 3, qpDelta = 0,
        chromaDc = cd, chromaAc = ca)
    }

  private def pMotionFrame(t: Int): Seq[H264Inter.PMbChoice] =
    (0 until 4).map { m =>
      H264Inter.P16Choice(
        mvx = 4 * ((m + t) % 5 - 2), mvy = 4 * ((2 * m + t) % 5 - 2),
        luma = Array.fill(16)(new Array[Int](16)),
        cbpChroma = 0, qpDelta = 0,
        chromaDc = Array.fill(2)(new Array[Int](4)),
        chromaAc = Array.fill(2, 4)(new Array[Int](16)))
    }

  /** The IDR + P choice sequences per fixture, matching the Python
    * P_FIXTURES block (sliceQpDelta for P frame t is (t % 2) * 2). */
  private def encodeFixture(fx: Fx): Seq[Array[Byte]] = {
    val idr: Seq[H264Intra.MbChoice] = fx.name match {
      case "p_mixed" | "p_subpel" | "p_partitions" | "p_8x8" => Seq(
        i4Choice(2, 2, 0, 0, 0, 2, 0, 0), i4Choice(2, 2, 1, 0, 1, 1, 2, 1),
        i4Choice(2, 2, 0, 1, 2, 0, 0, 2), i4Choice(2, 2, 1, 1, 3, 2, -2, 3))
      case "p_motion" => Seq(
        i16Choice(0, 2, ac = true, 2, 0, 0), i16Choice(1, 1, ac = true, 1, 2, 1),
        i16Choice(2, 0, ac = false, 0, -2, 2), i16Choice(3, 3, ac = true, 2, 0, 3))
      case "p_allskip" => Seq(
        i16Choice(0, 2, ac = true, 2, 0, 0),
        i16Choice(1, 2, ac = false, 0, 0, 1))
      case other => fail(s"unknown fixture $other")
    }
    val idrSqd = fx.name match {
      case "p_allskip" => 2
      case _ => 0
    }
    val idrNal = H264.encodeIdrCavlcNal(fx.mbW, fx.mbH, initQp = 26,
      idrSqd, idr)
    val nP = fx.nals.size - 1
    val pNals = (1 to nP).map { t =>
      val choices: Seq[H264Inter.PMbChoice] = fx.name match {
        case "p_mixed" => pMixedFrame(t)
        case "p_motion" => pMotionFrame(t)
        case "p_subpel" => pSubpelFrame(t)
        case "p_partitions" => pPartFrame(t)
        case "p_8x8" => p8Frame(t)
        case "p_allskip" => Seq(H264Inter.PSkip, H264Inter.PSkip)
      }
      H264Inter.encodePSliceNal(fx.mbW, fx.mbH, frameNum = t, initQp = 26,
        sliceQpDelta = (t % 2) * 2, choices)
    }
    idrNal +: pNals
  }

  // ---- the checks ------------------------------------------------------

  test("Scala decode of Python IDR+P bytes is pixel-exact on every frame") {
    fixtures.foreach { fx =>
      val sps = H264.encodeSpsNal(fx.mbW * 16, fx.mbH * 16, numRefFrames = 1)
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
      nals.zip(fx.nals).zipWithIndex.foreach { case ((got, want), i) =>
        assert(java.util.Arrays.equals(got, want),
          s"${fx.name} NAL $i: Scala ${got.length} B != Python ${want.length} B")
      }
    }
  }

  test("the fixtures exercise skip runs, intra-in-P, and odd/clamping vectors") {
    // structural coverage asserts on the recipe itself, so a fixture
    // edit cannot silently drop a path
    val roles = for (t <- 1 to 3; m <- 0 until 4) yield (m + t) % 3
    assert(roles.contains(0) && roles.contains(1) && roles.contains(2))
    val mvs = for (t <- 1 to 2; m <- 0 until 4)
      yield (4 * ((m + t) % 5 - 2), 4 * ((2 * m + t) % 5 - 2))
    assert(mvs.exists(v => v._1 < 0 || v._2 < 0), "negative vectors")
    assert(mvs.exists(v => (v._1 / 4) % 2 != 0 || (v._2 / 4) % 2 != 0),
      "odd-pel vectors (half-phase chroma)")
    // p_subpel sweeps every quarter-pel phase pair (the 6-tap half-pel
    // positions, the unrounded-center j, and all quarter averages)
    val fracs = (for (t <- 1 to 4; m <- 0 until 4) yield {
      val i = (t - 1) * 4 + m
      (((4 * ((m + t) % 3 - 1) + (i & 3)) & 3,
        (4 * ((2 * m + t) % 3 - 1) + (i >> 2)) & 3))
    }).toSet
    assert(fracs == (for (x <- 0 to 3; y <- 0 to 3) yield (x, y)).toSet,
      s"phase pairs covered: $fracs")
  }
}
