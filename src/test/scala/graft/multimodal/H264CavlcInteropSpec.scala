package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation CAVLC-intra check.
  * `scripts/h264_cavlc_fixture_gen.py` is a separate implementation of
  * the intra subset (CAVLC bit serialization, all intra prediction
  * modes, dequant/IDCT/Hadamard, the MB layer) that both encodes the
  * fixture pictures and reconstructs their expected planes with its own
  * arithmetic. Here the Scala side is held to it in both directions:
  *
  *  - DECODE: `H264.decodeIdr` over the Python NAL bytes must recover
  *    the Python-computed Y/Cb/Cr planes pixel-exactly — across
  *    Intra_16x16 modes 0–3, all nine Intra_4x4 modes (reached via the
  *    availability-derived mode sweep), all four chroma modes, chroma
  *    DC+AC residuals, per-MB qp deltas, and the high/low-QP dequant
  *    branches;
  *  - ENCODE: `H264.encodeIdrCavlcNal` over the SAME recipe (restated
  *    below from the formulas in the Python script) must reproduce the
  *    Python bytes exactly.
  */
class H264CavlcInteropSpec extends AnyFunSuite {

  private case class Fx(name: String, mbW: Int, mbH: Int, sliceQpDelta: Int,
                        nal: Array[Byte], y: Array[Byte], cb: Array[Byte],
                        cr: Array[Byte])

  private lazy val fixtures: Seq[Fx] = {
    val in = getClass.getResourceAsStream("/h264_cavlc_fixtures.txt")
    assert(in != null,
      "h264_cavlc_fixtures.txt missing — run scripts/h264_cavlc_fixture_gen.py")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    try src.getLines().map { l =>
      val p = l.trim.split(" ")
      Fx(p(0), p(1).toInt, p(2).toInt, p(3).toInt,
        hex(p(4)), hex(p(5)), hex(p(6)), hex(p(7)))
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

  private def i4DenseLevels(k: Int, m: Int): Array[Int] = {
    val lv = new Array[Int](16)
    for (p <- 0 until 16 if (p + k + m) % 8 != 7) {
      var v = ((p * 3 + k + m) % 9) - 4
      if (v == 0) v = 2
      lv(p) = v
    }
    lv
  }

  private val I4Formulas: Map[String, (Int, Int) => Array[Int]] = Map(
    "std" -> i4Levels, "mid" -> i4MidLevels, "dense" -> i4DenseLevels)

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

  /** §8.3.1.2 mode requirements, as in the Python MODE_NEEDS map. */
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

  private case class MbRecipe(kind: String, mode: Int, ac: Boolean,
                              cbpChroma: Int, qpDelta: Int, chromaMode: Int,
                              lv: String = "std")

  private val Recipes: Map[String, Seq[MbRecipe]] = Map(
    "i16_rich" -> Seq(
      MbRecipe("i16", 2, ac = true, 2, 0, 0),
      MbRecipe("i16", 1, ac = true, 1, 2, 1),
      MbRecipe("i16", 0, ac = false, 0, -2, 2),
      MbRecipe("i16", 3, ac = true, 2, 0, 3)),
    "i4_rich" -> Seq(
      MbRecipe("i4", -1, ac = false, 2, 0, 0),
      MbRecipe("i4", -1, ac = false, 0, 2, 1),
      MbRecipe("i4", -1, ac = false, 1, -4, 2),
      MbRecipe("i4", -1, ac = false, 2, 2, 3)),
    "i16_hiqp" -> Seq(MbRecipe("i16", 2, ac = true, 2, 0, 0)),
    "i4_loqp" -> Seq(
      MbRecipe("i4", -1, ac = false, 2, 0, 0),
      MbRecipe("i4", -1, ac = false, 2, 0, 1)),
    // mid density drives neighbor-averaged nC into the 4 <= nC < 8
    // Table 9-5 column; dense density reaches the nC >= 8 FLC
    "i4_nc_mid" -> Seq(
      MbRecipe("i4", -1, ac = false, 2, 0, 0, lv = "mid"),
      MbRecipe("i4", -1, ac = false, 1, 2, 1, lv = "mid"),
      MbRecipe("i4", -1, ac = false, 0, 0, 2, lv = "mid"),
      MbRecipe("i4", -1, ac = false, 2, -2, 3, lv = "mid")),
    "i4_nc_hi" -> Seq(
      MbRecipe("i4", -1, ac = false, 2, 0, 0, lv = "dense"),
      MbRecipe("i4", -1, ac = false, 2, 0, 1, lv = "dense")))

  private def choices(fx: Fx): Seq[H264Intra.MbChoice] =
    Recipes(fx.name).zipWithIndex.map { case (r, m) =>
      val mx = m % fx.mbW; val my = m / fx.mbW
      val chromaDc = Array.tabulate(2)(c =>
        if (r.cbpChroma != 0) chromaDcLevels(c, m) else new Array[Int](4))
      val chromaAc = Array.tabulate(2, 4)((c, b) =>
        if (r.cbpChroma == 2) chromaAcLevels(c, b, m) else new Array[Int](16))
      if (r.kind == "i16")
        H264Intra.I16Choice(r.mode, r.ac, r.cbpChroma, r.qpDelta,
          i16DcLevels(m),
          Array.tabulate(16)(k => if (r.ac) i16AcLevels(k, m) else new Array[Int](16)),
          chromaDc, chromaAc, r.chromaMode)
      else
        H264Intra.I4Choice(i4Modes(fx.mbW, fx.mbH, mx, my, m), r.cbpChroma,
          r.qpDelta, Array.tabulate(16)(k => I4Formulas(r.lv)(k, m)),
          chromaDc, chromaAc, r.chromaMode)
    }

  // ---- the checks ------------------------------------------------------

  test("Scala decode of Python CAVLC bytes is pixel-exact on every fixture") {
    fixtures.foreach { fx =>
      val sps = H264.parseSps(H264.encodeSpsNal(fx.mbW * 16, fx.mbH * 16))
      val f = H264.decodeIdr(fx.nal, sps, initQp = 26)
      assert(f.width == fx.mbW * 16 && f.height == fx.mbH * 16, fx.name)
      assert(java.util.Arrays.equals(f.y, fx.y), s"${fx.name}: luma differs")
      assert(java.util.Arrays.equals(f.cb, fx.cb), s"${fx.name}: Cb differs")
      assert(java.util.Arrays.equals(f.cr, fx.cr), s"${fx.name}: Cr differs")
    }
  }

  test("Scala encode of the shared recipe reproduces the Python bytes") {
    fixtures.foreach { fx =>
      val nal = H264.encodeIdrCavlcNal(fx.mbW, fx.mbH, initQp = 26,
        fx.sliceQpDelta, choices(fx))
      assert(java.util.Arrays.equals(nal, fx.nal),
        s"${fx.name}: Scala NAL (${nal.length} B) != Python (${fx.nal.length} B)")
    }
  }

  test("the i4 mode sweep really reaches all nine prediction modes") {
    val used = Recipes("i4_rich").indices.flatMap { m =>
      i4Modes(2, 2, m % 2, m / 2, m)
    }.toSet
    assert(used == (0 until 9).toSet, s"modes covered: $used")
  }
}
