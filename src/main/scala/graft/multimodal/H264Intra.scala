package graft.multimodal

/** Intra-frame macroblock decoding for the CAVLC baseline subset
  * (ITU-T H.264): Intra_4x4 (all nine §8.3.1.2 prediction modes),
  * Intra_16x16 (all four §8.3.3 modes), the four §8.3.4 chroma modes,
  * inverse 4×4 integer transform and dequantization (§8.5.12), the
  * Intra_16x16 luma DC Hadamard (§8.5.10) and 2×2 chroma DC (§8.5.11)
  * paths, per-macroblock QP tracking (`mb_qp_delta`, chroma QP via the
  * Table 8-15 mapping), and the Table 9-4 intra `coded_block_pattern`
  * mapping. Residual bits ride on [[H264Cavlc]]; the NAL/SPS/PPS/slice
  * layer stays in [[H264]], which dispatches non-I_PCM macroblocks
  * here. Single-slice pictures (the subset's contract): every decoded
  * macroblock is available as a neighbor.
  */
private[multimodal] object H264Intra {

  import H264.{BitReader, BitWriter}

  // ---- constants -------------------------------------------------------

  /** Zig-zag scan: scan position → raster index in the 4×4 block. */
  val ZigZag: Array[Int] = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** luma4x4BlkIdx → (x4, y4) in 4-sample units inside the MB. */
  val Blk4x4Pos: Array[(Int, Int)] = Array(
    (0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 0), (2, 1), (3, 1),
    (0, 2), (1, 2), (0, 3), (1, 3), (2, 2), (3, 2), (2, 3), (3, 3))

  /** Dequant V matrix (§8.5.12.1 normAdjust4x4 × 16 / 16): rows = QP%6,
    * columns = position class (0: corners, 1: cross, 2: centers). */
  private val DequantV: Array[Array[Int]] = Array(
    Array(10, 13, 16), Array(11, 14, 18), Array(13, 16, 20),
    Array(14, 18, 23), Array(16, 20, 25), Array(18, 23, 29))

  private def vClass(raster: Int): Int = {
    val i = raster >> 2; val j = raster & 3
    if (i % 2 == 0 && j % 2 == 0) 0
    else if (i % 2 == 1 && j % 2 == 1) 2
    else 1
  }

  /** Table 8-15: qPi → qPc (chroma QP). */
  private val ChromaQp: Array[Int] = Array(
    29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38, 38,
    38, 39, 39, 39, 39) // qPi 30..51
  def chromaQp(qpY: Int): Int = if (qpY < 30) qpY else ChromaQp(qpY - 30)

  /** Table 9-4, intra column: coded_block_pattern me(v) codeNum → cbp. */
  val CbpIntra: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)

  def clip255(v: Int): Int = math.max(0, math.min(255, v))

  // ---- slice context ---------------------------------------------------

  /** Mutable per-slice decode state: full-size planes plus the neighbor
    * metadata the bit parsing needs (per-4×4-block TotalCoeff for nC,
    * per-block Intra_4x4 modes for mode prediction, per-MB kind). */
  final class SliceCtx(val mbW: Int, val mbH: Int, var qpY: Int) {
    val width: Int = mbW * 16
    val height: Int = mbH * 16
    val y = new Array[Byte](width * height)
    val cb = new Array[Byte](width * height / 4)
    val cr = new Array[Byte](width * height / 4)
    /** TotalCoeff per luma 4×4 block (grid 4·mbW × 4·mbH); −1 = block
      * not yet decoded / MB outside picture. */
    val lumaTc: Array[Int] = Array.fill(mbW * 4 * mbH * 4)(-1)
    /** TotalCoeff per chroma 4×4 block per component (2·mbW × 2·mbH). */
    val cbTc: Array[Int] = Array.fill(mbW * 2 * mbH * 2)(-1)
    val crTc: Array[Int] = Array.fill(mbW * 2 * mbH * 2)(-1)
    /** Intra_4x4 pred mode per luma block; −1 where the MB is not
      * Intra_4x4 (DC inference per §8.3.1.1). */
    val i4Mode: Array[Int] = Array.fill(mbW * 4 * mbH * 4)(-1)
    /** MB kinds: 0 = undecoded, 1 = intra (4x4/16x16), 2 = I_PCM. */
    val mbKind: Array[Int] = Array.fill(mbW * mbH)(0)

    def mbDecoded(mx: Int, my: Int): Boolean =
      mx >= 0 && my >= 0 && mx < mbW && my < mbH && mbKind(my * mbW + mx) != 0
    def lumaTcAt(bx: Int, by: Int): Int =
      if (bx < 0 || by < 0 || bx >= mbW * 4 || by >= mbH * 4) -1
      else {
        val t = lumaTc(by * mbW * 4 + bx)
        // I_PCM neighbors count as 16 coefficients (§9.2.1)
        if (t == -1 && mbKind((by / 4) * mbW + (bx / 4)) == 2) 16 else t
      }
    def chromaTcAt(tc: Array[Int], bx: Int, by: Int): Int =
      if (bx < 0 || by < 0 || bx >= mbW * 2 || by >= mbH * 2) -1
      else {
        val t = tc(by * mbW * 2 + bx)
        if (t == -1 && mbKind((by / 2) * mbW + (bx / 2)) == 2) 16 else t
      }

    /** §9.2.1 nC from left/above block TotalCoeffs. */
    def nC(tcA: Int, tcB: Int): Int =
      if (tcA >= 0 && tcB >= 0) (tcA + tcB + 1) >> 1
      else if (tcA >= 0) tcA
      else if (tcB >= 0) tcB
      else 0

    def markPcm(mx: Int, my: Int): Unit = mbKind(my * mbW + mx) = 2
  }

  // ---- transforms ------------------------------------------------------

  /** §8.5.12.2 inverse 4×4 core transform on raster `d`, adding the
    * (x + 32) >> 6 rounded residual into `out` via `put`. */
  def inverseTransformAdd(d: Array[Int], put: (Int, Int, Int) => Unit): Unit = {
    val e = new Array[Int](16)
    var i = 0
    while (i < 4) { // rows
      val d0 = d(i * 4); val d1 = d(i * 4 + 1); val d2 = d(i * 4 + 2); val d3 = d(i * 4 + 3)
      val a0 = d0 + d2; val a1 = d0 - d2
      val a2 = (d1 >> 1) - d3; val a3 = d1 + (d3 >> 1)
      e(i * 4) = a0 + a3; e(i * 4 + 1) = a1 + a2
      e(i * 4 + 2) = a1 - a2; e(i * 4 + 3) = a0 - a3
      i += 1
    }
    var j = 0
    while (j < 4) { // columns
      val d0 = e(j); val d1 = e(4 + j); val d2 = e(8 + j); val d3 = e(12 + j)
      val a0 = d0 + d2; val a1 = d0 - d2
      val a2 = (d1 >> 1) - d3; val a3 = d1 + (d3 >> 1)
      put(j, 0, (a0 + a3 + 32) >> 6); put(j, 1, (a1 + a2 + 32) >> 6)
      put(j, 2, (a1 - a2 + 32) >> 6); put(j, 3, (a0 - a3 + 32) >> 6)
      j += 1
    }
  }

  /** §8.5.12.1 AC/Intra4x4 dequant of zig-zag `levels` → raster array.
    * `dcFromOutside` overrides position 0 (the Intra_16x16/chroma DC
    * paths scale their DC separately). */
  def dequant4x4(levels: Array[Int], qp: Int, skipDc: Boolean,
                 dcOverride: Int): Array[Int] = {
    val d = new Array[Int](16)
    val m = qp % 6; val shift = qp / 6
    var s = 0
    while (s < 16) {
      val raster = ZigZag(s)
      val c = levels(s)
      if (c != 0 && !(skipDc && s == 0)) {
        val ls = DequantV(m)(vClass(raster)) * 16 // LevelScale4x4 flat
        d(raster) =
          if (qp >= 24) (c * ls) << (shift - 4)
          else (c * ls + (1 << (3 - shift))) >> (4 - shift)
      }
      s += 1
    }
    if (skipDc) d(0) = dcOverride
    d
  }

  /** §8.5.10: Intra_16x16 luma DC — inverse 4×4 Hadamard then scaling. */
  def lumaDcTransform(zz: Array[Int], qp: Int): Array[Int] = {
    // zig-zag → raster
    val f = new Array[Int](16)
    var s = 0
    while (s < 16) { f(ZigZag(s)) = zz(s); s += 1 }
    val g = new Array[Int](16)
    var i = 0
    while (i < 4) { // rows
      val a = f(i * 4) + f(i * 4 + 2); val b = f(i * 4) - f(i * 4 + 2)
      val c = f(i * 4 + 1) + f(i * 4 + 3); val dd = f(i * 4 + 1) - f(i * 4 + 3)
      g(i * 4) = a + c; g(i * 4 + 1) = b + dd
      g(i * 4 + 2) = b - dd; g(i * 4 + 3) = a - c
      i += 1
    }
    val h = new Array[Int](16)
    var j = 0
    while (j < 4) { // columns
      val a = g(j) + g(8 + j); val b = g(j) - g(8 + j)
      val c = g(4 + j) + g(12 + j); val dd = g(4 + j) - g(12 + j)
      h(j) = a + c; h(4 + j) = b + dd
      h(8 + j) = b - dd; h(12 + j) = a - c
      j += 1
    }
    val ls = DequantV(qp % 6)(0) * 16
    val out = new Array[Int](16)
    var k = 0
    while (k < 16) {
      out(k) =
        if (qp >= 36) (h(k) * ls) << (qp / 6 - 6)
        else (h(k) * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
      k += 1
    }
    out
  }

  /** §8.5.11: 2×2 chroma DC transform + scaling (4:2:0). Input/output
    * raster order (blk 0 1 / 2 3). */
  def chromaDcTransform(c: Array[Int], qpc: Int): Array[Int] = {
    val f = Array(
      c(0) + c(1) + c(2) + c(3), c(0) - c(1) + c(2) - c(3),
      c(0) + c(1) - c(2) - c(3), c(0) - c(1) - c(2) + c(3))
    val ls = DequantV(qpc % 6)(0) * 16
    f.map(v => ((v * ls) << (qpc / 6)) >> 5)
  }

  // ---- intra prediction ------------------------------------------------

  /** Neighbor sample fetcher over a byte plane. */
  private final class Plane(val a: Array[Byte], val w: Int, val h: Int) {
    def apply(x: Int, y: Int): Int = a(y * w + x) & 0xff
    def set(x: Int, y: Int, v: Int): Unit = a(y * w + x) = v.toByte
  }

  /** §8.3.1.2: Intra_4x4 prediction for the block at plane position
    * (x0, y0). `availLeft`/`availUp`/`availUpLeft`/`availUpRight` follow
    * the slice availability rules computed by the caller. */
  private def predict4x4(p: Plane, x0: Int, y0: Int, mode: Int,
                         availLeft: Boolean, availUp: Boolean,
                         availUpLeft: Boolean, availUpRight: Boolean,
                         pred: Array[Int]): Unit = {
    // neighbor arrays per the spec's p[x, y] convention
    val left = new Array[Int](4)
    val up = new Array[Int](8)
    var upLeft = 0
    if (availLeft) { var i = 0; while (i < 4) { left(i) = p(x0 - 1, y0 + i); i += 1 } }
    if (availUp) {
      var i = 0; while (i < 4) { up(i) = p(x0 + i, y0 - 1); i += 1 }
      if (availUpRight) { var j = 4; while (j < 8) { up(j) = p(x0 + j, y0 - 1); j += 1 } }
      else { var j = 4; while (j < 8) { up(j) = up(3); j += 1 } } // §8.3.1.2 substitution
    }
    if (availUpLeft) upLeft = p(x0 - 1, y0 - 1)
    def set(i: Int, j: Int, v: Int): Unit = pred(j * 4 + i) = v
    mode match {
      case 0 => // Vertical
        require(availUp, "Intra_4x4 Vertical needs the above neighbor")
        var j = 0
        while (j < 4) { var i = 0; while (i < 4) { set(i, j, up(i)); i += 1 }; j += 1 }
      case 1 => // Horizontal
        require(availLeft, "Intra_4x4 Horizontal needs the left neighbor")
        var j = 0
        while (j < 4) { var i = 0; while (i < 4) { set(i, j, left(j)); i += 1 }; j += 1 }
      case 2 => // DC with availability fallbacks
        val dc =
          if (availLeft && availUp) (left.sum + up.take(4).sum + 4) >> 3
          else if (availLeft) (left.sum + 2) >> 2
          else if (availUp) (up.take(4).sum + 2) >> 2
          else 128
        var j = 0
        while (j < 4) { var i = 0; while (i < 4) { set(i, j, dc); i += 1 }; j += 1 }
      case 3 => // Diagonal down-left
        require(availUp, "Intra_4x4 DDL needs the above neighbor")
        var j = 0
        while (j < 4) {
          var i = 0
          while (i < 4) {
            set(i, j,
              if (i == 3 && j == 3) (up(6) + 3 * up(7) + 2) >> 2
              else (up(i + j) + 2 * up(i + j + 1) + up(i + j + 2) + 2) >> 2)
            i += 1
          }
          j += 1
        }
      case 4 => // Diagonal down-right (§8.3.1.2.4)
        require(availUp && availLeft && availUpLeft, "Intra_4x4 DDR neighbors")
        var jj = 0
        while (jj < 4) {
          var ii = 0
          while (ii < 4) {
            val v =
              if (ii > jj)
                (pix(up, upLeft, ii - jj - 2) + 2 * pix(up, upLeft, ii - jj - 1) +
                  pix(up, upLeft, ii - jj) + 2) >> 2
              else if (ii < jj) {
                def pl(k: Int): Int = if (k < 0) upLeft else left(k)
                (pl(jj - ii - 2) + 2 * pl(jj - ii - 1) + pl(jj - ii) + 2) >> 2
              } else (up(0) + 2 * upLeft + left(0) + 2) >> 2
            set(ii, jj, v)
            ii += 1
          }
          jj += 1
        }
      case 5 => // Vertical-right (§8.3.1.2.5)
        require(availUp && availLeft && availUpLeft, "Intra_4x4 VR neighbors")
        fillVerticalRight(up, left, upLeft, set)
      case 6 => // Horizontal-down
        require(availUp && availLeft && availUpLeft, "Intra_4x4 HD neighbors")
        fillHorizontalDown(up, left, upLeft, set)
      case 7 => // Vertical-left
        require(availUp, "Intra_4x4 VL needs the above neighbor")
        var j = 0
        while (j < 4) {
          var i = 0
          while (i < 4) {
            val k = i + (j >> 1)
            val v =
              if (j % 2 == 0) (up(k) + up(k + 1) + 1) >> 1
              else (up(k) + 2 * up(k + 1) + up(k + 2) + 2) >> 2
            set(i, j, v)
            i += 1
          }
          j += 1
        }
      case 8 => // Horizontal-up
        require(availLeft, "Intra_4x4 HU needs the left neighbor")
        var j = 0
        while (j < 4) {
          var i = 0
          while (i < 4) {
            val z = i + 2 * j
            val v =
              if (z % 2 == 0 && z < 6) (left(j + (i >> 1)) + left(j + (i >> 1) + 1) + 1) >> 1
              else if (z % 2 == 1 && z < 5)
                (left(j + (i >> 1)) + 2 * left(j + (i >> 1) + 1) + left(j + (i >> 1) + 2) + 2) >> 2
              else if (z == 5) (left(2) + 3 * left(3) + 2) >> 2
              else left(3)
            set(i, j, v)
            i += 1
          }
          j += 1
        }
      case m => throw new IllegalArgumentException(s"Intra_4x4 mode $m")
    }
  }

  /** p[k, −1] with k = −1 meaning the up-left corner. */
  private def pix(up: Array[Int], upLeft: Int, k: Int): Int =
    if (k < 0) upLeft else up(k)

  /** §8.3.1.2.5 Vertical_Right, spec-case form. */
  private def fillVerticalRight(up: Array[Int], left: Array[Int], upLeft: Int,
                                set: (Int, Int, Int) => Unit): Unit = {
    var j = 0
    while (j < 4) {
      var i = 0
      while (i < 4) {
        val zVR = 2 * i - j
        val v =
          if (zVR == 0 || zVR == 2 || zVR == 4 || zVR == 6)
            (pix(up, upLeft, i - (j >> 1) - 1) + pix(up, upLeft, i - (j >> 1)) + 1) >> 1
          else if (zVR == 1 || zVR == 3 || zVR == 5)
            (pix(up, upLeft, i - (j >> 1) - 2) + 2 * pix(up, upLeft, i - (j >> 1) - 1) +
              pix(up, upLeft, i - (j >> 1)) + 2) >> 2
          else if (zVR == -1) (left(0) + 2 * upLeft + up(0) + 2) >> 2
          else { // zVR = −2, −3: p[−1, j−1], p[−1, j−2], p[−1, j−3]
            def pl(k: Int): Int = if (k < 0) upLeft else left(k)
            (pl(j - 1) + 2 * pl(j - 2) + pl(j - 3) + 2) >> 2
          }
        set(i, j, v)
        i += 1
      }
      j += 1
    }
  }

  /** §8.3.1.2.6 Horizontal_Down, spec-case form. */
  private def fillHorizontalDown(up: Array[Int], left: Array[Int], upLeft: Int,
                                 set: (Int, Int, Int) => Unit): Unit = {
    def pl(k: Int): Int = if (k < 0) upLeft else left(k)
    var j = 0
    while (j < 4) {
      var i = 0
      while (i < 4) {
        val zHD = 2 * j - i
        val v =
          if (zHD == 0 || zHD == 2 || zHD == 4 || zHD == 6)
            (pl(j - (i >> 1) - 1) + pl(j - (i >> 1)) + 1) >> 1
          else if (zHD == 1 || zHD == 3 || zHD == 5)
            (pl(j - (i >> 1) - 2) + 2 * pl(j - (i >> 1) - 1) + pl(j - (i >> 1)) + 2) >> 2
          else if (zHD == -1) (left(0) + 2 * upLeft + up(0) + 2) >> 2
          else // zHD = −2, −3: p[i−1, −1], p[i−2, −1], p[i−3, −1]
            (pix(up, upLeft, i - 1) + 2 * pix(up, upLeft, i - 2) +
              pix(up, upLeft, i - 3) + 2) >> 2
        set(i, j, v)
        i += 1
      }
      j += 1
    }
  }

  /** §8.3.3 Intra_16x16 prediction into `pred` (16×16 raster). */
  private def predict16x16(p: Plane, x0: Int, y0: Int, mode: Int,
                           availLeft: Boolean, availUp: Boolean,
                           availUpLeft: Boolean, pred: Array[Int]): Unit = {
    val left = new Array[Int](16)
    val up = new Array[Int](16)
    if (availLeft) { var i = 0; while (i < 16) { left(i) = p(x0 - 1, y0 + i); i += 1 } }
    if (availUp) { var i = 0; while (i < 16) { up(i) = p(x0 + i, y0 - 1); i += 1 } }
    mode match {
      case 0 =>
        require(availUp, "Intra_16x16 Vertical needs the above neighbor")
        var j = 0
        while (j < 16) { var i = 0; while (i < 16) { pred(j * 16 + i) = up(i); i += 1 }; j += 1 }
      case 1 =>
        require(availLeft, "Intra_16x16 Horizontal needs the left neighbor")
        var j = 0
        while (j < 16) { var i = 0; while (i < 16) { pred(j * 16 + i) = left(j); i += 1 }; j += 1 }
      case 2 =>
        val dc =
          if (availLeft && availUp) (left.sum + up.sum + 16) >> 5
          else if (availLeft) (left.sum + 8) >> 4
          else if (availUp) (up.sum + 8) >> 4
          else 128
        java.util.Arrays.fill(pred, dc)
      case 3 =>
        require(availLeft && availUp && availUpLeft, "Intra_16x16 Plane neighbors")
        val upLeft = p(x0 - 1, y0 - 1)
        var hSum = 0; var vSum = 0
        var i = 1
        while (i <= 8) {
          hSum += i * (up(7 + i) - (if (7 - i >= 0) up(7 - i) else upLeft))
          vSum += i * (left(7 + i) - (if (7 - i >= 0) left(7 - i) else upLeft))
          i += 1
        }
        val b = (5 * hSum + 32) >> 6
        val c = (5 * vSum + 32) >> 6
        val a = 16 * (left(15) + up(15))
        var j = 0
        while (j < 16) {
          var i2 = 0
          while (i2 < 16) {
            pred(j * 16 + i2) = clip255((a + b * (i2 - 7) + c * (j - 7) + 16) >> 5)
            i2 += 1
          }
          j += 1
        }
      case m => throw new IllegalArgumentException(s"Intra_16x16 mode $m")
    }
  }

  /** §8.3.4 chroma prediction (8×8, 4:2:0). Mode numbering per the
    * spec: 0 DC, 1 Horizontal, 2 Vertical, 3 Plane. */
  private def predictChroma(p: Plane, x0: Int, y0: Int, mode: Int,
                            availLeft: Boolean, availUp: Boolean,
                            availUpLeft: Boolean, pred: Array[Int]): Unit = {
    val left = new Array[Int](8)
    val up = new Array[Int](8)
    if (availLeft) { var i = 0; while (i < 8) { left(i) = p(x0 - 1, y0 + i); i += 1 } }
    if (availUp) { var i = 0; while (i < 8) { up(i) = p(x0 + i, y0 - 1); i += 1 } }
    mode match {
      case 0 => // DC per 4×4 sub-block with the spec's corner rules
        var sb = 0
        while (sb < 4) {
          val sx = (sb & 1) * 4; val sy = (sb >> 1) * 4
          val useUp = availUp; val useLeft = availLeft
          val dc = sb match {
            case 0 =>
              if (useUp && useLeft) (up.take(4).sum + left.take(4).sum + 4) >> 3
              else if (useUp) (up.take(4).sum + 2) >> 2
              else if (useLeft) (left.take(4).sum + 2) >> 2
              else 128
            case 1 =>
              if (useUp) (up.drop(4).sum + 2) >> 2
              else if (useLeft) (left.take(4).sum + 2) >> 2
              else 128
            case 2 =>
              if (useLeft) (left.drop(4).sum + 2) >> 2
              else if (useUp) (up.take(4).sum + 2) >> 2
              else 128
            case _ =>
              if (useUp && useLeft) (up.drop(4).sum + left.drop(4).sum + 4) >> 3
              else if (useUp) (up.drop(4).sum + 2) >> 2
              else if (useLeft) (left.drop(4).sum + 2) >> 2
              else 128
          }
          var j = 0
          while (j < 4) {
            var i = 0
            while (i < 4) { pred((sy + j) * 8 + sx + i) = dc; i += 1 }
            j += 1
          }
          sb += 1
        }
      case 1 =>
        require(availLeft, "chroma Horizontal needs the left neighbor")
        var j = 0
        while (j < 8) { var i = 0; while (i < 8) { pred(j * 8 + i) = left(j); i += 1 }; j += 1 }
      case 2 =>
        require(availUp, "chroma Vertical needs the above neighbor")
        var j = 0
        while (j < 8) { var i = 0; while (i < 8) { pred(j * 8 + i) = up(i); i += 1 }; j += 1 }
      case 3 =>
        require(availLeft && availUp && availUpLeft, "chroma Plane neighbors")
        val upLeft = p(x0 - 1, y0 - 1)
        var hSum = 0; var vSum = 0
        var i = 1
        while (i <= 4) {
          hSum += i * (up(3 + i) - (if (3 - i >= 0) up(3 - i) else upLeft))
          vSum += i * (left(3 + i) - (if (3 - i >= 0) left(3 - i) else upLeft))
          i += 1
        }
        val b = (17 * hSum + 16) >> 5
        val c = (17 * vSum + 16) >> 5
        val a = 16 * (left(7) + up(7))
        var j = 0
        while (j < 8) {
          var i2 = 0
          while (i2 < 8) {
            pred(j * 8 + i2) = clip255((a + b * (i2 - 3) + c * (j - 3) + 16) >> 5)
            i2 += 1
          }
          j += 1
        }
      case m => throw new IllegalArgumentException(s"chroma pred mode $m")
    }
  }

  // ---- macroblock layer: decode ----------------------------------------

  private def idxOf(x4: Int, y4: Int): Int = Blk4x4Pos.indexOf((x4, y4))

  /** Is the luma 4×4 block at GLOBAL grid (bx, by) reconstructed before
    * block-order `k` of MB (mx, my)? Single-slice raster decode order. */
  private def lumaBlockAvail(ctx: SliceCtx, mx: Int, my: Int, k: Int,
                             bx: Int, by: Int): Boolean = {
    if (bx < 0 || by < 0 || bx >= ctx.mbW * 4 || by >= ctx.mbH * 4) return false
    val nmx = bx / 4; val nmy = by / 4
    if (nmy < my || (nmy == my && nmx < mx)) true
    else if (nmx == mx && nmy == my) idxOf(bx % 4, by % 4) < k
    else false
  }

  /** Decode one non-PCM intra macroblock (mb_type 0..24) in place. */
  def decodeIntraMb(r: BitReader, ctx: SliceCtx, mx: Int, my: Int,
                    mbType: Int): Unit = {
    require(mbType >= 0 && mbType <= 24, s"mb_type $mbType is not intra")
    val i16 = mbType >= 1
    val lumaGrid = ctx.mbW * 4
    val chromaGrid = ctx.mbW * 2
    val bx0 = mx * 4; val by0 = my * 4
    val cx0 = mx * 2; val cy0 = my * 2

    // --- Intra_4x4 prediction modes (§8.3.1.1) ---
    val i4Modes = new Array[Int](16)
    if (!i16) {
      var k = 0
      while (k < 16) {
        val (x4, y4) = Blk4x4Pos(k)
        def neighborMode(bx: Int, by: Int): Int =
          if (bx < 0 || by < 0 || bx >= lumaGrid || by >= ctx.mbH * 4) 2
          else {
            val nmx = bx / 4; val nmy = by / 4
            val decoded = nmy < my || (nmy == my && nmx < mx) ||
              (nmx == mx && nmy == my && idxOf(bx % 4, by % 4) < k)
            if (!decoded) 2
            else {
              val m = if (nmx == mx && nmy == my) i4Modes(idxOf(bx % 4, by % 4))
                      else ctx.i4Mode(by * lumaGrid + bx)
              if (m < 0) 2 else m // non-Intra_4x4 neighbor MB → DC
            }
          }
        val predMode = math.min(
          neighborMode(bx0 + x4 - 1, by0 + y4),
          neighborMode(bx0 + x4, by0 + y4 - 1))
        val mode =
          if (r.bit() == 1) predMode
          else { val rem = r.u(3); if (rem < predMode) rem else rem + 1 }
        i4Modes(k) = mode
        k += 1
      }
    }
    val chromaPredMode = r.ue()
    require(chromaPredMode <= 3, s"intra_chroma_pred_mode $chromaPredMode")

    // --- coded block pattern + QP ---
    val (cbpLuma, cbpChroma, i16PredMode) =
      if (i16) {
        val t = mbType - 1
        (if (t >= 12) 15 else 0, (t / 4) % 3, t % 4)
      } else {
        val cn = r.ue()
        require(cn < 48, s"coded_block_pattern codeNum $cn")
        val cbp = CbpIntra(cn)
        (cbp & 15, cbp >> 4, -1)
      }
    if (i16 || cbpLuma != 0 || cbpChroma != 0) {
      val delta = r.se()
      ctx.qpY = ((ctx.qpY + delta) % 52 + 52) % 52 // §7.4.5 wrap
    }
    val qp = ctx.qpY
    val qpc = chromaQp(qp)

    // --- residual parsing (§7.3.5.3, CAVLC) ---
    val lumaDcZz = new Array[Int](16)
    if (i16) {
      val tcA = ctx.lumaTcAt(bx0 - 1, by0)
      val tcB = ctx.lumaTcAt(bx0, by0 - 1)
      val blk = H264Cavlc.decodeResidualBlock(r, ctx.nC(tcA, tcB), 16)
      System.arraycopy(blk.levels, 0, lumaDcZz, 0, 16)
    }
    val lumaZz = Array.fill(16)(new Array[Int](16)) // scan-indexed; pos 0 unused for I16
    var k = 0
    while (k < 16) {
      val (x4, y4) = Blk4x4Pos(k)
      val bx = bx0 + x4; val by = by0 + y4
      if ((cbpLuma & (1 << (k >> 2))) != 0) {
        val nc = ctx.nC(ctx.lumaTcAt(bx - 1, by), ctx.lumaTcAt(bx, by - 1))
        if (i16) {
          val blk = H264Cavlc.decodeResidualBlock(r, nc, 15)
          System.arraycopy(blk.levels, 0, lumaZz(k), 1, 15)
          ctx.lumaTc(by * lumaGrid + bx) = blk.totalCoeff
        } else {
          val blk = H264Cavlc.decodeResidualBlock(r, nc, 16)
          System.arraycopy(blk.levels, 0, lumaZz(k), 0, 16)
          ctx.lumaTc(by * lumaGrid + bx) = blk.totalCoeff
        }
      } else ctx.lumaTc(by * lumaGrid + bx) = 0
      k += 1
    }
    val cbDc = new Array[Int](4); val crDc = new Array[Int](4)
    if (cbpChroma != 0) {
      System.arraycopy(H264Cavlc.decodeResidualBlock(r, -1, 4).levels, 0, cbDc, 0, 4)
      System.arraycopy(H264Cavlc.decodeResidualBlock(r, -1, 4).levels, 0, crDc, 0, 4)
    }
    val cbAcZz = Array.fill(4)(new Array[Int](16))
    val crAcZz = Array.fill(4)(new Array[Int](16))
    var c = 0
    while (c < 2) {
      val (tcArr, dst) = if (c == 0) (ctx.cbTc, cbAcZz) else (ctx.crTc, crAcZz)
      var b = 0
      while (b < 4) {
        val bx = cx0 + (b & 1); val by = cy0 + (b >> 1)
        if (cbpChroma == 2) {
          val nc = ctx.nC(ctx.chromaTcAt(tcArr, bx - 1, by),
            ctx.chromaTcAt(tcArr, bx, by - 1))
          val blk = H264Cavlc.decodeResidualBlock(r, nc, 15)
          System.arraycopy(blk.levels, 0, dst(b), 1, 15)
          tcArr(by * chromaGrid + bx) = blk.totalCoeff
        } else tcArr(by * chromaGrid + bx) = 0
        b += 1
      }
      c += 1
    }

    // --- reconstruction ---
    val yPlane = new Plane(ctx.y, ctx.width, ctx.height)
    if (i16) {
      val pred = new Array[Int](256)
      predict16x16(yPlane, mx * 16, my * 16, i16PredMode,
        availLeft = ctx.mbDecoded(mx - 1, my), availUp = ctx.mbDecoded(mx, my - 1),
        availUpLeft = ctx.mbDecoded(mx - 1, my - 1), pred)
      val dc = lumaDcTransform(lumaDcZz, qp)
      var kk = 0
      while (kk < 16) {
        val (x4, y4) = Blk4x4Pos(kk)
        val d = dequant4x4(lumaZz(kk), qp, skipDc = true, dcOverride = dc(y4 * 4 + x4))
        inverseTransformAdd(d, (i, j, res) => {
          val px = x4 * 4 + i; val py = y4 * 4 + j
          yPlane.set(mx * 16 + px, my * 16 + py,
            clip255(pred(py * 16 + px) + res))
        })
        kk += 1
      }
    } else {
      // sequential per-block: later blocks predict from earlier ones
      var kk = 0
      while (kk < 16) {
        val (x4, y4) = Blk4x4Pos(kk)
        val x0 = mx * 16 + x4 * 4; val y0 = my * 16 + y4 * 4
        val bx = bx0 + x4; val by = by0 + y4
        val pred = new Array[Int](16)
        predict4x4(yPlane, x0, y0, i4Modes(kk),
          availLeft = lumaBlockAvail(ctx, mx, my, kk, bx - 1, by),
          availUp = lumaBlockAvail(ctx, mx, my, kk, bx, by - 1),
          availUpLeft = lumaBlockAvail(ctx, mx, my, kk, bx - 1, by - 1),
          availUpRight = lumaBlockAvail(ctx, mx, my, kk, bx + 1, by - 1),
          pred)
        val d = dequant4x4(lumaZz(kk), qp, skipDc = false, dcOverride = 0)
        inverseTransformAdd(d, (i, j, res) =>
          yPlane.set(x0 + i, y0 + j, clip255(pred(j * 4 + i) + res)))
        ctx.i4Mode(by * lumaGrid + bx) = i4Modes(kk)
        kk += 1
      }
    }
    // chroma
    val cw = ctx.width / 2; val ch = ctx.height / 2
    var cc = 0
    while (cc < 2) {
      val plane = new Plane(if (cc == 0) ctx.cb else ctx.cr, cw, ch)
      val dcIn = if (cc == 0) cbDc else crDc
      val acZz = if (cc == 0) cbAcZz else crAcZz
      val pred = new Array[Int](64)
      predictChroma(plane, mx * 8, my * 8, chromaPredMode,
        availLeft = ctx.mbDecoded(mx - 1, my), availUp = ctx.mbDecoded(mx, my - 1),
        availUpLeft = ctx.mbDecoded(mx - 1, my - 1), pred)
      val dc = chromaDcTransform(dcIn, qpc)
      var b = 0
      while (b < 4) {
        val x4 = b & 1; val y4 = b >> 1
        val d = dequant4x4(acZz(b), qpc, skipDc = true, dcOverride = dc(b))
        inverseTransformAdd(d, (i, j, res) => {
          val px = x4 * 4 + i; val py = y4 * 4 + j
          plane.set(mx * 8 + px, my * 8 + py, clip255(pred(py * 8 + px) + res))
        })
        b += 1
      }
      cc += 1
    }
    ctx.mbKind(my * ctx.mbW + mx) = 1
  }

  // ---- macroblock layer: encode (the subset fixture serializer) --------

  sealed trait MbChoice { def qpDelta: Int; def cbpChroma: Int }

  /** Intra_16x16 choice: `lumaAc` is scan-indexed with position 0
    * ignored; present only when `cbpLumaAc`. `chromaDc` is 2×4 raster
    * (Cb, Cr), `chromaAc` 2×4 blocks of scan-indexed levels. */
  final case class I16Choice(predMode: Int, cbpLumaAc: Boolean, cbpChroma: Int,
      qpDelta: Int, lumaDc: Array[Int], lumaAc: Array[Array[Int]],
      chromaDc: Array[Array[Int]], chromaAc: Array[Array[Array[Int]]],
      chromaMode: Int = 0) extends MbChoice

  /** Intra_4x4 choice: 16 per-block modes + scan-indexed coefficients. */
  final case class I4Choice(modes: Array[Int], cbpChroma: Int, qpDelta: Int,
      luma: Array[Array[Int]], chromaDc: Array[Array[Int]],
      chromaAc: Array[Array[Array[Int]]], chromaMode: Int = 0) extends MbChoice

  /** Bookkeeping the encoder needs across MBs (no pixels: residual
    * choices are free, so bits depend only on TCs and modes). */
  final class EncCtx(val mbW: Int, val mbH: Int, var qpY: Int) {
    val lumaTc: Array[Int] = Array.fill(mbW * 4 * mbH * 4)(-1)
    val cbTc: Array[Int] = Array.fill(mbW * 2 * mbH * 2)(-1)
    val crTc: Array[Int] = Array.fill(mbW * 2 * mbH * 2)(-1)
    val i4Mode: Array[Int] = Array.fill(mbW * 4 * mbH * 4)(-1)
    def lumaTcAt(bx: Int, by: Int): Int =
      if (bx < 0 || by < 0 || bx >= mbW * 4 || by >= mbH * 4) -1
      else lumaTc(by * mbW * 4 + bx)
    def chromaTcAt(tc: Array[Int], bx: Int, by: Int): Int =
      if (bx < 0 || by < 0 || bx >= mbW * 2 || by >= mbH * 2) -1
      else tc(by * mbW * 2 + bx)
    def nC(a: Int, b: Int): Int =
      if (a >= 0 && b >= 0) (a + b + 1) >> 1
      else if (a >= 0) a else if (b >= 0) b else 0
  }

  /** `mbTypeOffset` shifts the written mb_type (5 inside P slices,
    * §7.4.5's I-type offset; 0 in I slices). */
  def encodeIntraMb(w: BitWriter, ctx: EncCtx, mx: Int, my: Int,
                    choice: MbChoice, mbTypeOffset: Int = 0): Unit = {
    val lumaGrid = ctx.mbW * 4
    val chromaGrid = ctx.mbW * 2
    val bx0 = mx * 4; val by0 = my * 4
    val cx0 = mx * 2; val cy0 = my * 2
    choice match {
      case c: I16Choice =>
        val cbpLuma = if (c.cbpLumaAc) 15 else 0
        val t = c.predMode + c.cbpChroma * 4 + (if (c.cbpLumaAc) 12 else 0)
        w.ue(t + 1 + mbTypeOffset) // mb_type 1..24 (+5 in P slices)
        w.ue(c.chromaMode) // intra_chroma_pred_mode
        w.se(c.qpDelta)
        ctx.qpY = ((ctx.qpY + c.qpDelta) % 52 + 52) % 52
        // luma DC
        val dcNc = ctx.nC(ctx.lumaTcAt(bx0 - 1, by0), ctx.lumaTcAt(bx0, by0 - 1))
        H264Cavlc.encodeResidualBlock(w, c.lumaDc, dcNc)
        var k = 0
        while (k < 16) {
          val (x4, y4) = Blk4x4Pos(k)
          val bx = bx0 + x4; val by = by0 + y4
          if (cbpLuma != 0) {
            val nc = ctx.nC(ctx.lumaTcAt(bx - 1, by), ctx.lumaTcAt(bx, by - 1))
            val ac = java.util.Arrays.copyOfRange(c.lumaAc(k), 1, 16)
            val tc = H264Cavlc.encodeResidualBlock(w, ac, nc)
            ctx.lumaTc(by * lumaGrid + bx) = tc
          } else ctx.lumaTc(by * lumaGrid + bx) = 0
          k += 1
        }
        encodeChromaResidual(w, ctx, mx, my, c.cbpChroma, c.chromaDc, c.chromaAc)
      case c: I4Choice =>
        w.ue(mbTypeOffset) // mb_type: Intra_4x4 (5 in P slices)
        var k = 0
        val newModes = new Array[Int](16)
        while (k < 16) {
          val (x4, y4) = Blk4x4Pos(k)
          def neighborMode(bx: Int, by: Int): Int =
            if (bx < 0 || by < 0 || bx >= lumaGrid || by >= ctx.mbH * 4) 2
            else {
              val nmx = bx / 4; val nmy = by / 4
              val decoded = nmy < my || (nmy == my && nmx < mx) ||
                (nmx == mx && nmy == my && idxOf(bx % 4, by % 4) < k)
              if (!decoded) 2
              else {
                val m = if (nmx == mx && nmy == my) newModes(idxOf(bx % 4, by % 4))
                        else ctx.i4Mode(by * lumaGrid + bx)
                if (m < 0) 2 else m
              }
            }
          val predMode = math.min(
            neighborMode(bx0 + x4 - 1, by0 + y4),
            neighborMode(bx0 + x4, by0 + y4 - 1))
          val mode = c.modes(k)
          if (mode == predMode) w.bit(1)
          else {
            w.bit(0)
            w.u(if (mode < predMode) mode else mode - 1, 3)
          }
          newModes(k) = mode
          k += 1
        }
        w.ue(c.chromaMode) // intra_chroma_pred_mode
        val cbpLuma = (0 until 4).map { q =>
          val any = (0 until 4).exists(i => c.luma(q * 4 + i).exists(_ != 0))
          if (any) 1 << q else 0
        }.sum
        val cbp = cbpLuma | (c.cbpChroma << 4)
        val cn = CbpIntra.indexOf(cbp)
        require(cn >= 0, s"cbp $cbp not in the intra table")
        w.ue(cn)
        if (cbp != 0) {
          w.se(c.qpDelta)
          ctx.qpY = ((ctx.qpY + c.qpDelta) % 52 + 52) % 52
        }
        k = 0
        while (k < 16) {
          val (x4, y4) = Blk4x4Pos(k)
          val bx = bx0 + x4; val by = by0 + y4
          if ((cbpLuma & (1 << (k >> 2))) != 0) {
            val nc = ctx.nC(ctx.lumaTcAt(bx - 1, by), ctx.lumaTcAt(bx, by - 1))
            val tc = H264Cavlc.encodeResidualBlock(w, c.luma(k), nc)
            ctx.lumaTc(by * lumaGrid + bx) = tc
          } else {
            require(c.luma(k).forall(_ == 0),
              s"block $k has coefficients but its cbp bit is clear")
            ctx.lumaTc(by * lumaGrid + bx) = 0
          }
          k += 1
        }
        var bi = 0
        while (bi < 16) {
          val (x4, y4) = Blk4x4Pos(bi)
          ctx.i4Mode((by0 + y4) * lumaGrid + (bx0 + x4)) = newModes(bi)
          bi += 1
        }
        encodeChromaResidual(w, ctx, mx, my, c.cbpChroma, c.chromaDc, c.chromaAc)
    }
  }

  /** Chroma residual serializer, shared with the P-slice encoder
    * ([[H264Inter]]) — the chroma layer is identical for intra and
    * inter macroblocks. */
  private[multimodal] def encodeChromaResidual(
      w: BitWriter, ctx: EncCtx, mx: Int, my: Int,
      cbpChroma: Int, chromaDc: Array[Array[Int]],
      chromaAc: Array[Array[Array[Int]]]): Unit = {
    val chromaGrid = ctx.mbW * 2
    val cx0 = mx * 2; val cy0 = my * 2
    if (cbpChroma != 0) {
      H264Cavlc.encodeResidualBlock(w, chromaDc(0), -1)
      H264Cavlc.encodeResidualBlock(w, chromaDc(1), -1)
    } else require(chromaDc.forall(_.forall(_ == 0)), "chroma DC vs cbp")
    var c = 0
    while (c < 2) {
      val tcArr = if (c == 0) ctx.cbTc else ctx.crTc
      var b = 0
      while (b < 4) {
        val bx = cx0 + (b & 1); val by = cy0 + (b >> 1)
        if (cbpChroma == 2) {
          val nc = ctx.nC(ctx.chromaTcAt(tcArr, bx - 1, by),
            ctx.chromaTcAt(tcArr, bx, by - 1))
          val ac = java.util.Arrays.copyOfRange(chromaAc(c)(b), 1, 16)
          val tc = H264Cavlc.encodeResidualBlock(w, ac, nc)
          tcArr(by * chromaGrid + bx) = tc
        } else {
          require(chromaAc(c)(b).forall(_ == 0), "chroma AC vs cbp")
          tcArr(by * chromaGrid + bx) = 0
        }
        b += 1
      }
      c += 1
    }
  }
}
