package graft.multimodal

/** P-slice (inter-predicted) H.264 decode/encode for the baseline
  * subset (ITU-T H.264 §7.3.5 / §8.4) — the next bite of the
  * entropy-coded video surface after CAVLC-intra:
  *
  *  - `P_Skip` runs (`mb_skip_run`, §7.3.4) with the §8.4.1.1 skip
  *    motion-vector rule (zero vector when the left/up neighbor is
  *    unavailable or stationary, else the 16×16 predictor);
  *  - `P_L0_16x16` (mb_type 0) with the §8.4.1.3 median motion-vector
  *    predictor (left/up/up-right neighbors, up-left substitution,
  *    single-matching-reference shortcut, the B/C/D-unavailable → A
  *    special case), `mvd_l0` se(v) deltas, and full CAVLC residuals
  *    over motion-compensated prediction (inter CBP mapping, Table 9-4);
  *  - the two-partition macroblocks `P_L0_L0_16x8` / `P_L0_L0_8x16`
  *    (mb_types 1/2): per-partition mvd with the §8.4.1.3.2 directional
  *    predictors (top prefers B, bottom/left prefer A, right prefers C)
  *    over 4×4-block-granular motion state, the first partition a live
  *    neighbor of the second;
  *  - `P_8x8` sub-macroblock partitions (mb_types 3/4): per-8×8
  *    sub_mb_type down to 4×4 sub-partitions, each with its own mvd
  *    over the 4×4-block motion grid;
  *  - intra macroblocks inside P slices (mb_type ≥ 5 → the I types,
  *    EXCLUDING I_PCM at 30, which is rejected as outside the subset
  *    inside P slices) through the existing [[H264Intra]] path;
  *  - FULL quarter-pel motion compensation: the §8.4.2.2.1 6-tap
  *    half-pel filter (including the unrounded-intermediate center
  *    position) and quarter-pel averaging for luma with the spec's
  *    edge extension (clamped full-pel fetches), and the §8.4.2.2.2
  *    eighth-pel bilinear for chroma.
  *
  * One reference picture (the previously decoded frame) for P slices;
  * B slices (two reference lists, bi-prediction, spatial direct) live
  * in [[H264BInter]] and reuse this file's motion-compensation and
  * residual machinery. CABAC remains outside the subset and is
  * rejected loudly, never approximated.
  *
  * Cross-checked against the independent Python implementation
  * (`scripts/h264_cavlc_fixture_gen.py` P-fixture section): decode is
  * held to Python-computed pixels, encode to Python-computed bytes —
  * mixed skip/coded/intra pictures with negative, edge-clamping, and
  * odd-pel (half-phase chroma) motion vectors.
  */
private[multimodal] object H264Inter {

  import H264.{BitReader, BitWriter, Frame}
  import H264Intra._

  /** Table 9-4, the Inter column: coded_block_pattern codeNum → cbp.
    * Spec-validated by `H264InterSpec`: must be a permutation of 0..47
    * (a mistranscription cannot be one AND round-trip the fixtures). */
  private[multimodal] val CbpInter: Array[Int] = Array(
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41)

  /** Per-4×4-BLOCK motion state for one P picture (grid 4·mbW ×
    * 4·mbH): macroblock partitions (16×8 / 8×16) give neighbors at
    * sub-MB granularity, so prediction reads blocks, not MBs.
    * `kind`: 0 = undecoded, 1 = inter (mv valid, refIdx 0),
    * 2 = intra/PCM (no motion). */
  private[multimodal] final class Motion(val mbW: Int, val mbH: Int) {
    private val gw = mbW * 4
    private val gh = mbH * 4
    val mvx = new Array[Int](gw * gh)
    val mvy = new Array[Int](gw * gh)
    val kind = new Array[Int](gw * gh)
    /** Block available = inside the picture AND already decoded
      * (§6.4.11.7 availability in decode order — within-MB earlier
      * partitions included, later/right MBs excluded). */
    def availBlk(bx: Int, by: Int): Boolean =
      bx >= 0 && by >= 0 && bx < gw && by < gh && kind(by * gw + bx) != 0
    /** (mvx, mvy, refIdx): intra / unavailable → (0, 0, −1). */
    def infoBlk(bx: Int, by: Int): (Int, Int, Int) =
      if (!availBlk(bx, by) || kind(by * gw + bx) != 1) (0, 0, -1)
      else (mvx(by * gw + bx), mvy(by * gw + bx), 0)
    def setRect(bx0: Int, by0: Int, wB: Int, hB: Int,
                x: Int, y: Int, k: Int): Unit =
      for (by <- by0 until by0 + hB; bx <- bx0 until bx0 + wB) {
        mvx(by * gw + bx) = x; mvy(by * gw + bx) = y; kind(by * gw + bx) = k
      }
    /** MB-level write (16×16 partitions, skip, intra). */
    def set(mx: Int, my: Int, x: Int, y: Int, k: Int): Unit =
      setRect(mx * 4, my * 4, 4, 4, x, y, k)
    def inside(mx: Int, my: Int): Boolean =
      mx >= 0 && my >= 0 && mx < mbW && my < mbH
  }

  private[multimodal] def median3(a: Int, b: Int, c: Int): Int =
    math.max(math.min(a, b), math.min(math.max(a, b), c))

  /** Partition kinds for the §8.4.1.3.2 directional preferences. */
  private[multimodal] final val PartNone = 0
  private[multimodal] final val Part16x8Top = 1
  private[multimodal] final val Part16x8Bottom = 2
  private[multimodal] final val Part8x16Left = 3
  private[multimodal] final val Part8x16Right = 4

  /** The GENERAL §8.4.1.3 motion-vector prediction process over
    * neighbor VIEWS — one implementation of the subtle rules (C→D
    * substitution, B/C/D-all-unavailable → A, single-matching-
    * reference shortcut, component median), shared by the P predictor
    * below and [[H264BInter]]'s per-list predictor so the two slice
    * kinds can never drift apart. `avail` is block availability;
    * `info` yields (mvx, mvy, refIdx) with refIdx −1 for
    * unavailable/intra/other-list blocks. */
  private[multimodal] def mvPredGeneral(avail: (Int, Int) => Boolean,
                                        info: (Int, Int) => (Int, Int, Int),
                                        bx0: Int, by0: Int,
                                        wB: Int): (Int, Int) = {
    val a = info(bx0 - 1, by0)
    val b = info(bx0, by0 - 1)
    val cAvail = avail(bx0 + wB, by0 - 1)
    val c = if (cAvail) info(bx0 + wB, by0 - 1)
            else info(bx0 - 1, by0 - 1) // D substitution
    // B, C and D all unavailable and A available → mvA
    val bAvail = avail(bx0, by0 - 1)
    val dAvail = avail(bx0 - 1, by0 - 1)
    if (!bAvail && !cAvail && !dAvail && avail(bx0 - 1, by0))
      (a._1, a._2)
    else {
      val matches = Seq(a, b, c).filter(_._3 == 0)
      if (matches.size == 1) (matches.head._1, matches.head._2)
      else (median3(a._1, b._1, c._1), median3(a._2, b._2, c._2))
    }
  }

  /** §8.4.1.3 motion-vector prediction for the partition whose top-left
    * 4×4 block is (bx0, by0) with size (wB, hB) blocks, refIdxL0 = 0
    * (the one-reference subset). `pref` applies the 16×8/8×16
    * directional shortcut first; [[mvPredGeneral]] otherwise. */
  private[multimodal] def mvPredPartition(mot: Motion, bx0: Int, by0: Int,
                                          wB: Int, hB: Int,
                                          pref: Int): (Int, Int) = {
    // §8.4.1.3.2: directional preference when that neighbor's reference
    // matches (refIdx 0 here)
    pref match {
      case Part16x8Top =>
        val b = mot.infoBlk(bx0, by0 - 1)
        if (b._3 == 0) return (b._1, b._2)
      case Part16x8Bottom | Part8x16Left =>
        val a = mot.infoBlk(bx0 - 1, by0)
        if (a._3 == 0) return (a._1, a._2)
      case Part8x16Right =>
        val c = if (mot.availBlk(bx0 + wB, by0 - 1))
          mot.infoBlk(bx0 + wB, by0 - 1)
        else mot.infoBlk(bx0 - 1, by0 - 1)
        if (c._3 == 0) return (c._1, c._2)
      case _ => ()
    }
    mvPredGeneral(mot.availBlk, mot.infoBlk, bx0, by0, wB)
  }

  /** §8.4.1.3 prediction for a whole-MB 16×16 partition. */
  private[multimodal] def mvPred16x16(mot: Motion, mx: Int, my: Int): (Int, Int) =
    mvPredPartition(mot, mx * 4, my * 4, 4, 4, PartNone)

  /** §8.4.1.1 P_Skip motion vector. */
  private[multimodal] def skipMv(mot: Motion, mx: Int, my: Int): (Int, Int) = {
    val aIn = mot.inside(mx - 1, my)
    val bIn = mot.inside(mx, my - 1)
    if (!aIn || !bIn) (0, 0)
    else {
      val a = mot.infoBlk(mx * 4 - 1, my * 4)
      val b = mot.infoBlk(mx * 4, my * 4 - 1)
      if ((a._3 == 0 && a._1 == 0 && a._2 == 0) ||
          (b._3 == 0 && b._1 == 0 && b._2 == 0)) (0, 0)
      else mvPred16x16(mot, mx, my)
    }
  }

  // ---- motion compensation ------------------------------------------------

  private[multimodal] def clampFetch(p: Array[Byte], w: Int, h: Int, x: Int, y: Int): Int =
    p(math.max(0, math.min(h - 1, y)) * w + math.max(0, math.min(w - 1, x))) & 0xff

  /** §8.4.2.2.1 fractional luma sample at quarter-pel position
    * (xQ, yQ): integer fetches are edge-clamped; half-pel samples come
    * from the 6-tap (1, −5, 20, 20, −5, 1) filter ((v + 16) >> 5, the
    * center half-half j from UNROUNDED intermediates, (v + 512) >> 10);
    * quarter-pel samples average the two nearest integer/half samples
    * with upward rounding. */
  private[multimodal] def lumaSample(p: Array[Byte], w: Int, h: Int, xQ: Int, yQ: Int): Int = {
    val xI = xQ >> 2; val yI = yQ >> 2 // floor for negatives
    val xF = xQ & 3; val yF = yQ & 3
    def g(dx: Int, dy: Int): Int = clampFetch(p, w, h, xI + dx, yI + dy)
    if (xF == 0 && yF == 0) g(0, 0)
    else {
      def clip(v: Int): Int = H264Intra.clip255(v)
      // unrounded 6-tap intermediates
      def b1(dy: Int): Int = // horizontal filter at row yI + dy
        g(-2, dy) - 5 * g(-1, dy) + 20 * g(0, dy) + 20 * g(1, dy) -
          5 * g(2, dy) + g(3, dy)
      def h1(dx: Int): Int = // vertical filter at column xI + dx
        g(dx, -2) - 5 * g(dx, -1) + 20 * g(dx, 0) + 20 * g(dx, 1) -
          5 * g(dx, 2) + g(dx, 3)
      lazy val b = clip((b1(0) + 16) >> 5)   // half-horiz, this row
      lazy val s = clip((b1(1) + 16) >> 5)   // half-horiz, next row
      lazy val hv = clip((h1(0) + 16) >> 5)  // half-vert, this column
      lazy val m = clip((h1(1) + 16) >> 5)   // half-vert, next column
      lazy val j = clip({                    // center: filter the b1 row sums
        val j1 = b1(-2) - 5 * b1(-1) + 20 * b1(0) + 20 * b1(1) -
          5 * b1(2) + b1(3)
        (j1 + 512) >> 10
      })
      def avg(a: Int, c: Int): Int = (a + c + 1) >> 1
      (xF, yF) match {
        case (1, 0) => avg(g(0, 0), b)
        case (2, 0) => b
        case (3, 0) => avg(g(1, 0), b)
        case (0, 1) => avg(g(0, 0), hv)
        case (0, 2) => hv
        case (0, 3) => avg(g(0, 1), hv)
        case (1, 1) => avg(b, hv)
        case (3, 1) => avg(b, m)
        case (1, 3) => avg(hv, s)
        case (3, 3) => avg(m, s)
        case (2, 1) => avg(b, j)
        case (2, 2) => j
        case (2, 3) => avg(j, s)
        case (1, 2) => avg(hv, j)
        case _      => avg(j, m) // (3, 2)
      }
    }
  }

  /** Write the MC prediction for the luma pixel rect (x0, y0, pw, ph)
    * (and its half-size chroma rect) into the slice planes — residuals
    * add on top afterwards. Whole MBs and 16×8/8×16 partitions are
    * both just rects here. */
  private[multimodal] def motionCompensateRect(ctx: SliceCtx, ref: Frame,
                                   x0: Int, y0: Int, pw: Int, ph: Int,
                                   mvx: Int, mvy: Int): Unit = {
    val w = ctx.width; val h = ctx.height
    var py = 0
    while (py < ph) {
      var px = 0
      while (px < pw) {
        ctx.y((y0 + py) * w + x0 + px) =
          lumaSample(ref.y, w, h,
            (x0 + px) * 4 + mvx, (y0 + py) * 4 + mvy).toByte
        px += 1
      }
      py += 1
    }
    // chroma: the same vector at eighth-pel phase (§8.4.2.2.2 bilinear)
    val cw = w / 2; val ch = h / 2
    val cx0 = x0 / 2; val cy0 = y0 / 2
    val cdx = mvx >> 3; val cdy = mvy >> 3
    val xF = mvx & 7; val yF = mvy & 7
    var c = 0
    while (c < 2) {
      val dst = if (c == 0) ctx.cb else ctx.cr
      val src = if (c == 0) ref.cb else ref.cr
      var cy = 0
      while (cy < ph / 2) {
        var cx = 0
        while (cx < pw / 2) {
          val bx = cx0 + cx + cdx; val by = cy0 + cy + cdy
          val v = chromaSample(src, cw, ch, bx, by, xF, yF)
          dst((cy0 + cy) * cw + cx0 + cx) = v.toByte
          cx += 1
        }
        cy += 1
      }
      c += 1
    }
  }

  /** §8.4.2.2.2 chroma sample at integer base (bx, by) with eighth-pel
    * phase (xF, yF): edge-clamped bilinear — shared by the P MC above
    * and the B bi-prediction in [[H264BInter]]. */
  private[multimodal] def chromaSample(src: Array[Byte], cw: Int, ch: Int,
                                       bx: Int, by: Int,
                                       xF: Int, yF: Int): Int =
    if (xF == 0 && yF == 0) clampFetch(src, cw, ch, bx, by)
    else {
      val p00 = clampFetch(src, cw, ch, bx, by)
      val p10 = clampFetch(src, cw, ch, bx + 1, by)
      val p01 = clampFetch(src, cw, ch, bx, by + 1)
      val p11 = clampFetch(src, cw, ch, bx + 1, by + 1)
      ((8 - xF) * (8 - yF) * p00 + xF * (8 - yF) * p10 +
        (8 - xF) * yF * p01 + xF * yF * p11 + 32) >> 6
    }

  /** Whole-MB MC (16×16 partitions and skip). */
  private def motionCompensate(ctx: SliceCtx, ref: Frame, mx: Int, my: Int,
                               mvx: Int, mvy: Int): Unit =
    motionCompensateRect(ctx, ref, mx * 16, my * 16, 16, 16, mvx, mvy)

  // ---- P macroblocks: decode ------------------------------------------------

  /** Decode one P_Skip MB: MC with the skip vector, zero residual. */
  private[multimodal] def decodeSkipMb(ctx: SliceCtx, mot: Motion, ref: Frame,
                           mx: Int, my: Int): Unit = {
    val (mvx, mvy) = skipMv(mot, mx, my)
    motionCompensate(ctx, ref, mx, my, mvx, mvy)
    zeroTc(ctx, mx, my)
    mot.set(mx, my, mvx, mvy, 1)
    ctx.mbKind(my * ctx.mbW + mx) = 3 // inter-decoded (available, not intra)
  }

  private[multimodal] def zeroTc(ctx: SliceCtx, mx: Int, my: Int): Unit = {
    val lumaGrid = ctx.mbW * 4; val chromaGrid = ctx.mbW * 2
    for (k <- 0 until 16) {
      val (x4, y4) = Blk4x4Pos(k)
      ctx.lumaTc((my * 4 + y4) * lumaGrid + mx * 4 + x4) = 0
    }
    for (b <- 0 until 4) {
      val bx = mx * 2 + (b & 1); val by = my * 2 + (b >> 1)
      ctx.cbTc(by * chromaGrid + bx) = 0
      ctx.crTc(by * chromaGrid + bx) = 0
    }
  }

  /** Decode one coded P_L0_16x16 MB (mvd + inter CBP + residuals). */
  private def decodeP16Mb(r: BitReader, ctx: SliceCtx, mot: Motion, ref: Frame,
                          mx: Int, my: Int): Unit = {
    val (px, py) = mvPred16x16(mot, mx, my)
    val mvx = px + r.se()
    val mvy = py + r.se()
    motionCompensate(ctx, ref, mx, my, mvx, mvy)
    mot.set(mx, my, mvx, mvy, 1)
    decodePResidual(r, ctx, mx, my)
  }

  /** Decode one two-partition MB: P_L0_L0_16x8 (mb_type 1) or
    * P_L0_L0_8x16 (mb_type 2). Each partition carries its own mvd; the
    * §8.4.1.3.2 directional predictor applies per partition, and the
    * first partition's decoded vector is a live neighbor for the
    * second's. Residual layer is MB-level, shared with P_L0_16x16. */
  private def decodeP2Mb(r: BitReader, ctx: SliceCtx, mot: Motion, ref: Frame,
                         mx: Int, my: Int, vertical: Boolean): Unit = {
    val bx0 = mx * 4; val by0 = my * 4
    val parts =
      if (!vertical) Seq( // 16x8: top then bottom
        (bx0, by0, 4, 2, Part16x8Top), (bx0, by0 + 2, 4, 2, Part16x8Bottom))
      else Seq(           // 8x16: left then right
        (bx0, by0, 2, 4, Part8x16Left), (bx0 + 2, by0, 2, 4, Part8x16Right))
    parts.foreach { case (bx, by, wB, hB, pref) =>
      val (px, py) = mvPredPartition(mot, bx, by, wB, hB, pref)
      val mvx = px + r.se()
      val mvy = py + r.se()
      mot.setRect(bx, by, wB, hB, mvx, mvy, 1)
      motionCompensateRect(ctx, ref, bx * 4, by * 4, wB * 4, hB * 4, mvx, mvy)
    }
    decodePResidual(r, ctx, mx, my)
  }

  /** The sub-partition layout of one 8×8 (block coords + sizes), per
    * sub_mb_type: 0 = 8×8, 1 = 8×4 (top, bottom), 2 = 4×8 (left,
    * right), 3 = 4×4 (2×2 raster). */
  private def subPartitions(px8: Int, py8: Int,
                            subType: Int): Seq[(Int, Int, Int, Int)] =
    subType match {
      case 0 => Seq((px8, py8, 2, 2))
      case 1 => Seq((px8, py8, 2, 1), (px8, py8 + 1, 2, 1))
      case 2 => Seq((px8, py8, 1, 2), (px8 + 1, py8, 1, 2))
      case _ => Seq((px8, py8, 1, 1), (px8 + 1, py8, 1, 1),
                    (px8, py8 + 1, 1, 1), (px8 + 1, py8 + 1, 1, 1))
    }

  /** Decode one P_8x8 MB (mb_type 3 / 4=ref0 — identical with one
    * reference): four sub_mb_types, then per-sub-partition mvds in
    * raster order; sub-partition prediction is the GENERAL §8.4.1.3
    * process (the directional shortcuts apply only to 16×8/8×16), each
    * decoded sub-partition a live neighbor of the next. MB-level
    * residual shared with the other inter shapes. */
  private def decodeP8x8Mb(r: BitReader, ctx: SliceCtx, mot: Motion,
                           ref: Frame, mx: Int, my: Int): Unit = {
    val subTypes = Array.fill(4) {
      val st = r.ue()
      require(st <= 3, s"P sub_mb_type $st (B forms) outside P slices")
      st
    }
    val bx0 = mx * 4; val by0 = my * 4
    for (p8 <- 0 until 4) {
      val px8 = bx0 + (p8 & 1) * 2; val py8 = by0 + (p8 >> 1) * 2
      subPartitions(px8, py8, subTypes(p8)).foreach { case (bx, by, wB, hB) =>
        val (px, py) = mvPredPartition(mot, bx, by, wB, hB, PartNone)
        val vx = px + r.se()
        val vy = py + r.se()
        mot.setRect(bx, by, wB, hB, vx, vy, 1)
        motionCompensateRect(ctx, ref, bx * 4, by * 4, wB * 4, hB * 4, vx, vy)
      }
    }
    decodePResidual(r, ctx, mx, my)
  }

  /** The MB-level inter residual layer (inter CBP → qp delta → luma
    * 4×4 CAVLC blocks → chroma DC/AC), added onto whatever prediction
    * already sits in the planes. */
  private[multimodal] def decodePResidual(r: BitReader, ctx: SliceCtx,
                              mx: Int, my: Int): Unit = {
    val cn = r.ue()
    require(cn < 48, s"inter coded_block_pattern codeNum $cn")
    val cbp = CbpInter(cn)
    val cbpLuma = cbp & 15
    val cbpChroma = cbp >> 4
    require(cbpChroma <= 2, s"chroma cbp $cbpChroma")
    if (cbp != 0) {
      val delta = r.se()
      ctx.qpY = ((ctx.qpY + delta) % 52 + 52) % 52
    }
    val qp = ctx.qpY
    val qpc = chromaQp(qp)
    val lumaGrid = ctx.mbW * 4; val chromaGrid = ctx.mbW * 2
    val bx0 = mx * 4; val by0 = my * 4
    val cx0 = mx * 2; val cy0 = my * 2

    // luma residual: full 16-coefficient blocks (no DC split for inter)
    val yPlane = ctx.y
    var k = 0
    while (k < 16) {
      val (x4, y4) = Blk4x4Pos(k)
      val bx = bx0 + x4; val by = by0 + y4
      if ((cbpLuma & (1 << (k >> 2))) != 0) {
        val nc = ctx.nC(ctx.lumaTcAt(bx - 1, by), ctx.lumaTcAt(bx, by - 1))
        val blk = H264Cavlc.decodeResidualBlock(r, nc, 16)
        ctx.lumaTc(by * lumaGrid + bx) = blk.totalCoeff
        val d = dequant4x4(blk.levels, qp, skipDc = false, dcOverride = 0)
        val x0 = mx * 16 + x4 * 4; val y0 = my * 16 + y4 * 4
        inverseTransformAdd(d, (i, j, res) => {
          val at = (y0 + j) * ctx.width + x0 + i
          yPlane(at) = clip255((yPlane(at) & 0xff) + res).toByte
        })
      } else ctx.lumaTc(by * lumaGrid + bx) = 0
      k += 1
    }
    // chroma residual over the MC prediction
    val cbDc = new Array[Int](4); val crDc = new Array[Int](4)
    if (cbpChroma != 0) {
      System.arraycopy(H264Cavlc.decodeResidualBlock(r, -1, 4).levels, 0, cbDc, 0, 4)
      System.arraycopy(H264Cavlc.decodeResidualBlock(r, -1, 4).levels, 0, crDc, 0, 4)
    }
    val cw = ctx.width / 2
    var c = 0
    while (c < 2) {
      val (tcArr, dcIn, plane) =
        if (c == 0) (ctx.cbTc, cbDc, ctx.cb) else (ctx.crTc, crDc, ctx.cr)
      val dc = chromaDcTransform(dcIn, qpc)
      var b = 0
      while (b < 4) {
        val bx = cx0 + (b & 1); val by = cy0 + (b >> 1)
        val acZz = new Array[Int](16)
        if (cbpChroma == 2) {
          val nc = ctx.nC(ctx.chromaTcAt(tcArr, bx - 1, by),
            ctx.chromaTcAt(tcArr, bx, by - 1))
          val blk = H264Cavlc.decodeResidualBlock(r, nc, 15)
          System.arraycopy(blk.levels, 0, acZz, 1, 15)
          tcArr(by * chromaGrid + bx) = blk.totalCoeff
        } else tcArr(by * chromaGrid + bx) = 0
        val d = dequant4x4(acZz, qpc, skipDc = true, dcOverride = dc(b))
        val x0 = mx * 8 + (b & 1) * 4; val y0 = my * 8 + (b >> 1) * 4
        inverseTransformAdd(d, (i, j, res) => {
          val at = (y0 + j) * cw + x0 + i
          plane(at) = clip255((plane(at) & 0xff) + res).toByte
        })
        b += 1
      }
      c += 1
    }
    ctx.mbKind(my * ctx.mbW + mx) = 3
  }

  // ---- P slice: decode ------------------------------------------------------

  /** Decode one P-slice RBSP (header fields after slice_type already
    * validated by the caller's contract below). `ref` is the previous
    * decoded picture, UNCROPPED. Returns the uncropped picture AND its
    * 4×4-block motion field — kept by the caller so a later B slice's
    * spatial-direct colZeroFlag (§8.4.1.2.2) can read the colocated
    * motion. */
  def decodePSlice(r: BitReader, sps: H264.Sps, ref: Frame, initQp: Int,
                   nalRefIdc: Int): (Frame, Motion) = {
    require(ref.width == sps.mbWidth * 16 && ref.height == sps.mbHeight * 16,
      "reference picture does not match the SPS macroblock grid")
    r.ue()                    // pic_parameter_set_id
    r.u(sps.log2MaxFrameNum)  // frame_num
    if (r.bit() == 1) {       // num_ref_idx_active_override_flag
      require(r.ue() == 0, "more than one L0 reference outside the subset")
    }
    require(r.bit() == 0, "ref_pic_list_modification outside the subset")
    if (nalRefIdc != 0)
      require(r.bit() == 0, "adaptive ref-pic marking outside the subset")
    val sliceQpDelta = r.se()
    val ctx = new SliceCtx(sps.mbWidth, sps.mbHeight,
      ((initQp + sliceQpDelta) % 52 + 52) % 52)
    val mot = new Motion(sps.mbWidth, sps.mbHeight)
    val total = sps.mbWidth * sps.mbHeight
    var mbIdx = 0
    while (mbIdx < total) {
      val skipRun = r.ue()
      require(mbIdx + skipRun <= total,
        s"mb_skip_run $skipRun overruns the picture at MB $mbIdx")
      var s = 0
      while (s < skipRun) {
        decodeSkipMb(ctx, mot, ref, mbIdx % sps.mbWidth, mbIdx / sps.mbWidth)
        mbIdx += 1; s += 1
      }
      if (mbIdx < total) {
        val mx = mbIdx % sps.mbWidth; val my = mbIdx / sps.mbWidth
        val mbType = r.ue()
        if (mbType == 0) decodeP16Mb(r, ctx, mot, ref, mx, my)
        else if (mbType == 1) decodeP2Mb(r, ctx, mot, ref, mx, my, vertical = false)
        else if (mbType == 2) decodeP2Mb(r, ctx, mot, ref, mx, my, vertical = true)
        else if (mbType == 3 || mbType == 4)
          decodeP8x8Mb(r, ctx, mot, ref, mx, my)
        else if (mbType >= 5 && mbType <= 30) {
          val intraType = mbType - 5
          if (intraType == 25)
            throw new IllegalArgumentException("I_PCM inside P slices outside the subset")
          decodeIntraMb(r, ctx, mx, my, intraType)
          mot.set(mx, my, 0, 0, 2)
        } else throw new IllegalArgumentException(s"P-slice mb_type $mbType")
        mbIdx += 1
      }
    }
    r.expectTrailing()
    (Frame(ctx.width, ctx.height, ctx.y, ctx.cb, ctx.cr), mot)
  }

  // ---- P slice: encode (the subset fixture serializer) ----------------------

  sealed trait PMbChoice
  case object PSkip extends PMbChoice
  /** Coded 16×16 inter MB: absolute quarter-pel vector, 16 scan-indexed
    * luma residual blocks, chroma as in the intra choices. */
  final case class P16Choice(mvx: Int, mvy: Int, luma: Array[Array[Int]],
      cbpChroma: Int, qpDelta: Int, chromaDc: Array[Array[Int]],
      chromaAc: Array[Array[Array[Int]]]) extends PMbChoice
  /** Two-partition inter MB (16×8 when `vertical` is false, 8×16 when
    * true): one absolute quarter-pel vector per partition, MB-level
    * residual as in [[P16Choice]]. */
  final case class P2Choice(vertical: Boolean, mv0: (Int, Int),
      mv1: (Int, Int), luma: Array[Array[Int]], cbpChroma: Int,
      qpDelta: Int, chromaDc: Array[Array[Int]],
      chromaAc: Array[Array[Array[Int]]]) extends PMbChoice
  /** P_8x8 MB: four sub_mb_types (0 = 8×8, 1 = 8×4, 2 = 4×8, 3 = 4×4)
    * and, per 8×8, the absolute quarter-pel vectors of its
    * sub-partitions (1/2/2/4 of them, in the decode order above);
    * MB-level residual as in [[P16Choice]]. */
  final case class P8x8Choice(subTypes: Array[Int],
      mvs: Seq[Seq[(Int, Int)]], luma: Array[Array[Int]], cbpChroma: Int,
      qpDelta: Int, chromaDc: Array[Array[Int]],
      chromaAc: Array[Array[Array[Int]]]) extends PMbChoice
  /** An intra MB inside the P slice. */
  final case class PIntraChoice(choice: MbChoice) extends PMbChoice

  /** Encode one P slice as a non-IDR NAL (type 1). */
  def encodePSliceNal(mbW: Int, mbH: Int, frameNum: Int, initQp: Int,
                      sliceQpDelta: Int, choices: Seq[PMbChoice]): Array[Byte] =
    encodePSliceNalWithMotion(mbW, mbH, frameNum, initQp, sliceQpDelta,
      choices)._1

  /** [[encodePSliceNal]] also returning the encoded picture's motion
    * field — a GOP builder encoding a later B slice needs it for the
    * colocated colZeroFlag derivation ([[H264BInter.colZeroOf]]). */
  def encodePSliceNalWithMotion(mbW: Int, mbH: Int, frameNum: Int, initQp: Int,
                                sliceQpDelta: Int,
                                choices: Seq[PMbChoice]): (Array[Byte], Motion) = {
    require(choices.size == mbW * mbH, s"${choices.size} choices for ${mbW}x$mbH")
    // the 4-bit frame_num matches log2_max_frame_num = 4, the ONLY
    // width encodeSpsNal emits — pair this NAL with that SPS
    require(frameNum >= 0 && frameNum < 16,
      s"frame_num $frameNum outside the 4-bit SPS width")
    val w = new BitWriter
    w.ue(0)      // first_mb_in_slice
    w.ue(5)      // slice_type: P (the all-slices-same form)
    w.ue(0)      // pic_parameter_set_id
    w.u(frameNum, 4)
    w.u(0, 1)    // num_ref_idx_active_override_flag
    w.u(0, 1)    // ref_pic_list_modification_flag_l0
    w.u(0, 1)    // adaptive_ref_pic_marking_mode_flag (nal_ref_idc > 0)
    w.se(sliceQpDelta)
    val ctx = new EncCtx(mbW, mbH, ((initQp + sliceQpDelta) % 52 + 52) % 52)
    val mot = new Motion(mbW, mbH)
    var skipRun = 0
    var idx = 0
    while (idx < mbW * mbH) {
      val mx = idx % mbW; val my = idx / mbW
      choices(idx) match {
        case PSkip =>
          val (vx, vy) = skipMv(mot, mx, my)
          mot.set(mx, my, vx, vy, 1)
          zeroEncTc(ctx, mx, my)
          skipRun += 1
        case c: P16Choice =>
          w.ue(skipRun); skipRun = 0
          w.ue(0) // mb_type P_L0_16x16
          val (px, py) = mvPred16x16(mot, mx, my)
          w.se(c.mvx - px)
          w.se(c.mvy - py)
          mot.set(mx, my, c.mvx, c.mvy, 1)
          encodePResidual(w, ctx, mx, my, c.luma, c.cbpChroma, c.qpDelta,
            c.chromaDc, c.chromaAc)
        case c: P2Choice =>
          w.ue(skipRun); skipRun = 0
          w.ue(if (c.vertical) 2 else 1) // mb_type 16x8 / 8x16
          val bx0 = mx * 4; val by0 = my * 4
          val parts =
            if (!c.vertical) Seq(
              (bx0, by0, 4, 2, Part16x8Top, c.mv0),
              (bx0, by0 + 2, 4, 2, Part16x8Bottom, c.mv1))
            else Seq(
              (bx0, by0, 2, 4, Part8x16Left, c.mv0),
              (bx0 + 2, by0, 2, 4, Part8x16Right, c.mv1))
          parts.foreach { case (bx, by, wB, hB, pref, (vx, vy)) =>
            val (px, py) = mvPredPartition(mot, bx, by, wB, hB, pref)
            w.se(vx - px)
            w.se(vy - py)
            mot.setRect(bx, by, wB, hB, vx, vy, 1)
          }
          encodePResidual(w, ctx, mx, my, c.luma, c.cbpChroma, c.qpDelta,
            c.chromaDc, c.chromaAc)
        case c: P8x8Choice =>
          w.ue(skipRun); skipRun = 0
          w.ue(3) // mb_type P_8x8
          require(c.subTypes.length == 4 && c.subTypes.forall(_ <= 3))
          c.subTypes.foreach(st => w.ue(st))
          val bx0 = mx * 4; val by0 = my * 4
          for (p8 <- 0 until 4) {
            val px8 = bx0 + (p8 & 1) * 2; val py8 = by0 + (p8 >> 1) * 2
            val parts = subPartitions(px8, py8, c.subTypes(p8))
            require(parts.size == c.mvs(p8).size,
              s"sub_mb_type ${c.subTypes(p8)} needs ${parts.size} vectors")
            parts.zip(c.mvs(p8)).foreach { case ((bx, by, wB, hB), (vx, vy)) =>
              val (px, py) = mvPredPartition(mot, bx, by, wB, hB, PartNone)
              w.se(vx - px)
              w.se(vy - py)
              mot.setRect(bx, by, wB, hB, vx, vy, 1)
            }
          }
          encodePResidual(w, ctx, mx, my, c.luma, c.cbpChroma, c.qpDelta,
            c.chromaDc, c.chromaAc)
        case PIntraChoice(intra) =>
          w.ue(skipRun); skipRun = 0
          encodeIntraMb(w, ctx, mx, my, intra, mbTypeOffset = 5)
          mot.set(mx, my, 0, 0, 2)
      }
      idx += 1
    }
    if (skipRun > 0) w.ue(skipRun) // trailing all-skip run
    w.trailing()
    (H264.nonIdrNal(w.toArray), mot)
  }

  private[multimodal] def zeroEncTc(ctx: EncCtx, mx: Int, my: Int): Unit = {
    val lumaGrid = ctx.mbW * 4; val chromaGrid = ctx.mbW * 2
    for (k <- 0 until 16) {
      val (x4, y4) = Blk4x4Pos(k)
      ctx.lumaTc((my * 4 + y4) * lumaGrid + mx * 4 + x4) = 0
    }
    for (b <- 0 until 4) {
      val bx = mx * 2 + (b & 1); val by = my * 2 + (b >> 1)
      ctx.cbTc(by * chromaGrid + bx) = 0
      ctx.crTc(by * chromaGrid + bx) = 0
    }
  }

  private[multimodal] def encodePResidual(w: BitWriter, ctx: EncCtx, mx: Int, my: Int,
                              luma: Array[Array[Int]], cbpChroma: Int,
                              qpDelta: Int, chromaDc: Array[Array[Int]],
                              chromaAc: Array[Array[Array[Int]]]): Unit = {
    val lumaGrid = ctx.mbW * 4
    val bx0 = mx * 4; val by0 = my * 4
    val cbpLuma = (0 until 4).map { q =>
      val any = (0 until 4).exists(i => luma(q * 4 + i).exists(_ != 0))
      if (any) 1 << q else 0
    }.sum
    val cbp = cbpLuma | (cbpChroma << 4)
    val cn = CbpInter.indexOf(cbp)
    require(cn >= 0, s"cbp $cbp not in the inter table")
    w.ue(cn)
    if (cbp != 0) {
      w.se(qpDelta)
      ctx.qpY = ((ctx.qpY + qpDelta) % 52 + 52) % 52
    }
    var k = 0
    while (k < 16) {
      val (x4, y4) = Blk4x4Pos(k)
      val bx = bx0 + x4; val by = by0 + y4
      if ((cbpLuma & (1 << (k >> 2))) != 0) {
        val nc = ctx.nC(ctx.lumaTcAt(bx - 1, by), ctx.lumaTcAt(bx, by - 1))
        val tc = H264Cavlc.encodeResidualBlock(w, luma(k), nc)
        ctx.lumaTc(by * lumaGrid + bx) = tc
      } else {
        require(luma(k).forall(_ == 0),
          s"luma block $k has coefficients but its cbp bit is clear")
        ctx.lumaTc(by * lumaGrid + bx) = 0
      }
      k += 1
    }
    encodeChromaResidual(w, ctx, mx, my, cbpChroma, chromaDc, chromaAc)
  }
}
