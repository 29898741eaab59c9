package graft.multimodal

/** B-slice (bi-predicted) H.264 decode/encode for the CAVLC baseline
  * subset (ITU-T H.264 §7.3.5 / §8.4.1.2) — the round-16 bite of the
  * entropy-coded video surface after complete P slices:
  *
  *  - TWO reference lists of one picture each (`num_ref_idx_active` =
  *    1 per list): RefPicList0[0] = the most recently decoded
  *    reference, RefPicList1[0] = the one before it — the
  *    generalized-B shape where both references are PAST pictures, so
  *    decode order stays display order (the `pic_order_cnt_type = 2`
  *    SPS this repo emits) and no output reordering exists. This is
  *    exactly the initial RefPicList1 the §8.2.4.2.4 default
  *    construction yields for two past references (list1 equals list0
  *    → swap its first two entries). Display-reordered B pyramids
  *    (POC type 0 + DPB output delay) remain outside the subset;
  *  - `B_Skip` runs and `B_Direct_16x16` (mb_type 0) via SPATIAL
  *    direct prediction (§8.4.1.2.2, `direct_spatial_mv_pred_flag`
  *    required 1): per-list reference indices as the minimum positive
  *    over neighbors A/B/C (C→D substitution), the
  *    directZeroPrediction fallback, the §8.4.1.3 median for each
  *    list's vector, and the per-4×4 colZeroFlag override read from
  *    the COLOCATED motion field of RefPicList1[0]
  *    (`direct_8x8_inference_flag` = 0 → full 4×4 granularity);
  *  - `B_L0_16x16` / `B_L1_16x16` / `B_Bi_16x16` (mb_types 1/2/3)
  *    with per-list §8.4.1.3 median motion-vector prediction (a
  *    neighbor predicts only within its own list) and `mvd_l0` /
  *    `mvd_l1` deltas;
  *  - DEFAULT bi-prediction (§8.4.2.3.1, `weighted_bipred_idc` = 0):
  *    each list interpolates independently through the §8.4.2.2 full
  *    quarter-pel luma / eighth-pel chroma machinery of
  *    [[H264Inter]], then averages `(p0 + p1 + 1) >> 1` per sample;
  *  - intra macroblocks inside B slices (mb_type ≥ 23, excluding
  *    I_PCM) through the existing [[H264Intra]] path; CAVLC residuals
  *    over the bi-predicted samples via [[H264Inter.decodePResidual]]
  *    (inter CBP, Table 9-4).
  *
  * B slices are never references here (`nal_ref_idc` = 0 enforced —
  * storing one would need adaptive marking), B two-partition and
  * B_8x8 macroblock types (4..22), weighted/explicit prediction, and
  * temporal direct are rejected loudly, never approximated.
  *
  * Cross-checked against the independent Python implementation
  * (`scripts/h264_cavlc_fixture_gen.py` B-fixture section): decode is
  * held to Python-computed pixels, encode to Python-computed bytes —
  * mixed skip/direct/L0/L1/Bi/intra pictures with quarter-pel
  * vectors, colZero-active colocated motion, and edge clamping.
  */
private[multimodal] object H264BInter {

  import H264.{BitReader, BitWriter, Frame}
  import H264Intra._
  import H264Inter.{Motion, lumaSample, chromaSample,
    motionCompensateRect, decodePResidual, encodePResidual, zeroTc, zeroEncTc}

  /** Per-4×4-block TWO-LIST motion state for one B picture.
    * `kind`: 0 = undecoded, 1 = inter, 2 = intra. A block's list is
    * "used" (refIdx 0) independently per list. */
  private[multimodal] final class BMotion(val mbW: Int, val mbH: Int) {
    private val gw = mbW * 4
    private val gh = mbH * 4
    val mvx = Array.ofDim[Int](2, gw * gh)
    val mvy = Array.ofDim[Int](2, gw * gh)
    val use = Array.ofDim[Boolean](2, gw * gh)
    val kind = new Array[Int](gw * gh)
    def availBlk(bx: Int, by: Int): Boolean =
      bx >= 0 && by >= 0 && bx < gw && by < gh && kind(by * gw + bx) != 0
    /** (mvx, mvy, refIdx) of `list` at a block: intra / unavailable /
      * other-list-only → (0, 0, −1). */
    def infoBlk(list: Int, bx: Int, by: Int): (Int, Int, Int) =
      if (!availBlk(bx, by) || kind(by * gw + bx) != 1 ||
          !use(list)(by * gw + bx)) (0, 0, -1)
      else (mvx(list)(by * gw + bx), mvy(list)(by * gw + bx), 0)
    def setBlk(list: Int, bx: Int, by: Int, x: Int, y: Int): Unit = {
      mvx(list)(by * gw + bx) = x; mvy(list)(by * gw + bx) = y
      use(list)(by * gw + bx) = true; kind(by * gw + bx) = 1
    }
    def setInter(bx: Int, by: Int): Unit = kind(by * gw + bx) = 1
    def setIntra(mx: Int, my: Int): Unit =
      for (by <- my * 4 until my * 4 + 4; bx <- mx * 4 until mx * 4 + 4)
        kind(by * gw + bx) = 2
  }

  /** The colZeroFlag predicate over a colocated motion field: block is
    * inter with refIdx 0 and both vector components in [−1, 1]
    * (quarter-pel). `None` (an IDR or absent colocated picture — all
    * intra) is never colZero. */
  def colZeroOf(colMot: Option[Motion]): (Int, Int) => Boolean =
    colMot match {
      case None => (_, _) => false
      case Some(m) =>
        val gw = m.mbW * 4
        (bx, by) => {
          val at = by * gw + bx
          m.kind(at) == 1 &&
            m.mvx(at) >= -1 && m.mvx(at) <= 1 &&
            m.mvy(at) >= -1 && m.mvy(at) <= 1
        }
    }

  /** §8.4.1.3 median motion-vector prediction for a 16×16 partition in
    * list `list` (neighbors predict only within their own list) — the
    * shared [[H264Inter.mvPredGeneral]] process over a one-list view
    * of the B motion state, so the subtle availability/median rules
    * exist exactly once across the P and B slice kinds. */
  private[multimodal] def mvPredList(m: BMotion, list: Int,
                                     mx: Int, my: Int): (Int, Int) =
    H264Inter.mvPredGeneral(m.availBlk,
      (bx, by) => m.infoBlk(list, bx, by), mx * 4, my * 4, 4)

  /** §8.4.1.2.2 reference-index part of spatial direct: minimum
    * positive refIdx over neighbors A/B/C (C→D substitution) for
    * `list`; −1 when none has the list. */
  private def directRefIdx(m: BMotion, list: Int, mx: Int, my: Int): Int = {
    val bx0 = mx * 4; val by0 = my * 4
    val a = m.infoBlk(list, bx0 - 1, by0)._3
    val b = m.infoBlk(list, bx0, by0 - 1)._3
    val c =
      if (m.availBlk(bx0 + 4, by0 - 1)) m.infoBlk(list, bx0 + 4, by0 - 1)._3
      else m.infoBlk(list, bx0 - 1, by0 - 1)._3
    val pos = Seq(a, b, c).filter(_ >= 0)
    if (pos.isEmpty) -1 else pos.min
  }

  /** The spatial-direct derivation for one MB: MB-level (useL0, useL1,
    * mvL0, mvL1) plus the per-4×4 colZero zeroing. Returns per-list
    * per-block vectors (16 blocks, raster within the MB) and the list
    * usage flags. */
  private[multimodal] def deriveDirect(m: BMotion, mx: Int, my: Int,
      colZero: (Int, Int) => Boolean):
      (Boolean, Boolean, Array[(Int, Int)], Array[(Int, Int)]) = {
    val r0 = directRefIdx(m, 0, mx, my)
    val r1 = directRefIdx(m, 1, mx, my)
    if (r0 < 0 && r1 < 0) {
      // directZeroPredictionFlag: both lists, zero vectors, refIdx 0 —
      // colZero does not apply (vectors are already zero)
      val z = Array.fill(16)((0, 0))
      (true, true, z, z)
    } else {
      val mb0 = if (r0 == 0) mvPredList(m, 0, mx, my) else (0, 0)
      val mb1 = if (r1 == 0) mvPredList(m, 1, mx, my) else (0, 0)
      val v0 = Array.fill(16)(mb0)
      val v1 = Array.fill(16)(mb1)
      var blk = 0
      while (blk < 16) {
        val bx = mx * 4 + (blk & 3); val by = my * 4 + (blk >> 2)
        if (colZero(bx, by)) {
          if (r0 == 0) v0(blk) = (0, 0)
          if (r1 == 0) v1(blk) = (0, 0)
        }
        blk += 1
      }
      (r0 == 0, r1 == 0, v0, v1)
    }
  }

  // ---- motion compensation (two lists) --------------------------------------

  /** Default bi-prediction over the pixel rect: each list interpolates
    * through the full §8.4.2.2 fractional machinery, then
    * `(p0 + p1 + 1) >> 1` per sample (§8.4.2.3.1, weighted_bipred_idc
    * = 0), luma and chroma. */
  private def biCompensateRect(ctx: SliceCtx, ref0: Frame, ref1: Frame,
                               x0: Int, y0: Int, pw: Int, ph: Int,
                               mv0x: Int, mv0y: Int,
                               mv1x: Int, mv1y: Int): Unit = {
    val w = ctx.width; val h = ctx.height
    var py = 0
    while (py < ph) {
      var px = 0
      while (px < pw) {
        val p0 = lumaSample(ref0.y, w, h,
          (x0 + px) * 4 + mv0x, (y0 + py) * 4 + mv0y)
        val p1 = lumaSample(ref1.y, w, h,
          (x0 + px) * 4 + mv1x, (y0 + py) * 4 + mv1y)
        ctx.y((y0 + py) * w + x0 + px) = ((p0 + p1 + 1) >> 1).toByte
        px += 1
      }
      py += 1
    }
    val cw = w / 2; val ch = h / 2
    val cx0 = x0 / 2; val cy0 = y0 / 2
    val cd0x = mv0x >> 3; val cd0y = mv0y >> 3
    val f0x = mv0x & 7; val f0y = mv0y & 7
    val cd1x = mv1x >> 3; val cd1y = mv1y >> 3
    val f1x = mv1x & 7; val f1y = mv1y & 7
    var c = 0
    while (c < 2) {
      val dst = if (c == 0) ctx.cb else ctx.cr
      val s0 = if (c == 0) ref0.cb else ref0.cr
      val s1 = if (c == 0) ref1.cb else ref1.cr
      var cy = 0
      while (cy < ph / 2) {
        var cx = 0
        while (cx < pw / 2) {
          val p0 = chromaSample(s0, cw, ch,
            cx0 + cx + cd0x, cy0 + cy + cd0y, f0x, f0y)
          val p1 = chromaSample(s1, cw, ch,
            cx0 + cx + cd1x, cy0 + cy + cd1y, f1x, f1y)
          dst((cy0 + cy) * cw + cx0 + cx) = ((p0 + p1 + 1) >> 1).toByte
          cx += 1
        }
        cy += 1
      }
      c += 1
    }
  }

  /** MC for a direct/skip MB from the per-block derived vectors. */
  private def directCompensate(ctx: SliceCtx, ref0: Frame, ref1: Frame,
                               mx: Int, my: Int,
                               useL0: Boolean, useL1: Boolean,
                               v0: Array[(Int, Int)],
                               v1: Array[(Int, Int)]): Unit = {
    var blk = 0
    while (blk < 16) {
      val x0 = mx * 16 + (blk & 3) * 4; val y0 = my * 16 + (blk >> 2) * 4
      if (useL0 && useL1)
        biCompensateRect(ctx, ref0, ref1, x0, y0, 4, 4,
          v0(blk)._1, v0(blk)._2, v1(blk)._1, v1(blk)._2)
      else if (useL0)
        motionCompensateRect(ctx, ref0, x0, y0, 4, 4, v0(blk)._1, v0(blk)._2)
      else
        motionCompensateRect(ctx, ref1, x0, y0, 4, 4, v1(blk)._1, v1(blk)._2)
      blk += 1
    }
  }

  private def recordDirect(m: BMotion, mx: Int, my: Int,
                           useL0: Boolean, useL1: Boolean,
                           v0: Array[(Int, Int)],
                           v1: Array[(Int, Int)]): Unit = {
    var blk = 0
    while (blk < 16) {
      val bx = mx * 4 + (blk & 3); val by = my * 4 + (blk >> 2)
      m.setInter(bx, by)
      if (useL0) m.setBlk(0, bx, by, v0(blk)._1, v0(blk)._2)
      if (useL1) m.setBlk(1, bx, by, v1(blk)._1, v1(blk)._2)
      blk += 1
    }
  }

  private def record16(m: BMotion, mx: Int, my: Int,
                       useL0: Boolean, useL1: Boolean,
                       mv0: (Int, Int), mv1: (Int, Int)): Unit =
    for (by <- my * 4 until my * 4 + 4; bx <- mx * 4 until mx * 4 + 4) {
      m.setInter(bx, by)
      if (useL0) m.setBlk(0, bx, by, mv0._1, mv0._2)
      if (useL1) m.setBlk(1, bx, by, mv1._1, mv1._2)
    }

  // ---- B slice: decode -------------------------------------------------------

  /** Decode one B-slice RBSP positioned after `slice_type`. `ref0` /
    * `ref1` are RefPicList0[0] / RefPicList1[0] (UNCROPPED); `colMot`
    * is ref1's motion field when it was inter-coded (None for IDR).
    * Returns the uncropped picture (B pictures are non-references —
    * no motion field escapes). */
  def decodeBSlice(r: BitReader, sps: H264.Sps, ref0: Frame, ref1: Frame,
                   colMot: Option[Motion], initQp: Int): Frame = {
    require(ref0.width == sps.mbWidth * 16 && ref0.height == sps.mbHeight * 16 &&
      ref1.width == ref0.width && ref1.height == ref0.height,
      "reference pictures do not match the SPS macroblock grid")
    r.ue()                    // pic_parameter_set_id
    r.u(sps.log2MaxFrameNum)  // frame_num
    require(r.bit() == 1, "temporal direct mode outside the subset") // direct_spatial_mv_pred_flag
    if (r.bit() == 1) {       // num_ref_idx_active_override_flag
      require(r.ue() == 0 && r.ue() == 0,
        "more than one reference per list outside the subset")
    }
    require(r.bit() == 0, "ref_pic_list_modification (L0) outside the subset")
    require(r.bit() == 0, "ref_pic_list_modification (L1) outside the subset")
    // nal_ref_idc = 0 (enforced by the caller) → no dec_ref_pic_marking
    val sliceQpDelta = r.se()
    val ctx = new SliceCtx(sps.mbWidth, sps.mbHeight,
      ((initQp + sliceQpDelta) % 52 + 52) % 52)
    val mot = new BMotion(sps.mbWidth, sps.mbHeight)
    val colZero = colZeroOf(colMot)
    val total = sps.mbWidth * sps.mbHeight
    var mbIdx = 0
    while (mbIdx < total) {
      val skipRun = r.ue()
      require(mbIdx + skipRun <= total,
        s"mb_skip_run $skipRun overruns the picture at MB $mbIdx")
      var s = 0
      while (s < skipRun) { // B_Skip: direct derivation, no residual
        val mx = mbIdx % sps.mbWidth; val my = mbIdx / sps.mbWidth
        val (u0, u1, v0, v1) = deriveDirect(mot, mx, my, colZero)
        directCompensate(ctx, ref0, ref1, mx, my, u0, u1, v0, v1)
        recordDirect(mot, mx, my, u0, u1, v0, v1)
        zeroTc(ctx, mx, my)
        ctx.mbKind(my * ctx.mbW + mx) = 3
        mbIdx += 1; s += 1
      }
      if (mbIdx < total) {
        val mx = mbIdx % sps.mbWidth; val my = mbIdx / sps.mbWidth
        val mbType = r.ue()
        if (mbType == 0) { // B_Direct_16x16
          val (u0, u1, v0, v1) = deriveDirect(mot, mx, my, colZero)
          directCompensate(ctx, ref0, ref1, mx, my, u0, u1, v0, v1)
          recordDirect(mot, mx, my, u0, u1, v0, v1)
          decodePResidual(r, ctx, mx, my)
        } else if (mbType >= 1 && mbType <= 3) { // B_L0/L1/Bi_16x16
          val useL0 = mbType == 1 || mbType == 3
          val useL1 = mbType == 2 || mbType == 3
          // num_ref_idx_active = 1 → ref_idx te(v) carries no bits;
          // mvd_l0 then mvd_l1 (§7.3.5.1 order)
          val mv0 = if (useL0) {
            val (px, py) = mvPredList(mot, 0, mx, my)
            (px + r.se(), py + r.se())
          } else (0, 0)
          val mv1 = if (useL1) {
            val (px, py) = mvPredList(mot, 1, mx, my)
            (px + r.se(), py + r.se())
          } else (0, 0)
          if (useL0 && useL1)
            biCompensateRect(ctx, ref0, ref1, mx * 16, my * 16, 16, 16,
              mv0._1, mv0._2, mv1._1, mv1._2)
          else if (useL0)
            motionCompensateRect(ctx, ref0, mx * 16, my * 16, 16, 16,
              mv0._1, mv0._2)
          else
            motionCompensateRect(ctx, ref1, mx * 16, my * 16, 16, 16,
              mv1._1, mv1._2)
          record16(mot, mx, my, useL0, useL1, mv0, mv1)
          decodePResidual(r, ctx, mx, my)
        } else if (mbType >= 4 && mbType <= 22)
          throw new IllegalArgumentException(
            s"B-slice mb_type $mbType (two-partition/B_8x8) outside the subset")
        else if (mbType >= 23 && mbType <= 48) {
          val intraType = mbType - 23
          if (intraType == 25)
            throw new IllegalArgumentException("I_PCM inside B slices outside the subset")
          decodeIntraMb(r, ctx, mx, my, intraType)
          mot.setIntra(mx, my)
        } else throw new IllegalArgumentException(s"B-slice mb_type $mbType")
        mbIdx += 1
      }
    }
    r.expectTrailing()
    Frame(ctx.width, ctx.height, ctx.y, ctx.cb, ctx.cr)
  }

  // ---- B slice: encode (the subset fixture serializer) -----------------------

  sealed trait BMbChoice
  case object BSkip extends BMbChoice
  /** B_Direct_16x16 with a coded residual (vectors derived, not sent). */
  final case class BDirectChoice(luma: Array[Array[Int]], cbpChroma: Int,
      qpDelta: Int, chromaDc: Array[Array[Int]],
      chromaAc: Array[Array[Array[Int]]]) extends BMbChoice
  /** Coded 16×16 MB: `mode` 0 = B_L0, 1 = B_L1, 2 = B_Bi; `mv0`/`mv1`
    * are the absolute quarter-pel vectors of the lists the mode uses. */
  final case class B16Choice(mode: Int, mv0: (Int, Int), mv1: (Int, Int),
      luma: Array[Array[Int]], cbpChroma: Int, qpDelta: Int,
      chromaDc: Array[Array[Int]],
      chromaAc: Array[Array[Array[Int]]]) extends BMbChoice
  /** An intra MB inside the B slice. */
  final case class BIntraChoice(choice: MbChoice) extends BMbChoice

  /** Encode one B slice as a non-reference non-IDR NAL (type 1,
    * nal_ref_idc 0). `colZero` is the colocated predicate of
    * RefPicList1[0] ([[colZeroOf]] over the P encoder's returned
    * motion; `(_, _) => false` when it is an IDR). */
  def encodeBSliceNal(mbW: Int, mbH: Int, frameNum: Int, initQp: Int,
                      sliceQpDelta: Int, choices: Seq[BMbChoice],
                      colZero: (Int, Int) => Boolean): Array[Byte] = {
    require(choices.size == mbW * mbH, s"${choices.size} choices for ${mbW}x$mbH")
    // the 4-bit frame_num matches log2_max_frame_num = 4, the ONLY
    // width encodeSpsNal emits — pair this NAL with that SPS
    require(frameNum >= 0 && frameNum < 16,
      s"frame_num $frameNum outside the 4-bit SPS width")
    val w = new BitWriter
    w.ue(0)      // first_mb_in_slice
    w.ue(6)      // slice_type: B (the all-slices-same form)
    w.ue(0)      // pic_parameter_set_id
    w.u(frameNum, 4)
    w.u(1, 1)    // direct_spatial_mv_pred_flag: spatial
    w.u(0, 1)    // num_ref_idx_active_override_flag
    w.u(0, 1)    // ref_pic_list_modification_flag_l0
    w.u(0, 1)    // ref_pic_list_modification_flag_l1
    // nal_ref_idc = 0 → no dec_ref_pic_marking
    w.se(sliceQpDelta)
    val ctx = new EncCtx(mbW, mbH, ((initQp + sliceQpDelta) % 52 + 52) % 52)
    val mot = new BMotion(mbW, mbH)
    var skipRun = 0
    var idx = 0
    while (idx < mbW * mbH) {
      val mx = idx % mbW; val my = idx / mbW
      choices(idx) match {
        case BSkip =>
          val (u0, u1, v0, v1) = deriveDirect(mot, mx, my, colZero)
          recordDirect(mot, mx, my, u0, u1, v0, v1)
          zeroEncTc(ctx, mx, my)
          skipRun += 1
        case c: BDirectChoice =>
          w.ue(skipRun); skipRun = 0
          w.ue(0) // mb_type B_Direct_16x16
          val (u0, u1, v0, v1) = deriveDirect(mot, mx, my, colZero)
          recordDirect(mot, mx, my, u0, u1, v0, v1)
          encodePResidual(w, ctx, mx, my, c.luma, c.cbpChroma, c.qpDelta,
            c.chromaDc, c.chromaAc)
        case c: B16Choice =>
          require(c.mode >= 0 && c.mode <= 2, s"B16 mode ${c.mode}")
          w.ue(skipRun); skipRun = 0
          w.ue(c.mode + 1) // mb_type 1/2/3
          val useL0 = c.mode == 0 || c.mode == 2
          val useL1 = c.mode == 1 || c.mode == 2
          if (useL0) {
            val (px, py) = mvPredList(mot, 0, mx, my)
            w.se(c.mv0._1 - px); w.se(c.mv0._2 - py)
          }
          if (useL1) {
            val (px, py) = mvPredList(mot, 1, mx, my)
            w.se(c.mv1._1 - px); w.se(c.mv1._2 - py)
          }
          record16(mot, mx, my, useL0, useL1, c.mv0, c.mv1)
          encodePResidual(w, ctx, mx, my, c.luma, c.cbpChroma, c.qpDelta,
            c.chromaDc, c.chromaAc)
        case BIntraChoice(intra) =>
          w.ue(skipRun); skipRun = 0
          encodeIntraMb(w, ctx, mx, my, intra, mbTypeOffset = 23)
          mot.setIntra(mx, my)
      }
      idx += 1
    }
    if (skipRun > 0) w.ue(skipRun) // trailing all-skip run
    w.trailing()
    H264.nonRefNonIdrNal(w.toArray)
  }
}
