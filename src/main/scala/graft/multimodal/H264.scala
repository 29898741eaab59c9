package graft.multimodal

/** H.264 (ITU-T Rec. H.264 / ISO/IEC 14496-10) — the I_PCM subset,
  * implemented from the public spec text with no codec library.
  *
  * I_PCM is the one H.264 macroblock mode that is raw: after the
  * Exp-Golomb slice header, each macroblock is `mb_type = 25` (I_PCM in
  * I slices, Table 7-11), a byte-alignment run, then 256 luma + 2×64
  * chroma samples verbatim (7.3.5 `macroblock_layer`). A baseline
  * stream built only of I_PCM IDR slices therefore decodes EXACTLY —
  * no prediction, no transform, no entropy coding beyond the headers —
  * which makes real pixel decode implementable from the spec alone:
  *
  *  - NAL layer (7.3.1, 7.4.1): 1-byte header + RBSP with emulation
  *    prevention (`0x000003` escaping) both directions;
  *  - Exp-Golomb ue(v)/se(v) (9.1) bit codecs;
  *  - SPS (7.3.2.1, baseline profile 66, `pic_order_cnt_type = 2`,
  *    `frame_mbs_only_flag = 1`, optional frame cropping — CropUnitX =
  *    SubWidthC = 2 and CropUnitY = 2 for 4:2:0 frames, 7.4.2.1.1);
  *  - PPS (7.3.2.2, CAVLC, single slice group);
  *  - IDR slice header (7.3.3: I slice, `dec_ref_pic_marking` for IDR)
  *    and the I_PCM `slice_data`/`macroblock_layer` walk.
  *
  * The encoder exists so the synthetic-media generator can emit REAL
  * H.264 the decoder can be held to (and any spec-conformant decoder
  * would decode identically — I_PCM is lossless by definition). Beyond
  * I_PCM, CAVLC-coded INTRA macroblocks (Intra_4x4/Intra_16x16, §9.2
  * residual decoding, §8.3 prediction, §8.5 transforms) decode for real
  * via [[H264Intra]]/[[H264Cavlc]]; CABAC streams and inter-predicted
  * (P/B) slices remain outside the subset, rejected loudly — the
  * multimodal stub now covers only those. Reference behavior context:
  * the reference treats media
  * values as opaque payloads end-to-end (`serdes/JsonSerde.scala:10-36`
  * is its only value codec), so this whole layer is beyond-reference
  * capability for the multimodal pipeline family.
  */
object H264 {

  /** One decoded (or to-encode) 4:2:0 frame. Planes are raster order;
    * `cb`/`cr` are (width/2)×(height/2). Dimensions must be even (a
    * 4:2:0 chroma grid and the ×2 crop units both require it). */
  final case class Frame(width: Int, height: Int,
                         y: Array[Byte], cb: Array[Byte], cr: Array[Byte]) {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      s"4:2:0 frames need positive even dims, got ${width}x$height")
    require(y.length == width * height, "luma plane size")
    require(cb.length == width * height / 4 && cr.length == cb.length,
      "chroma plane size")
  }

  /** SPS fields the I_PCM subset needs downstream. */
  final case class Sps(mbWidth: Int, mbHeight: Int,
                       cropRight: Int, cropBottom: Int,
                       log2MaxFrameNum: Int) {
    def width: Int = mbWidth * 16 - 2 * cropRight
    def height: Int = mbHeight * 16 - 2 * cropBottom
  }

  // ---- bit IO with Exp-Golomb (spec 9.1) ---------------------------------

  private[multimodal] final class BitWriter {
    private val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nBits += 1
      if (nBits == 8) { out += cur.toByte; cur = 0; nBits = 0 }
    }
    /** u(n): n-bit unsigned, MSB first. */
    def u(v: Int, n: Int): Unit = {
      require(n >= 0 && n <= 31 && v >= 0 && (n == 31 || v < (1 << n)),
        s"u($v, $n) out of range")
      var i = n - 1
      while (i >= 0) { bit((v >>> i) & 1); i -= 1 }
    }
    /** ue(v): Exp-Golomb — (len−1) zeros, then (codeNum+1) in len bits. */
    def ue(v: Int): Unit = {
      require(v >= 0 && v < Int.MaxValue, s"ue($v)")
      val cw = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(cw)
      u(0, len - 1)
      u(cw, len)
    }
    /** se(v): signed Exp-Golomb (9.1.1: k odd → +(k+1)/2, even → −k/2). */
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def byteAligned: Boolean = nBits == 0
    /** `pcm_alignment_zero_bit` run / rbsp alignment zeros. */
    def alignZero(): Unit = while (!byteAligned) bit(0)
    def rawByte(b: Byte): Unit = { require(byteAligned); out += b }
    /** rbsp_trailing_bits: stop bit then zero-pad to a byte. */
    def trailing(): Unit = { bit(1); alignZero() }
    def toArray: Array[Byte] = { require(byteAligned, "unterminated RBSP"); out.toArray }
  }

  private[multimodal] final class BitReader(b: Array[Byte]) {
    private var pos = 0 // absolute bit position
    private def ensure(n: Int): Unit =
      require(pos + n <= b.length * 8, s"RBSP underrun at bit $pos (+$n)")
    def bit(): Int = { ensure(1); val v = (b(pos >> 3) >> (7 - (pos & 7))) & 1; pos += 1; v }
    def u(n: Int): Int = {
      require(n >= 0 && n <= 31, s"u($n)"); ensure(n)
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (bit() == 0) { zeros += 1; require(zeros < 31, "ue() run too long") }
      if (zeros == 0) 0 else ((1 << zeros) | u(zeros)) - 1
    }
    def se(): Int = { val k = ue(); if ((k & 1) == 1) (k + 1) / 2 else -(k / 2) }
    def alignZero(): Unit = while ((pos & 7) != 0)
      require(bit() == 0, "alignment bit not zero")
    def rawByte(): Byte = { require((pos & 7) == 0, "not byte-aligned"); ensure(8); val v = b(pos >> 3); pos += 8; v }
    /** rbsp_trailing_bits: a stop 1 then only zeros to the end — the
      * full-consumption check that keeps a garbage stream from parsing
      * as a plausible short slice. */
    def expectTrailing(): Unit = {
      require(bit() == 1, "rbsp_stop_one_bit missing after slice data")
      while (pos < b.length * 8)
        require(bit() == 0, "nonzero bit after the rbsp stop bit")
    }
  }

  // ---- RBSP ⇄ EBSP (emulation prevention, 7.3.1/7.4.1) -------------------

  /** Insert `emulation_prevention_three_byte`: any 0x00 0x00 followed by
    * a byte ≤ 0x03 gains a 0x03 between them. */
  private[multimodal] def rbspToEbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 8)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val v = rbsp(i) & 0xff
      if (zeros >= 2 && v <= 3) { out.write(3); zeros = 0 }
      out.write(v)
      zeros = if (v == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  /** Strip `0x03` from every `0x00 0x00 0x03` run. */
  private[multimodal] def ebspToRbsp(ebsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(ebsp.length)
    var zeros = 0
    var i = 0
    while (i < ebsp.length) {
      val v = ebsp(i) & 0xff
      if (v == 3 && zeros >= 2) zeros = 0 // the escape byte itself: drop
      else {
        out.write(v)
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  // ---- NAL types ----------------------------------------------------------

  val NalIdr = 5
  val NalSps = 7
  val NalPps = 8
  val NalNonIdr = 1

  private def nal(nalType: Int, refIdc: Int, rbsp: Array[Byte]): Array[Byte] =
    Array(((refIdc << 5) | nalType).toByte) ++ rbspToEbsp(rbsp)

  /** A non-IDR coded-slice NAL (type 1) around a P-slice RBSP — the
    * [[H264Inter]] encoder's wrapper (ref idc 2: a stored reference). */
  private[multimodal] def nonIdrNal(rbsp: Array[Byte]): Array[Byte] =
    nal(NalNonIdr, refIdc = 2, rbsp)

  /** A NON-REFERENCE coded-slice NAL (type 1, nal_ref_idc 0) — the
    * [[H264BInter]] encoder's wrapper (B pictures are never stored). */
  private[multimodal] def nonRefNonIdrNal(rbsp: Array[Byte]): Array[Byte] =
    nal(NalNonIdr, refIdc = 0, rbsp)

  def nalType(nalUnit: Array[Byte]): Int = nalUnit(0) & 0x1f

  // ---- SPS ---------------------------------------------------------------

  /** Baseline (profile 66) SPS for a frame-only 4:2:0 stream of the
    * given EVEN pixel dimensions; cropping expresses non-multiple-of-16
    * sizes exactly. `numRefFrames` sizes the DPB the stream declares:
    * 0 for all-IDR, 1 for IDR+P, 2 for the IDR+P+B GOPs (a B needs two
    * stored references). */
  def encodeSpsNal(width: Int, height: Int,
                   numRefFrames: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      s"even dims required, got ${width}x$height")
    require(numRefFrames >= 0 && numRefFrames <= 2,
      s"numRefFrames $numRefFrames outside the subset")
    val mbW = (width + 15) / 16
    val mbH = (height + 15) / 16
    val cropRight = (mbW * 16 - width) / 2
    val cropBottom = (mbH * 16 - height) / 2
    val w = new BitWriter
    w.u(66, 8) // profile_idc: baseline
    w.u(0, 8)  // constraint flags + reserved
    w.u(10, 8) // level_idc 1.0 — far above these tiny frames' MB rate
    w.ue(0)    // seq_parameter_set_id
    w.ue(0)    // log2_max_frame_num_minus4 → MaxFrameNum 16
    w.ue(2)    // pic_order_cnt_type 2: order = decode order, no POC syntax
    w.ue(numRefFrames) // max_num_ref_frames
    w.u(0, 1)  // gaps_in_frame_num_value_allowed_flag
    w.ue(mbW - 1)
    w.ue(mbH - 1)
    w.u(1, 1)  // frame_mbs_only_flag
    w.u(0, 1)  // direct_8x8_inference_flag
    if (cropRight == 0 && cropBottom == 0) w.u(0, 1)
    else {
      w.u(1, 1) // frame_cropping_flag
      w.ue(0); w.ue(cropRight); w.ue(0); w.ue(cropBottom)
    }
    w.u(0, 1)  // vui_parameters_present_flag
    w.trailing()
    nal(NalSps, refIdc = 3, w.toArray)
  }

  def parseSps(nalUnit: Array[Byte]): Sps = {
    require(nalType(nalUnit) == NalSps, s"not an SPS NAL: type ${nalType(nalUnit)}")
    val r = new BitReader(ebspToRbsp(nalUnit.drop(1)))
    val profile = r.u(8)
    r.u(8) // constraint flags
    r.u(8) // level
    r.ue() // sps id
    // profiles ≥ High carry chroma/bit-depth/scaling syntax here; the
    // I_PCM subset speaks baseline/main/extended (4:2:0 implied)
    // full spec list (7.4.2.1.1): every profile_idc whose SPS carries
    // chroma_format/bit-depth/scaling syntax after sps_id — misparsing
    // one of these would read those bits as log2_max_frame_num/poc
    require(!Set(100, 110, 122, 244, 44, 83, 86, 118, 128,
                 134, 135, 138, 139).contains(profile),
      s"high-profile SPS (profile_idc $profile) outside the I_PCM subset")
    val log2MaxFrameNum = r.ue() + 4
    val pocType = r.ue()
    require(pocType == 2, s"pic_order_cnt_type $pocType outside the I_PCM subset")
    r.ue()    // max_num_ref_frames
    r.u(1)    // gaps_in_frame_num_value_allowed_flag
    val mbW = r.ue() + 1
    val mbH0 = r.ue() + 1
    val frameMbsOnly = r.u(1)
    require(frameMbsOnly == 1, "interlaced streams outside the I_PCM subset")
    r.u(1)    // direct_8x8_inference_flag
    val (cropR, cropB) =
      if (r.u(1) == 1) {
        val l = r.ue(); val rt = r.ue(); val t = r.ue(); val bm = r.ue()
        require(l == 0 && t == 0, "left/top cropping unsupported in this subset")
        (rt, bm)
      } else (0, 0)
    // allocation bomb guard: plane buffers are sized from these fields
    // BEFORE any sample is read, so a malformed SPS from an untrusted
    // corpus must die here as a parse error, never as a multi-GB alloc
    // (16k × 16k ≫ any level-defined H.264 frame)
    require(mbW >= 1 && mbH0 >= 1 && mbW <= 1024 && mbH0 <= 1024 &&
      mbW.toLong * mbH0 <= (1 << 18),
      s"implausible SPS dimensions ${mbW}x$mbH0 MBs")
    require(2 * cropR < mbW * 16 && 2 * cropB < mbH0 * 16,
      s"cropping ($cropR,$cropB) consumes the whole ${mbW * 16}x${mbH0 * 16} frame")
    Sps(mbW, mbH0, cropR, cropB, log2MaxFrameNum)
  }

  // ---- PPS ---------------------------------------------------------------

  def encodePpsNal(): Array[Byte] = {
    val w = new BitWriter
    w.ue(0)   // pic_parameter_set_id
    w.ue(0)   // seq_parameter_set_id
    w.u(0, 1) // entropy_coding_mode_flag: CAVLC
    w.u(0, 1) // bottom_field_pic_order_in_frame_present_flag
    w.ue(0)   // num_slice_groups_minus1
    w.ue(0)   // num_ref_idx_l0_default_active_minus1
    w.ue(0)   // num_ref_idx_l1_default_active_minus1
    w.u(0, 1) // weighted_pred_flag
    w.u(0, 2) // weighted_bipred_idc
    w.se(0)   // pic_init_qp_minus26
    w.se(0)   // pic_init_qs_minus26
    w.se(0)   // chroma_qp_index_offset
    w.u(0, 1) // deblocking_filter_control_present_flag
    w.u(0, 1) // constrained_intra_pred_flag
    w.u(0, 1) // redundant_pic_cnt_present_flag
    w.trailing()
    nal(NalPps, refIdc = 3, w.toArray)
  }

  /** The I_PCM subset only needs to know the PPS is CAVLC + single
    * slice group with no deblocking-override syntax in slice headers. */
  /** Validated PPS fields the intra subset consumes downstream. */
  final case class Pps(initQp: Int, chromaQpOffset: Int)

  private def validatePps(nalUnit: Array[Byte]): Pps = {
    require(nalType(nalUnit) == NalPps, s"not a PPS NAL: type ${nalType(nalUnit)}")
    val r = new BitReader(ebspToRbsp(nalUnit.drop(1)))
    r.ue(); r.ue()
    require(r.u(1) == 0, "CABAC streams outside the CAVLC intra subset")
    r.u(1)
    require(r.ue() == 0, "slice groups outside the CAVLC intra subset")
    r.ue(); r.ue()            // num_ref_idx_l{0,1}_default_active_minus1
    r.u(1); r.u(2)            // weighted_pred_flag, weighted_bipred_idc
    val initQp = 26 + r.se()  // pic_init_qp_minus26
    r.se()                    // pic_init_qs_minus26
    val cqo = r.se()          // chroma_qp_index_offset
    require(cqo == 0, "chroma_qp_index_offset != 0 outside the subset")
    Pps(initQp, cqo)
  }

  // ---- IDR slice: encode --------------------------------------------------

  /** One IDR picture whose every macroblock is I_PCM. Frames whose dims
    * are not multiples of 16 are padded to the MB grid by edge
    * replication; the SPS crop removes the padding on decode. */
  def encodeIdrIPcmNal(frame: Frame): Array[Byte] = {
    val mbW = (frame.width + 15) / 16
    val mbH = (frame.height + 15) / 16
    val w = new BitWriter
    // slice_header
    w.ue(0)      // first_mb_in_slice
    w.ue(7)      // slice_type: I (all slices of the picture are I)
    w.ue(0)      // pic_parameter_set_id
    w.u(0, 4)    // frame_num (log2MaxFrameNum = 4; 0 for an IDR)
    w.ue(0)      // idr_pic_id
    // pic_order_cnt_type 2 → no POC syntax
    w.u(0, 1)    // no_output_of_prior_pics_flag   (dec_ref_pic_marking,
    w.u(0, 1)    // long_term_reference_flag        IDR variant)
    w.se(0)      // slice_qp_delta
    // slice_data: no mb_skip syntax in I slices
    var my = 0
    while (my < mbH) {
      var mx = 0
      while (mx < mbW) {
        w.ue(25) // mb_type: I_PCM (Table 7-11)
        w.alignZero()
        writePcmMb(w, frame, mx, my)
        mx += 1
      }
      my += 1
    }
    w.trailing()
    nal(NalIdr, refIdc = 3, w.toArray)
  }

  /** 256 luma then 64 Cb then 64 Cr samples, raster within the MB;
    * out-of-frame positions replicate the nearest edge sample. */
  private def writePcmMb(w: BitWriter, f: Frame, mx: Int, my: Int): Unit = {
    var y = 0
    while (y < 16) {
      val sy = math.min(my * 16 + y, f.height - 1)
      var x = 0
      while (x < 16) {
        val sx = math.min(mx * 16 + x, f.width - 1)
        w.rawByte(f.y(sy * f.width + sx))
        x += 1
      }
      y += 1
    }
    val cw = f.width / 2; val ch = f.height / 2
    var c = 0
    while (c < 2) {
      val plane = if (c == 0) f.cb else f.cr
      var yy = 0
      while (yy < 8) {
        val sy = math.min(my * 8 + yy, ch - 1)
        var xx = 0
        while (xx < 8) {
          val sx = math.min(mx * 8 + xx, cw - 1)
          w.rawByte(plane(sy * cw + sx))
          xx += 1
        }
        yy += 1
      }
      c += 1
    }
  }

  /** One IDR picture of CAVLC intra macroblocks (the fixture/synthetic
    * serializer): per-MB choices in raster order, chosen residual
    * coefficients and prediction modes — bits depend only on the
    * choices and CAVLC neighbor bookkeeping, never on pixels, so this
    * is a pure serializer; expected pixels come from [[decodeIdr]] (and
    * independently from the Python fixture generator). */
  def encodeIdrCavlcNal(mbW: Int, mbH: Int, initQp: Int, sliceQpDelta: Int,
                        choices: Seq[H264Intra.MbChoice]): Array[Byte] = {
    require(choices.size == mbW * mbH,
      s"${choices.size} choices for ${mbW}x$mbH MBs")
    val w = new BitWriter
    w.ue(0)      // first_mb_in_slice
    w.ue(7)      // slice_type: I
    w.ue(0)      // pic_parameter_set_id
    w.u(0, 4)    // frame_num (log2MaxFrameNum = 4 in encodeSpsNal)
    w.ue(0)      // idr_pic_id
    w.u(0, 1); w.u(0, 1) // dec_ref_pic_marking (IDR)
    w.se(sliceQpDelta)
    val ctx = new H264Intra.EncCtx(mbW, mbH,
      ((initQp + sliceQpDelta) % 52 + 52) % 52)
    var my = 0
    while (my < mbH) {
      var mx = 0
      while (mx < mbW) {
        H264Intra.encodeIntraMb(w, ctx, mx, my, choices(my * mbW + mx))
        mx += 1
      }
      my += 1
    }
    w.trailing()
    nal(NalIdr, refIdc = 3, w.toArray)
  }

  // ---- IDR slice: decode --------------------------------------------------

  /** Decode one IDR NAL against its SPS. I_PCM macroblocks read raw;
    * Intra_4x4 / Intra_16x16 macroblocks decode through the CAVLC
    * residual + intra-prediction path ([[H264Intra]]/[[H264Cavlc]]).
    * `initQp` is the PPS `pic_init_qp` (26 when no PPS preceded). */
  def decodeIdr(nalUnit: Array[Byte], sps: Sps, initQp: Int = 26): Frame = {
    val full = decodeIdrFull(nalUnit, sps, initQp)
    crop(full, sps.width, sps.height)
  }

  /** [[decodeIdr]] without the display crop — P slices motion-compensate
    * against the full macroblock grid, so the reference list keeps the
    * uncropped picture. */
  private[multimodal] def decodeIdrFull(nalUnit: Array[Byte], sps: Sps,
                                        initQp: Int = 26): Frame = {
    require(nalType(nalUnit) == NalIdr, s"not an IDR NAL: type ${nalType(nalUnit)}")
    val r = new BitReader(ebspToRbsp(nalUnit.drop(1)))
    require(r.ue() == 0, "multi-slice pictures outside the intra subset")
    val sliceType = r.ue()
    require(sliceType == 2 || sliceType == 7,
      s"slice_type $sliceType is not I")
    r.ue()                    // pic_parameter_set_id
    r.u(sps.log2MaxFrameNum)  // frame_num
    r.ue()                    // idr_pic_id
    r.u(1); r.u(1)            // dec_ref_pic_marking (IDR)
    val sliceQpDelta = r.se()
    val ctx = new H264Intra.SliceCtx(sps.mbWidth, sps.mbHeight,
      ((initQp + sliceQpDelta) % 52 + 52) % 52)
    val fullW = ctx.width
    var my = 0
    while (my < sps.mbHeight) {
      var mx = 0
      while (mx < sps.mbWidth) {
        val mbType = r.ue()
        if (mbType == 25) {
          r.alignZero()
          var py = 0
          while (py < 16) {
            var px = 0
            while (px < 16) {
              ctx.y((my * 16 + py) * fullW + mx * 16 + px) = r.rawByte()
              px += 1
            }
            py += 1
          }
          var c = 0
          while (c < 2) {
            val plane = if (c == 0) ctx.cb else ctx.cr
            var py2 = 0
            while (py2 < 8) {
              var px2 = 0
              while (px2 < 8) {
                plane((my * 8 + py2) * (fullW / 2) + mx * 8 + px2) = r.rawByte()
                px2 += 1
              }
              py2 += 1
            }
            c += 1
          }
          ctx.markPcm(mx, my)
        } else if (mbType <= 24) {
          H264Intra.decodeIntraMb(r, ctx, mx, my, mbType)
        } else throw new IllegalArgumentException(
          s"mb_type $mbType at ($mx,$my) is not an I-slice macroblock")
        mx += 1
      }
      my += 1
    }
    r.expectTrailing()
    Frame(fullW, ctx.height, ctx.y, ctx.cb, ctx.cr)
  }

  /** One decoded reference picture with the motion field a later B
    * slice's colocated derivation reads (None for intra/IDR pictures). */
  private[multimodal] final case class RefPic(frame: Frame,
                                              motion: Option[H264Inter.Motion])

  /** Decode a non-IDR coded slice — a P slice ([[H264Inter]]) against
    * `ref0`, or a B slice ([[H264BInter]]) against (`ref0`, `ref1`) —
    * all pictures UNCROPPED. Returns the picture plus its motion field
    * when it is a stored reference (P), None for non-reference B. */
  private[multimodal] def decodeNonIdrFull(nalUnit: Array[Byte], sps: Sps,
      ref0: Option[RefPic], ref1: Option[RefPic],
      initQp: Int): (Frame, Option[H264Inter.Motion]) = {
    require(nalType(nalUnit) == NalNonIdr,
      s"not a non-IDR slice NAL: type ${nalType(nalUnit)}")
    val refIdc = (nalUnit(0) >> 5) & 3
    val r = new BitReader(ebspToRbsp(nalUnit.drop(1)))
    require(r.ue() == 0, "multi-slice pictures outside the subset")
    r.ue() match {
      case 0 | 5 => // P
        // Non-reference P (nal_ref_idc == 0) is conformant H.264 but
        // outside this subset: the decoder keeps every decoded P as a
        // reference, so accepting one would silently motion-compensate
        // later slices against a picture the encoder marked
        // never-a-reference. Reject loudly, never approximate.
        require(refIdc != 0,
          "non-reference P slice (nal_ref_idc = 0) outside the subset")
        val ref = ref0.getOrElse(
          sys.error("P slice with no prior reference picture")).frame
        val (f, mot) = H264Inter.decodePSlice(r, sps, ref, initQp, refIdc)
        (f, Some(mot))
      case 1 | 6 => // B
        // the dual constraint: a REFERENCE B would need adaptive
        // ref-pic marking to manage a 3-deep DPB — outside the subset
        require(refIdc == 0,
          "reference B slice (nal_ref_idc != 0) outside the subset")
        val r0 = ref0.getOrElse(
          sys.error("B slice with no prior reference picture"))
        val r1 = ref1.getOrElse(
          sys.error("B slice with only one prior reference picture"))
        (H264BInter.decodeBSlice(r, sps, r0.frame, r1.frame, r1.motion,
          initQp), None)
      case t => throw new IllegalArgumentException(
        s"non-IDR slice_type $t outside the P+B subset")
    }
  }

  private def crop(f: Frame, w: Int, h: Int): Frame =
    if (w == f.width && h == f.height) f
    else {
      val y = new Array[Byte](w * h)
      var r0 = 0
      while (r0 < h) {
        System.arraycopy(f.y, r0 * f.width, y, r0 * w, w); r0 += 1
      }
      val cw = w / 2; val ch = h / 2
      val cb = new Array[Byte](cw * ch)
      val cr = new Array[Byte](cw * ch)
      var r1 = 0
      while (r1 < ch) {
        System.arraycopy(f.cb, r1 * (f.width / 2), cb, r1 * cw, cw)
        System.arraycopy(f.cr, r1 * (f.width / 2), cr, r1 * cw, cw)
        r1 += 1
      }
      Frame(w, h, y, cb, cr)
    }

  /** Decode a NAL sequence: SPS/PPS establish context (the PPS is
    * validated against the subset), each coded-slice NAL yields one
    * frame. A two-picture sliding-window DPB carries the references:
    * `ref0` = the most recent stored reference (what a P predicts
    * from, and RefPicList0[0] of a B), `ref1` = the one before it
    * (RefPicList1[0] of a B) — the §8.2.4.2.4 default list order for
    * two past references. Every reference is kept WITH its motion
    * field so B spatial direct can read the colocated picture. Decode
    * order is display order throughout (the `pic_order_cnt_type = 2`
    * subset — B slices here are generalized-B over two past
    * references, never display-reordered). */
  def decodeNals(nals: Seq[Array[Byte]]): Seq[Frame] = {
    var sps: Option[Sps] = None
    var initQp = 26
    var ref0: Option[RefPic] = None // most recent reference, uncropped
    var ref1: Option[RefPic] = None // second most recent reference
    val frames = Seq.newBuilder[Frame]
    nals.foreach { n =>
      nalType(n) match {
        case NalSps => sps = Some(parseSps(n))
        case NalPps => initQp = validatePps(n).initQp
        case NalIdr =>
          val s = sps.getOrElse(sys.error("IDR before SPS in the NAL stream"))
          val full = decodeIdrFull(n, s, initQp)
          ref0 = Some(RefPic(full, None)) // IDR flushes the DPB
          ref1 = None
          frames += crop(full, s.width, s.height)
        case NalNonIdr =>
          // P slices ([[H264Inter]]) against ref0; B slices
          // ([[H264BInter]]) against (ref0, ref1)
          val s = sps.getOrElse(sys.error("coded slice before SPS in the NAL stream"))
          val (full, motion) = decodeNonIdrFull(n, s, ref0, ref1, initQp)
          if (motion.isDefined) { // stored reference (P): slide the window
            ref1 = ref0
            ref0 = Some(RefPic(full, motion))
          }
          frames += crop(full, s.width, s.height)
        case t if t >= 2 && t <= 4 =>
          // data partitions / non-IDR forms outside the subset: silently
          // skipping would under-decode a real stream into fewer frames
          // presented as complete — reject so callers fall back to the
          // labeled stub instead
          throw new IllegalArgumentException(
            s"coded slice NAL type $t outside the IDR+P+B subset")
        case _ => () // SEI / AUD / filler: legal to skip
      }
    }
    frames.result()
  }

  /** BT.601-shaped conversion of a decoded frame to a BufferedImage for
    * the shared [[FramePool]] pooling (full-range: the synthetic
    * encoder writes full-range samples; with Cb = Cr = 128 this is the
    * exact R = G = B = Y identity the oracles rely on). */
  def toImage(f: Frame): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      f.width, f.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val cw = f.width / 2
    var y = 0
    while (y < f.height) {
      var x = 0
      while (x < f.width) {
        val yy = f.y(y * f.width + x) & 0xff
        val cbv = (f.cb((y / 2) * cw + x / 2) & 0xff) - 128
        val crv = (f.cr((y / 2) * cw + x / 2) & 0xff) - 128
        def clamp(v: Double): Int = math.max(0, math.min(255, math.round(v).toInt))
        val r = clamp(yy + 1.402 * crv)
        val g = clamp(yy - 0.344136 * cbv - 0.714136 * crv)
        val b = clamp(yy + 1.772 * cbv)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }
}
