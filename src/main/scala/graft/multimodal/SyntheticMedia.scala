package graft.multimodal

/** Deterministic synthetic media — the oracle-able face of the
  * binary-column plumbing, from headers all the way down to pixels,
  * samples, and container trees: each id maps to VALID media whose
  * parse/decode/hash results are pure arithmetic on the id, so a DuckDB
  * oracle can state what the real codec paths must recover from bytes
  * it cannot itself read. The whole m-family rides this one trick:
  *
  *  - [[bytes]] (m2): PNG/GIF/BMP/WAV headers, metadata by arithmetic;
  *  - [[bmpPatternBytes]] (m3/m5/m7/m9): real 24-bit BMPs whose pixels
  *    sum id-selected DCT bases — pHash provably equals a bit mask;
  *  - [[wavToneBytes]] (m4): playable WAVs holding bin-aligned tones —
  *    FFT dominant/rolloff exact, centroid to the bin;
  *  - [[videoBytes]] (m6): minimal MP4 (v0+v1 boxes) / AVI containers;
  *  - [[mjpegAviBytes]] (m8): playable MJPEG AVIs, real JPEG frames.
  *
  * Everything is map-only on the query side: media are born, decoded
  * and reduced to scalar rows inside the partition — binary columns
  * never shuffle (plan-guarded in PlanGuardSpec).
  *
  * Headers are minimal but REAL: the same offsets/endianness production
  * files carry (PNG IHDR big-endian dims at 16/20; GIF89a logical
  * screen little-endian at 6/8; BITMAPINFOHEADER little-endian at
  * 18/22; canonical 44-byte WAV fmt/data layout), padded with a few
  * content bytes so length floors hold. */
object SyntheticMedia {

  /** The metadata formulas, shared by bytes() and the m2 oracle:
    * images get w = 1 + id % 1000, h = 1 + id % 97; WAV gets
    * channels = 1 + id % 2, sampleRate = 8000 + (id % 8) · 1000,
    * 16-bit samples, dataSize = 4000 + id % 512. */
  def width(id: Long): Int = (1 + id % 1000).toInt
  def height(id: Long): Int = (1 + id % 97).toInt
  def channels(id: Long): Int = (1 + id % 2).toInt
  def sampleRate(id: Long): Int = (8000 + (id % 8) * 1000).toInt
  def dataSize(id: Long): Int = (4000 + id % 512).toInt

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** A valid header for id (format cycles on id % 4). */
  def bytes(id: Long): Array[Byte] = (id % 4) match {
    case 0 => // PNG: signature + IHDR length/type + BE dims at 16/20
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        be32(13) ++ "IHDR".getBytes("US-ASCII") ++
        be32(width(id)) ++ be32(height(id)) ++
        Array[Byte](8, 2, 0, 0, 0) // bit depth, color type, ...
    case 1 => // GIF89a: LE uint16 logical-screen dims at 6/8
      "GIF89a".getBytes("US-ASCII") ++
        le16(width(id)) ++ le16(height(id)) ++ Array[Byte](0, 0, 0, 0x3b)
    case 2 => // BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, LE dims at 18/22
      "BM".getBytes("US-ASCII") ++ le32(54) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(width(id)) ++ le32(height(id)) ++
        le16(1) ++ le16(24) ++ le32(0)
    case _ => // WAV: canonical 44-byte RIFF/fmt/data layout
      val ch = channels(id); val sr = sampleRate(id); val ds = dataSize(id)
      val byteRate = sr * ch * 2
      "RIFF".getBytes("US-ASCII") ++ le32(36 + ds) ++
        "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++
        le16(1) ++ le16(ch) ++ le32(sr) ++ le32(byteRate) ++
        le16(ch * 2) ++ le16(16) ++
        "data".getBytes("US-ASCII") ++ le32(ds)
  }

  // ==== id-deterministic VIDEO containers (m6) =========================
  //
  // The m2 trick for the video modality: each id builds a VALID minimal
  // container — ISO-BMFF MP4 (ftyp + moov{mvhd, trak{tkhd}}, v0/v1 box
  // layouts alternating so both parser paths stay under the gate) or
  // RIFF AVI (LIST hdrl + avih) — whose duration/dimension fields are
  // pure arithmetic on the id, so DuckDB can state what
  // [[Multimodal.parseMeta]] must recover by walking the boxes/chunks.

  /** MP4 ids use a 600-tick timescale (the QuickTime convention), so
    * durationMs exercises real integer division: d·1000/600. */
  def mp4Duration(id: Long): Long = 1 + id % 100000
  def aviUsPerFrame(id: Long): Long = 10000 + (id % 5) * 10000
  def aviFrames(id: Long): Long = 1 + id % 2400

  private def box(boxType: String, payload: Array[Byte]): Array[Byte] =
    be32(8 + payload.length) ++ boxType.getBytes("US-ASCII") ++ payload

  /** A valid video container for id: MP4 on even ids (mvhd/tkhd version
    * 1 when (id/2) is odd — 64-bit duration fields), AVI on odd ids. */
  def videoBytes(id: Long): Array[Byte] =
    if (id % 2 == 0) {
      val v1 = (id / 2) % 2 == 1
      val mvhd =
        if (v1)
          Array[Byte](1, 0, 0, 0) ++ // version 1, flags
            new Array[Byte](16) ++ // created/modified (8+8)
            be32(600) ++ // timescale
            be32(0) ++ be32(mp4Duration(id).toInt) ++ // 64-bit duration
            new Array[Byte](80)
        else
          Array[Byte](0, 0, 0, 0) ++
            new Array[Byte](8) ++ // created/modified (4+4)
            be32(600) ++ be32(mp4Duration(id).toInt) ++
            new Array[Byte](80)
      val tkhd =
        if (v1)
          Array[Byte](1, 0, 0, 0) ++ new Array[Byte](84) ++
            be32(width(id) << 16) ++ be32(height(id) << 16)
        else
          Array[Byte](0, 0, 0, 0) ++ new Array[Byte](72) ++
            be32(width(id) << 16) ++ be32(height(id) << 16)
      box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
        box("moov", box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd)))
    } else {
      val avih = le32(aviUsPerFrame(id).toInt) ++ new Array[Byte](12) ++
        le32(aviFrames(id).toInt) ++ new Array[Byte](12) ++
        le32(width(id)) ++ le32(height(id)) ++ new Array[Byte](16)
      val hdrl = "hdrl".getBytes("US-ASCII") ++
        "avih".getBytes("US-ASCII") ++ le32(avih.length) ++ avih
      val body = "AVI ".getBytes("US-ASCII") ++
        "LIST".getBytes("US-ASCII") ++ le32(hdrl.length) ++ hdrl
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }

  // ==== id-deterministic MJPEG-AVI clips (m8) ===========================
  //
  // Frame-level video under the gate: each id builds a playable MJPEG
  // AVI whose frame COUNT and frame DIMENSIONS are arithmetic on the id.
  // Frames are genuine JDK-encoded JPEGs, so the query path exercises
  // the full RIFF movi walk ([[Multimodal.aviVideoChunks]]) plus a REAL
  // per-frame JPEG decode; dimensions survive the lossy codec exactly,
  // pixel values deliberately don't ride the oracle.

  def mjpegFrameCount(id: Long): Int = (1 + id % 8).toInt
  def mjpegFrameW(id: Long): Int = (8 + id % 16).toInt
  def mjpegFrameH(id: Long): Int = (8 + id % 12).toInt

  private def riffChunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
    val pad: Array[Byte] =
      if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
    fourcc.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
  }

  private def jpegFrame(w: Int, h: Int, shade: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (shade << 16) | (shade << 8) | shade
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** A playable MJPEG AVI for id: avih header + movi list of `00dc`
    * JPEG frames (count/dims per the formulas above, 25 fps). */
  def mjpegAviBytes(id: Long): Array[Byte] = {
    val w = mjpegFrameW(id)
    val h = mjpegFrameH(id)
    val n = mjpegFrameCount(id)
    val avih = new Array[Byte](56)
    System.arraycopy(le32(40000), 0, avih, 0, 4) // 25 fps
    System.arraycopy(le32(n), 0, avih, 16, 4)
    System.arraycopy(le32(w), 0, avih, 32, 4)
    System.arraycopy(le32(h), 0, avih, 36, 4)
    val frames = Array.tabulate(n)(i =>
      riffChunk("00dc", jpegFrame(w, h, ((id + i) % 200 + 28).toInt)))
    val hdrl = riffChunk("LIST",
      "hdrl".getBytes("US-ASCII") ++ riffChunk("avih", avih))
    val movi = riffChunk("LIST",
      "movi".getBytes("US-ASCII") ++ frames.flatten)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  // ==== id-deterministic MJPEG-in-MP4 clips (m10) =======================
  //
  // The m8 story for the ISO-BMFF container: real JPEG samples in mdat,
  // a REAL stsc/stsz/stco sample table in moov/trak/mdia/minf/stbl.
  // Samples pack TWO per chunk, so odd counts produce a two-run stsc —
  // the chunk-run arithmetic is genuinely exercised, not degenerate.

  def mjpegMp4FrameCount(id: Long): Int = (1 + id % 6).toInt
  def mjpegMp4FrameW(id: Long): Int = (8 + id % 14).toInt
  def mjpegMp4FrameH(id: Long): Int = (8 + id % 10).toInt

  /** A playable MJPEG-in-MP4 for id: ftyp + mdat (JPEG samples) + moov
    * whose sample table states where they live. mdat precedes moov so
    * every stco offset is known when the table is written (the
    * progressive-download layout inverts this; same walker either way). */
  def mjpegMp4Bytes(id: Long): Array[Byte] = {
    val w = mjpegMp4FrameW(id)
    val h = mjpegMp4FrameH(id)
    val n = mjpegMp4FrameCount(id)
    val frames = Array.tabulate(n)(i =>
      jpegFrame(w, h, ((id * 7 + i) % 200 + 28).toInt))
    val stsdEntry = be32(16) ++ "jpeg".getBytes("US-ASCII") ++ new Array[Byte](8)
    mp4Container(stsdEntry, frames, samplesPerChunk = 2, w = w, h = h)
  }

  /** Shared ISO-BMFF assembly for the synthetic video generators: ftyp +
    * mdat (samples) + moov with the full stsd/stsc/stsz/stco table and
    * tkhd/mvhd headers (25 fps at timescale 600). Only the stsd sample
    * entry and the chunking differ between codecs. */
  private def mp4Container(stsdEntry: Array[Byte], samples: Array[Array[Byte]],
                           samplesPerChunk: Int, w: Int, h: Int): Array[Byte] = {
    val n = samples.length
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    val mdat = box("mdat", samples.flatten)
    val firstSample = ftyp.length + 8L // mdat payload start
    val chunkSizes = samples.map(_.length.toLong)
      .grouped(samplesPerChunk).map(_.sum).toArray
    val chunkOffsets = chunkSizes.scanLeft(firstSample)(_ + _).init
    val stsd = Array[Byte](0, 0, 0, 0) ++ be32(1) ++ stsdEntry
    val stsz = Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(n) ++
      samples.flatMap(s => be32(s.length))
    val full = n / samplesPerChunk
    val rem = n % samplesPerChunk
    val stscEntries =
      if (rem == 0) Seq((1, samplesPerChunk))
      else if (full == 0) Seq((1, rem))
      else Seq((1, samplesPerChunk), (full + 1, rem))
    val stsc = Array[Byte](0, 0, 0, 0) ++ be32(stscEntries.length) ++
      stscEntries.toArray.flatMap { case (fc, spc) =>
        be32(fc) ++ be32(spc) ++ be32(1)
      }
    val stco = Array[Byte](0, 0, 0, 0) ++ be32(chunkOffsets.length) ++
      chunkOffsets.flatMap(o => be32(o.toInt))
    val stbl = box("stbl", box("stsd", stsd) ++ box("stsc", stsc) ++
      box("stsz", stsz) ++ box("stco", stco))
    val mdia = box("mdia", box("minf", stbl))
    val tkhd = Array[Byte](0, 0, 0, 0) ++ new Array[Byte](72) ++
      be32(w << 16) ++ be32(h << 16)
    val mvhd = Array[Byte](0, 0, 0, 0) ++ new Array[Byte](8) ++
      be32(600) ++ be32(n * 24) ++ new Array[Byte](80) // 25 fps at ts 600
    val moov = box("moov",
      box("mvhd", mvhd) ++ box("trak", box("tkhd", tkhd) ++ mdia))
    ftyp ++ mdat ++ moov
  }

  // ==== real H.264 (I_PCM baseline) in MP4 =============================

  def h264FrameCount(id: Long): Int = (1 + id % 5).toInt
  /** Even dims, deliberately often NOT multiples of 16 so the SPS
    * frame-cropping path is exercised (id % 9 == 0 → exactly 1 MB). */
  def h264FrameW(id: Long): Int = (16 + 2 * (id % 9)).toInt
  def h264FrameH(id: Long): Int = (16 + 2 * (id % 7)).toInt
  /** Constant luma of frame i — with Cb = Cr = 128 the decoded RGB is
    * exactly (Y, Y, Y), so frame mean luma IS this value (oracle-exact). */
  def h264FrameLuma(id: Long, i: Int): Int = ((id * 5 + i * 17) % 200 + 28).toInt

  private def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)

  /** A playable H.264-in-MP4 for id: `avc1` sample entry carrying the
    * avcC decoder configuration (SPS/PPS, 4-byte NAL lengths), one IDR
    * I_PCM access unit per sample, one sample per chunk. The same
    * walker/table layout as [[mjpegMp4Bytes]]; only the codec differs. */
  def h264Mp4Bytes(id: Long): Array[Byte] = {
    val w = h264FrameW(id)
    val h = h264FrameH(id)
    val n = h264FrameCount(id)
    val sps = H264.encodeSpsNal(w, h)
    val pps = H264.encodePpsNal()
    val samples = Array.tabulate(n) { i =>
      val f = H264.Frame(w, h,
        Array.fill(w * h)(h264FrameLuma(id, i).toByte),
        Array.fill(w * h / 4)(128.toByte), Array.fill(w * h / 4)(128.toByte))
      val idr = H264.encodeIdrIPcmNal(f)
      be32(idr.length) ++ idr
    }
    val avcC = box("avcC",
      Array[Byte](1, 66, 0, 10, (0xfc | 3).toByte, (0xe0 | 1).toByte) ++
        be16(sps.length) ++ sps ++ Array[Byte](1) ++ be16(pps.length) ++ pps)
    // VisualSampleEntry: 6 reserved + data_ref_idx(2), then 70 bytes of
    // pre_defined/reserved/dims/resolution/frame_count/name/depth fields
    val visual = new Array[Byte](70)
    System.arraycopy(be16(w), 0, visual, 16, 2)
    System.arraycopy(be16(h), 0, visual, 18, 2)
    System.arraycopy(be32(0x00480000), 0, visual, 20, 4) // 72 dpi horiz
    System.arraycopy(be32(0x00480000), 0, visual, 24, 4) // 72 dpi vert
    System.arraycopy(be16(1), 0, visual, 32, 2)          // frame_count
    System.arraycopy(be16(24), 0, visual, 66, 2)         // depth
    val entry = be32(8 + 8 + 70 + avcC.length) ++
      "avc1".getBytes("US-ASCII") ++ new Array[Byte](6) ++ be16(1) ++
      visual ++ avcC
    mp4Container(entry, samples, samplesPerChunk = 1, w = w, h = h)
  }

  // ==== real H.264 (CAVLC intra baseline) in MP4 =======================

  def h264CavlcFrameCount(id: Long): Int = (1 + id % 3).toInt
  def h264CavlcFrameW(id: Long): Int = (16 * (1 + id % 3)).toInt
  def h264CavlcFrameH(id: Long): Int = (16 * (1 + id % 2)).toInt

  /** The id-deterministic luma delta of frame i: the first macroblock
    * carries exactly this value as its Intra_16x16 luma DC level at
    * QP 28, where the §8.5.10 DC chain reduces to pixel += level; DC
    * prediction then propagates the constant plane into every later
    * macroblock (zero residuals), so frame luma = 128 + delta
    * EVERYWHERE — the closed form the m12 oracle states. |delta| ≤ 7
    * keeps the level inside the plain prefix range of the CAVLC level
    * coder. */
  def h264CavlcDelta(id: Long, i: Int): Int = (((id * 7 + i * 13) % 15) - 7).toInt

  // ==== real H.264 IDR+P GOP (inter prediction) in MP4 ==================

  def h264PFrameCount(id: Long): Int = (2 + id % 3).toInt

  /** Per-4×4-block DC residual level of coded P frame t: at QP 28 a DC
    * level c dequantizes to 256·c and the constant inverse transform
    * gives exactly (256·c + 32) >> 6 = 4·c per pixel — so each coded P
    * frame shifts the constant plane by 4·c_t and the m13 oracle states
    * the GOP's final mean in closed form. */
  def h264PDelta(id: Long, t: Int): Int = (((id + t) % 5) - 2).toInt

  /** An IDR + P GOP in an avc1 MP4: frame 0 is the m12 constant-plane
    * CAVLC IDR (luma 128 + d₀); odd frames are all-P_L0_16x16 with
    * id-deterministic QUARTER-PEL motion vectors (interpolating a
    * constant plane returns the constant exactly — the 6-tap sums to
    * 32 and (32C + 16) >> 5 = C — so full fractional MC, border
    * clamping and the eighth-pel chroma bilinear all run without
    * moving the mean) plus the per-block DC residual above; even
    * frames are all-P_Skip. The m13 proof that the INTER path — skip
    * runs, mv prediction, sub-pel motion compensation, inter CBP,
    * residual-over-prediction — runs under the oracle. */
  def h264PMp4Bytes(id: Long): Array[Byte] = {
    val w = h264CavlcFrameW(id)
    val h = h264CavlcFrameH(id)
    val n = h264PFrameCount(id)
    val mbW = w / 16; val mbH = h / 16
    val sps = H264.encodeSpsNal(w, h, numRefFrames = 1)
    val pps = H264.encodePpsNal()
    val zeroChromaDc = Array.fill(2)(new Array[Int](4))
    val zeroChromaAc = Array.fill(2, 4)(new Array[Int](16))
    def dcMb(level: Int) = H264Intra.I16Choice(
      predMode = 2, cbpLumaAc = false, cbpChroma = 0, qpDelta = 0,
      lumaDc = { val a = new Array[Int](16); a(0) = level; a },
      lumaAc = Array.fill(16)(new Array[Int](16)),
      chromaDc = zeroChromaDc, chromaAc = zeroChromaAc)
    val idr = H264.encodeIdrCavlcNal(mbW, mbH, initQp = 26, sliceQpDelta = 2,
      dcMb(h264CavlcDelta(id, 0)) +: Seq.fill(mbW * mbH - 1)(dcMb(0)))
    val nals = idr +: (1 until n).map { t =>
      val choices: Seq[H264Inter.PMbChoice] =
        if (t % 2 == 0) Seq.fill(mbW * mbH)(H264Inter.PSkip)
        else Seq.tabulate(mbW * mbH) { m =>
          val c = h264PDelta(id, t)
          val luma = Array.fill(16) {
            val a = new Array[Int](16); a(0) = c; a
          }
          val mvx = ((id + t + m) % 17).toInt - 8 // quarter-pel, all phases
          val mvy = ((2 * id + t + m) % 17).toInt - 8
          m % 3 match {
            case 0 =>
              H264Inter.P16Choice(mvx, mvy, luma, cbpChroma = 0, qpDelta = 0,
                chromaDc = zeroChromaDc, chromaAc = zeroChromaAc)
            case 1 => // partitioned MBs under the oracle: constant-plane
              // algebra is partition-invariant, so 16x8/8x16 with two
              // different vectors still land exactly on 128 + Σ4c
              H264Inter.P2Choice(vertical = (m + t) % 4 == 1,
                mv0 = (mvx, mvy), mv1 = (-mvy, mvx),
                luma = luma, cbpChroma = 0, qpDelta = 0,
                chromaDc = zeroChromaDc, chromaAc = zeroChromaAc)
            case _ => // and P_8x8 down to 4x4 sub-partitions, same algebra
              H264Inter.P8x8Choice(
                subTypes = Array.tabulate(4)(i => (m + t + i) % 4),
                mvs = (0 until 4).map { p8 =>
                  val n = Array(1, 2, 2, 4)((m + t + p8) % 4)
                  (0 until n).map(s => (mvx + s, mvy - s))
                },
                luma = luma, cbpChroma = 0, qpDelta = 0,
                chromaDc = zeroChromaDc, chromaAc = zeroChromaAc)
          }
        }
      H264Inter.encodePSliceNal(mbW, mbH, frameNum = t % 16, initQp = 26,
        sliceQpDelta = 2, choices)
    }
    val samples = nals.map(nal => be32(nal.length) ++ nal).toArray
    val avcC = box("avcC",
      Array[Byte](1, 66, 0, 10, (0xfc | 3).toByte, (0xe0 | 1).toByte) ++
        be16(sps.length) ++ sps ++ Array[Byte](1) ++ be16(pps.length) ++ pps)
    val visual = new Array[Byte](70)
    System.arraycopy(be16(w), 0, visual, 16, 2)
    System.arraycopy(be16(h), 0, visual, 18, 2)
    System.arraycopy(be32(0x00480000), 0, visual, 20, 4)
    System.arraycopy(be32(0x00480000), 0, visual, 24, 4)
    System.arraycopy(be16(1), 0, visual, 32, 2)
    System.arraycopy(be16(24), 0, visual, 66, 2)
    val entry = be32(8 + 8 + 70 + avcC.length) ++
      "avc1".getBytes("US-ASCII") ++ new Array[Byte](6) ++ be16(1) ++
      visual ++ avcC
    mp4Container(entry, samples, samplesPerChunk = 1, w = w, h = h)
  }

  // ==== real H.264 IDR+P+B GOP (bi-prediction) in MP4 ====================

  def h264BFrameCount(id: Long): Int = (3 + id % 3).toInt

  /** The EVEN per-4×4-block DC level of coded frame t ∈ {1, 2} (P1 /
    * P2): evenness makes every B target constant reachable by integer
    * DC levels from all three predictions (L0 at b, L1 at a, Bi at
    * (a + b + 1) >> 1 = a + 2c — all ≡ a mod 4 exactly when c is
    * even), so a B frame lands UNIFORMLY on the bi-average and the m14
    * oracle states it in closed form. */
  def h264BDelta(id: Long, t: Int): Int = (2 * ((id + t) % 3 - 1)).toInt

  /** An IDR + P + B GOP in an avc1 MP4 (`max_num_ref_frames = 2` SPS):
    * decode order IDR, P1, B1[, P2[, B2]] — the generalized-B shape
    * where a B predicts from the TWO most recent stored references
    * (list0 = the newer, list1 = the older), so decode order stays
    * display order. Constants: IDR = a (the m12 plane), P1 = a + 4c₁,
    * B1 = a + 2c₁ (the exact bi-average), P2 = a + 4c₁ + 4c₂,
    * B2 = a + 4c₁ + 2c₂. Each B frame cycles every in-subset B
    * macroblock kind — B_Bi / B_Direct_16x16 / B_L0 / B_Skip / B_L1 in
    * an order that guarantees every direct/skip MB sees a bi-predicted
    * neighbor (so its derived reference indices cover both lists and
    * its prediction is the bi-average) — with quarter-pel vectors on
    * the coded kinds and per-kind DC residuals placing every MB on the
    * SAME constant. B2's colocated picture is P1, whose small decoded
    * vectors make real colZeroFlag overrides fire (constant-plane
    * invariant, machine-checked by the cross-impl fixtures). */
  def h264BMp4Bytes(id: Long): Array[Byte] = {
    val w = h264CavlcFrameW(id)
    val h = h264CavlcFrameH(id)
    val n = h264BFrameCount(id)
    val mbW = w / 16; val mbH = h / 16
    val nMb = mbW * mbH
    val sps = H264.encodeSpsNal(w, h, numRefFrames = 2)
    val pps = H264.encodePpsNal()
    val zeroChromaDc = Array.fill(2)(new Array[Int](4))
    val zeroChromaAc = Array.fill(2, 4)(new Array[Int](16))
    def dcMb(level: Int) = H264Intra.I16Choice(
      predMode = 2, cbpLumaAc = false, cbpChroma = 0, qpDelta = 0,
      lumaDc = { val a = new Array[Int](16); a(0) = level; a },
      lumaAc = Array.fill(16)(new Array[Int](16)),
      chromaDc = zeroChromaDc, chromaAc = zeroChromaAc)
    def lumaOf(c: Int) = Array.fill(16) {
      val a = new Array[Int](16); a(0) = c; a
    }
    val idr = H264.encodeIdrCavlcNal(mbW, mbH, initQp = 26, sliceQpDelta = 2,
      dcMb(h264CavlcDelta(id, 0)) +: Seq.fill(nMb - 1)(dcMb(0)))
    def pNal(t: Int, frameNum: Int) = {
      val c = h264BDelta(id, t)
      val choices: Seq[H264Inter.PMbChoice] = Seq.tabulate(nMb) { m =>
        val mvx = ((id + t + m) % 17).toInt - 8
        val mvy = ((2 * id + t + m) % 17).toInt - 8
        H264Inter.P16Choice(mvx, mvy, lumaOf(c), cbpChroma = 0, qpDelta = 0,
          chromaDc = zeroChromaDc, chromaAc = zeroChromaAc)
      }
      H264Inter.encodePSliceNalWithMotion(mbW, mbH, frameNum, initQp = 26,
        sliceQpDelta = 2, choices)
    }
    def bNal(t: Int, frameNum: Int, c: Int,
             colZero: (Int, Int) => Boolean) = {
      // every MB lands on the bi-average: Bi/Direct/Skip carry level 0,
      // L0 carries −c/2 (prediction is the newer ref), L1 carries +c/2
      val choices: Seq[H264BInter.BMbChoice] = Seq.tabulate(nMb) { m =>
        val mvx = ((id + t + 2 * m) % 17).toInt - 8
        val mvy = ((2 * id + t + 3 * m) % 17).toInt - 8
        m % 6 match {
          case 0 | 3 => H264BInter.B16Choice(mode = 2, (mvx, mvy),
            (-mvy, mvx), lumaOf(0), cbpChroma = 0, qpDelta = 0,
            chromaDc = zeroChromaDc, chromaAc = zeroChromaAc)
          case 1 => H264BInter.BDirectChoice(lumaOf(0), cbpChroma = 0,
            qpDelta = 0, chromaDc = zeroChromaDc, chromaAc = zeroChromaAc)
          case 2 => H264BInter.B16Choice(mode = 0, (mvx, mvy), (0, 0),
            lumaOf(-c / 2), cbpChroma = 0, qpDelta = 0,
            chromaDc = zeroChromaDc, chromaAc = zeroChromaAc)
          case 4 => H264BInter.BSkip
          case _ => H264BInter.B16Choice(mode = 1, (0, 0), (mvx, mvy),
            lumaOf(c / 2), cbpChroma = 0, qpDelta = 0,
            chromaDc = zeroChromaDc, chromaAc = zeroChromaAc)
        }
      }
      H264BInter.encodeBSliceNal(mbW, mbH, frameNum, initQp = 26,
        sliceQpDelta = 2, choices, colZero)
    }
    val neverCol: (Int, Int) => Boolean = (_, _) => false
    val (p1, p1Mot) = pNal(1, frameNum = 1)
    val b1 = bNal(1, frameNum = 2, h264BDelta(id, 1), neverCol)
    val nals: Seq[Array[Byte]] =
      if (n == 3) Seq(idr, p1, b1)
      else {
        val (p2, _) = pNal(2, frameNum = 2)
        if (n == 4) Seq(idr, p1, b1, p2)
        else Seq(idr, p1, b1, p2,
          bNal(2, frameNum = 3, h264BDelta(id, 2),
            H264BInter.colZeroOf(Some(p1Mot))))
      }
    val samples = nals.map(nal => be32(nal.length) ++ nal).toArray
    val avcC = box("avcC",
      Array[Byte](1, 66, 0, 10, (0xfc | 3).toByte, (0xe0 | 1).toByte) ++
        be16(sps.length) ++ sps ++ Array[Byte](1) ++ be16(pps.length) ++ pps)
    val visual = new Array[Byte](70)
    System.arraycopy(be16(w), 0, visual, 16, 2)
    System.arraycopy(be16(h), 0, visual, 18, 2)
    System.arraycopy(be32(0x00480000), 0, visual, 20, 4)
    System.arraycopy(be32(0x00480000), 0, visual, 24, 4)
    System.arraycopy(be16(1), 0, visual, 32, 2)
    System.arraycopy(be16(24), 0, visual, 66, 2)
    val entry = be32(8 + 8 + 70 + avcC.length) ++
      "avc1".getBytes("US-ASCII") ++ new Array[Byte](6) ++ be16(1) ++
      visual ++ avcC
    mp4Container(entry, samples, samplesPerChunk = 1, w = w, h = h)
  }

  /** A playable CAVLC H.264-in-MP4 for id: same container layout as
    * [[h264Mp4Bytes]], but the access units are entropy-coded
    * Intra_16x16 macroblocks (coeff_token / level / total_zeros CAVLC
    * bits), not raw I_PCM samples — the m12 proof that the decoder's
    * residual path, not just its raw path, runs under the oracle. */
  def h264CavlcMp4Bytes(id: Long): Array[Byte] = {
    val w = h264CavlcFrameW(id)
    val h = h264CavlcFrameH(id)
    val n = h264CavlcFrameCount(id)
    val mbW = w / 16; val mbH = h / 16
    val sps = H264.encodeSpsNal(w, h)
    val pps = H264.encodePpsNal()
    val zeroChromaDc = Array.fill(2)(new Array[Int](4))
    val zeroChromaAc = Array.fill(2, 4)(new Array[Int](16))
    def dcMb(level: Int) = H264Intra.I16Choice(
      predMode = 2, cbpLumaAc = false, cbpChroma = 0, qpDelta = 0,
      lumaDc = { val a = new Array[Int](16); a(0) = level; a },
      lumaAc = Array.fill(16)(new Array[Int](16)),
      chromaDc = zeroChromaDc, chromaAc = zeroChromaAc)
    val samples = Array.tabulate(n) { i =>
      val choices = dcMb(h264CavlcDelta(id, i)) +:
        Seq.fill(mbW * mbH - 1)(dcMb(0))
      val idr = H264.encodeIdrCavlcNal(mbW, mbH, initQp = 26,
        sliceQpDelta = 2, choices)
      be32(idr.length) ++ idr
    }
    val avcC = box("avcC",
      Array[Byte](1, 66, 0, 10, (0xfc | 3).toByte, (0xe0 | 1).toByte) ++
        be16(sps.length) ++ sps ++ Array[Byte](1) ++ be16(pps.length) ++ pps)
    val visual = new Array[Byte](70)
    System.arraycopy(be16(w), 0, visual, 16, 2)
    System.arraycopy(be16(h), 0, visual, 18, 2)
    System.arraycopy(be32(0x00480000), 0, visual, 20, 4)
    System.arraycopy(be32(0x00480000), 0, visual, 24, 4)
    System.arraycopy(be16(1), 0, visual, 32, 2)
    System.arraycopy(be16(24), 0, visual, 66, 2)
    val entry = be32(8 + 8 + 70 + avcC.length) ++
      "avc1".getBytes("US-ASCII") ++ new Array[Byte](6) ++ be16(1) ++
      visual ++ avcC
    mp4Container(entry, samples, samplesPerChunk = 1, w = w, h = h)
  }

  // ==== id-deterministic PIXEL content (m3/m5): DCT-basis patterns =====
  //
  // The m2 trick, pushed from headers to pixels. Each id selects exactly
  // 31 of the 63 AC positions of the pHash 8×8 low-frequency block — an
  // arithmetic progression (offset + i·step) mod 63 with step coprime to
  // 63, so the mask is pure arithmetic on the id and a DuckDB oracle can
  // state it. The image is 128 + Σ A·cos-basis over the selected
  // positions, which makes [[PerceptualHash.phash64]] PROVABLY equal to
  // the mask as a 63-bit word:
  //
  //  - a selected position's 2-D DCT coefficient is A·N_u·N_v ≥ 256·A
  //    (N_0 = 32, N_{u≥1} = 16 — basis orthogonality, exact);
  //  - an unselected position sees only pixel-rounding noise, bounded by
  //    0.5·Σ|cos_u|·Σ|cos_v| ≤ 0.5·32·32 = 512 absolute worst case and
  //    ≲ 330 in practice (Σ|cos_u| ≈ 32·2/π for u ≥ 1) — with A = 4 the
  //    selected floor is 1024 − 330, strictly above every unselected
  //    coefficient;
  //  - the median of the 63 AC values (element 31 ascending) is then the
  //    LARGEST unselected value, and `> median` sets exactly the 31
  //    selected bits. A positive brightness rescale (A, base) moves every
  //    pixel but no bit — the perceptual-invariance property m5 gates on.
  //
  // 63 = 7·9, so steps {1,2,4,5,8} are coprime and (offset, step) is
  // injective on id mod 315 (CRT on 63·5) — masks are unique within any
  // id window of 315, which is what the m5 near-dup oracle restricts to.

  private val MaskSteps = Array(1, 2, 4, 5, 8)

  /** The 31 selected AC positions for pattern id g. */
  def maskPositions(g: Long): Array[Int] = {
    val o = (g % 63).toInt
    val s = MaskSteps((g % 5).toInt)
    Array.tabulate(31)(i => (o + i * s) % 63)
  }

  /** The pHash this pattern must produce: bit p set for each selected
    * position p (bit 63 never set — 63 informative bits). */
  def maskHash(g: Long): Long =
    maskPositions(g).foldLeft(0L)((h, p) => h | (1L << p))

  // cos((2x+1)·u·π/64) — the exact basis phash64's 32-point DCT-II uses
  private val CosB = Array.tabulate(8, 32)((u, x) =>
    StrictMath.cos((2 * x + 1) * u * math.Pi / 64.0))

  /** 32×32 grayscale pattern for id g: base + amp·Σ selected bases,
    * rounded to ints (range stays in [0,255] for amp ≤ 4, base 128 and
    * amp ≤ 3, base 140 — no clamp ever fires). */
  private[multimodal] def patternPixels(g: Long, amp: Int, base: Int): Array[Array[Int]] = {
    val acc = Array.ofDim[Double](32, 32)
    maskPositions(g).foreach { p =>
      val q = p + 1 // AC scan order: position p ↔ (v, u) = (q/8, q%8)
      val cu = CosB(q & 7)
      val cv = CosB(q >> 3)
      var y = 0
      while (y < 32) {
        val w = cv(y)
        var x = 0
        while (x < 32) { acc(y)(x) += w * cu(x); x += 1 }
        y += 1
      }
    }
    Array.tabulate(32, 32) { (y, x) =>
      val v = math.round(base + amp * acc(y)(x)).toInt
      math.max(0, math.min(255, v))
    }
  }

  /** A REAL 24-bit BMP (bottom-up rows, the production default) of the
    * pattern — decoded by `javax.imageio` on the query path, so the
    * oracle exercises genuine encode → decode → hash, not a shortcut. */
  def bmpPatternBytes(g: Long, amp: Int = 4, base: Int = 128): Array[Byte] = {
    val px = patternPixels(g, amp, base)
    val rowBytes = 32 * 3 // already a multiple of 4: no padding
    val out = new Array[Byte](54 + 32 * rowBytes)
    def put(off: Int, bs: Array[Byte]): Unit = System.arraycopy(bs, 0, out, off, bs.length)
    put(0, "BM".getBytes("US-ASCII"))
    put(2, le32(out.length)); put(10, le32(54))
    put(14, le32(40)); put(18, le32(32)); put(22, le32(32))
    put(26, le16(1)); put(28, le16(24)); put(34, le32(32 * rowBytes))
    var r = 0
    while (r < 32) {
      val y = 31 - r // bottom-up storage
      var x = 0
      while (x < 32) {
        val v = px(y)(x).toByte
        val o = 54 + r * rowBytes + x * 3
        out(o) = v; out(o + 1) = v; out(o + 2) = v // B = G = R: grayscale
        x += 1
      }
      r += 1
    }
    out
  }

  // ==== id-deterministic SAMPLE content (m4): bin-aligned tones ========
  //
  // Each id synthesizes a mono 16-bit WAV holding a pure sine at FFT bin
  // k = 8 + id % 48 of [[AudioSpectral]]'s 1024-point transform, sampled
  // at rate 8000 + (id % 8)·1000. 3072 samples = 1024 + 4·512, so every
  // Hann frame is FULLY filled (no zero-padded tail) and the leakage of
  // a bin-aligned tone is confined to k ± 1 (power ratio ¼ : 1 : ¼) up
  // to the symmetric-window ε. The features are then arithmetic on id:
  //  - dominant bin = k exactly → dominantHz = k·rate/1024, EXACT in
  //    doubles (rate divisible by 8 makes rate/1024 an exact binary);
  //  - 85% rolloff stops at bin k+1 (cumulative crosses at 5/6 < 0.85
  //    before it, 1.0 after) → (k+1)·rate/1024, exact;
  //  - centroid = k bins up to ~1e-3 → round(centroid/hzPerBin) = k;
  //  - flatness ≈ 0 (pure tone) → is_tonal.
  // k ≥ 8 keeps the k−1 leakage bin clear of the skipped DC bin; k ≤ 55
  // stays far under Nyquist (bin 512) at every rate.

  val ToneSamples = 3072
  val ToneAmp = 14000 // < 32767: no clipping

  def toneRate(id: Long): Int = (8000 + (id % 8) * 1000).toInt
  def toneBin(id: Long): Int = (8 + id % 48).toInt

  // sin(2π·j/1024): sample i of bin-k tone is table[(k·i) mod 1024]
  private val SinT = Array.tabulate(1024)(j =>
    StrictMath.sin(2.0 * math.Pi * j / 1024.0))

  /** Full playable WAV (44-byte canonical header + PCM data) of the
    * bin-aligned tone for id. */
  def wavToneBytes(id: Long): Array[Byte] = {
    val k = toneBin(id)
    val sr = toneRate(id)
    val ds = ToneSamples * 2
    val out = new Array[Byte](44 + ds)
    def put(off: Int, bs: Array[Byte]): Unit = System.arraycopy(bs, 0, out, off, bs.length)
    put(0, "RIFF".getBytes("US-ASCII")); put(4, le32(36 + ds))
    put(8, "WAVE".getBytes("US-ASCII"))
    put(12, "fmt ".getBytes("US-ASCII")); put(16, le32(16))
    put(20, le16(1)); put(22, le16(1)); put(24, le32(sr))
    put(28, le32(sr * 2)); put(32, le16(2)); put(34, le16(16))
    put(36, "data".getBytes("US-ASCII")); put(40, le32(ds))
    var i = 0
    while (i < ToneSamples) {
      val v = math.round(ToneAmp * SinT(((k.toLong * i) % 1024).toInt)).toInt
      out(44 + 2 * i) = (v & 0xff).toByte
      out(44 + 2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    out
  }
}
