package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoder}

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Representation: media ride as opaque `binary` columns next to typed
  * metadata — the schema a 100 TB multimodal corpus actually uses (content
  * in parquet binary or object-store pointers; metadata queryable without
  * touching bytes).
  *
  * What is REAL here: container sniffing and header parsing (PNG IHDR,
  * JPEG SOF, WAV RIFF, MP4 moov boxes, AVI avih — plain byte arithmetic,
  * no codec libraries), the record/feature schemas, partition-local
  * batched decode plumbing (`mapPartitions` in fixed-size batches — the
  * same batch shape a vectorized/Arrow UDF would see), AND pixel/sample/
  * frame decode for the modalities the JDK itself can read:
  * [[ImageIoFeatureDecoder]] (PNG/JPEG/GIF/BMP via `javax.imageio`),
  * [[WavFeatureDecoder]] (WAV/PCM via `javax.sound.sampled`), and
  * [[MjpegAviFrameDecoder]] (video frame sampling for MJPEG-in-AVI:
  * RIFF walking + per-frame JPEG decode), and [[Mp4FrameDecoder]]
  * (MJPEG-in-MP4: stsc×stsz×stco sample-table walking + per-sample JPEG
  * decode), routed per record by [[JdkFeatureDecoder]].
  *
  * What is STUBBED: ENTROPY-CODED video payloads (CAVLC/CABAC H.264
  * residuals, H.265) — H.264's raw I_PCM baseline subset decodes for
  * real via the from-spec [[H264]] parser (NAL/Exp-Golomb/SPS-PPS/
  * slice walking, lossless). [[StubFeatureDecoder]] produces a
  * deterministic hash-derived vector for the rest; swap in a real
  * [[FeatureDecoder]] (JNI codec, ONNX runtime) without touching any
  * of the plumbing.
  */
object Multimodal {

  /** Sniff the container from magic bytes. */
  def mediaType(bytes: Array[Byte]): String =
    if (bytes == null || bytes.length < 12) "unknown"
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
      "image/png"
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "image/jpeg"
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
      "audio/wav"
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' ')
      "video/avi"
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      "image/gif"
    else if (bytes(0) == 'B' && bytes(1) == 'M') "image/bmp"
    else if (bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p')
      "video/mp4"
    else "unknown"

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def beLong(b: Array[Byte], off: Int): Long =
    ((beInt(b, off) & 0xffffffffL) << 32) | (beInt(b, off + 4) & 0xffffffffL)

  /** First child box of ISO-BMFF `boxType` in byte range [start, end):
    * returns the payload range (after the 8- or 16-byte header). Handles
    * 64-bit `largesize` (size == 1) and to-end-of-file (size == 0) boxes;
    * bails on corrupt sizes rather than looping. */
  private def findBox(b: Array[Byte], start: Int, end: Int,
                      boxType: String): Option[(Int, Int)] = {
    var off = start
    while (off + 8 <= end) {
      val size32 = beInt(b, off)
      var hdr = 8
      var size: Long = size32 & 0xffffffffL
      if (size32 == 1) {
        if (off + 16 > end) return None
        size = beLong(b, off + 8)
        hdr = 16
      } else if (size32 == 0) size = (end - off).toLong
      if (size < hdr) return None
      val sameType = b(off + 4) == boxType(0) && b(off + 5) == boxType(1) &&
        b(off + 6) == boxType(2) && b(off + 7) == boxType(3)
      val boxEnd = math.min(end.toLong, off + size).toInt
      if (sameType) return Some((off + hdr, boxEnd))
      off = math.min(end.toLong, off + size).toInt
    }
    None
  }

  /** MP4 metadata from plain byte arithmetic — no codec library:
    * duration from `moov/mvhd` (timescale + duration, v0 and v1 box
    * layouts), dimensions from the first `moov/trak/tkhd` with nonzero
    * width/height (16.16 fixed point; audio tracks carry zeros). */
  private def parseMp4(b: Array[Byte]): MediaMeta =
    findBox(b, 0, b.length, "moov") match {
      case None => MediaMeta("video/mp4", 0, 0, 0L, 0, 0)
      case Some((ms, me)) =>
        val durMs = findBox(b, ms, me, "mvhd").map { case (s, e) =>
          val version = b(s) & 0xff
          if (version == 1 && s + 32 <= e) {
            val timescale = beInt(b, s + 20)
            val duration = beLong(b, s + 24)
            if (timescale > 0) duration * 1000 / timescale else 0L
          } else if (version == 0 && s + 20 <= e) {
            val timescale = beInt(b, s + 12)
            val duration = beInt(b, s + 16) & 0xffffffffL
            if (timescale > 0) duration * 1000 / timescale else 0L
          } else 0L
        }.getOrElse(0L)
        var w, h = 0
        var off = ms
        while (w == 0 && off < me) {
          findBox(b, off, me, "trak") match {
            case None => off = me
            case Some((ts, te)) =>
              findBox(b, ts, te, "tkhd").foreach { case (s, e) =>
                val version = b(s) & 0xff
                val wOff = if (version == 1) s + 88 else s + 76
                if (wOff + 8 <= e) {
                  val tw = beInt(b, wOff) >>> 16
                  val th = beInt(b, wOff + 4) >>> 16
                  if (tw > 0 && th > 0) { w = tw; h = th }
                }
              }
              off = te
          }
        }
        MediaMeta("video/mp4", w, h, durMs, 0, 0)
    }

  // --- RIFF/AVI walking (little-endian fourcc chunks) ---------------------

  /** First RIFF child chunk with the given fourcc in [start, end): returns
    * the payload range. For `LIST` chunks pass the *list type* as
    * `listType` to match `LIST` chunks of that type (payload starts after
    * the 4-byte list type). Chunks are even-aligned (odd sizes padded). */
  private def findRiffChunk(b: Array[Byte], start: Int, end: Int,
                            fourcc: String,
                            listType: String = null): Option[(Int, Int)] = {
    var off = start
    while (off + 8 <= end) {
      // chunk layout: fourcc (4) + LE size (4) + payload (+ pad to even)
      val size = leInt(b, off + 4) & 0xffffffffL
      if (off + 8 + size > end) return None
      val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val payload = off + 8
      val chunkEnd = (payload + size).toInt
      if (listType != null && id == "LIST" && size >= 4 &&
        new String(b, payload, 4, java.nio.charset.StandardCharsets.US_ASCII) == listType)
        return Some((payload + 4, chunkEnd))
      if (listType == null && id == fourcc) return Some((payload, chunkEnd))
      off = chunkEnd + (size.toInt & 1) // pad to even
    }
    None
  }

  /** MJPEG frame payloads of an AVI: walk `RIFF/AVI ` → `LIST movi` →
    * `##dc`/`##db` chunks (compressed/uncompressed video frames for any
    * stream number), descending into nested `LIST` groupings — standard
    * interleaved AVIs wrap each frame group in `LIST rec `, and skipping
    * those as opaque would silently drop every frame. Plain byte
    * arithmetic — no codec involved; the returned slices are complete
    * JPEG files for an MJPEG stream. */
  def aviVideoChunks(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (mediaType(bytes) != "video/avi") return Nil
    findRiffChunk(bytes, 12, bytes.length, null, "movi").toSeq.flatMap {
      case (ms, me) =>
        val frames = Seq.newBuilder[Array[Byte]]
        def walk(start: Int, end: Int): Unit = {
          var off = start
          while (off + 8 <= end) {
            val size = leInt(bytes, off + 4) & 0xffffffffL
            if (off + 8 + size > end) { off = end }
            else {
              val isList = bytes(off) == 'L' && bytes(off + 1) == 'I' &&
                bytes(off + 2) == 'S' && bytes(off + 3) == 'T'
              val isVideo = bytes(off + 2) == 'd' &&
                (bytes(off + 3) == 'c' || bytes(off + 3) == 'b')
              if (isList && size >= 4)
                walk(off + 12, (off + 8 + size).toInt) // skip the list type
              else if (isVideo)
                frames += java.util.Arrays.copyOfRange(
                  bytes, off + 8, (off + 8 + size).toInt)
              off = (off + 8 + size + (size & 1)).toInt
            }
          }
        }
        walk(ms, me)
        frames.result()
    }
  }

  /** stsd sample-entry fourccs whose samples are complete JPEG files —
    * the MJPEG-in-MP4 convention (QuickTime `jpeg`/`mjpa`, plus the
    * registered MJPEG variants). Tracks with any other codec (H.264's
    * `avc1`, HEVC's `hvc1`…) are NOT walked here: the JDK ships no
    * decoder for their samples. */
  private val JpegSampleFourccs = Set("jpeg", "mjpa", "mjpb", "mjpg", "avdj")

  /** JPEG sample payloads of an MJPEG-in-MP4: walk `moov` → each `trak`
    * → `mdia/minf/stbl`; a track whose first `stsd` entry is
    * JPEG-family yields its samples by the standard sample-table
    * arithmetic — `stsc` (chunk → samples-per-chunk runs) × `stsz`
    * (per-sample sizes) × `stco`/`co64` (absolute chunk offsets).
    * Plain byte walking, no codec: each returned slice is a complete
    * JPEG file for `ImageIO`. Malformed tables (offsets or sizes
    * escaping the buffer) stop that track's walk rather than throw —
    * the same bail-don't-loop discipline as [[findBox]]. */
  def mp4VideoSamples(bytes: Array[Byte]): Seq[Array[Byte]] = {
    if (mediaType(bytes) != "video/mp4") return Nil
    findBox(bytes, 0, bytes.length, "moov").toSeq.flatMap { case (ms, me) =>
      val out = Seq.newBuilder[Array[Byte]]
      var off = ms
      var done = false
      while (!done && off < me) {
        findBox(bytes, off, me, "trak") match {
          case None => done = true
          case Some((ts, te)) =>
            out ++= trakJpegSamples(bytes, ts, te)
            off = te
        }
      }
      out.result()
    }
  }

  /** One track's JPEG samples (empty for non-JPEG codecs). */
  private def trakJpegSamples(b: Array[Byte], ts: Int, te: Int): Seq[Array[Byte]] = {
    trakStbl(b, ts, te) match {
      case None => Nil
      case Some((ss, se)) =>
        stsdFirstEntry(b, ss, se) match {
          case Some((fourcc, _, _)) if JpegSampleFourccs.contains(fourcc) =>
            sampleTableBytes(b, ss, se)
          case _ => Nil
        }
    }
  }

  private def trakStbl(b: Array[Byte], ts: Int, te: Int): Option[(Int, Int)] =
    for {
      (ds, de) <- findBox(b, ts, te, "mdia")
      (fs, fe) <- findBox(b, ds, de, "minf")
      st <- findBox(b, fs, fe, "stbl")
    } yield st

  /** First stsd sample entry: (lowercased fourcc, entry payload bounds).
    * stsd: version/flags(4) entry_count(4) entry{size(4) format(4) …}. */
  private def stsdFirstEntry(b: Array[Byte], ss: Int,
                             se: Int): Option[(String, Int, Int)] =
    findBox(b, ss, se, "stsd") match {
      case Some((s, e)) if s + 16 <= e =>
        val entrySize = beInt(b, s + 8)
        val entryEnd = s + 8L + entrySize
        if (entrySize < 8 || entryEnd > e) None
        else Some((new String(b, s + 12, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
          .toLowerCase(java.util.Locale.ROOT), s + 8, entryEnd.toInt))
      case _ => None
    }

  /** The stsz × stco/co64 × stsc sample arithmetic, codec-agnostic. */
  private def sampleTableBytes(b: Array[Byte], ss: Int,
                               se: Int): Seq[Array[Byte]] = {
        // stsz: version/flags(4) fixed_size(4) count(4) [sizes…]
        val sizes: Array[Long] = findBox(b, ss, se, "stsz") match {
          case Some((s, e)) if s + 12 <= e =>
            val fixed = beInt(b, s + 4) & 0xffffffffL
            val n = beInt(b, s + 8)
            // fixed-size path: total declared bytes can never exceed the
            // file, so n is bounded BEFORE the allocation (a crafted
            // stsz declaring 2^31 samples must not allocate a 17 GB
            // array — the same allocation-bomb guard as H264.parseSps)
            if (n < 0 || (fixed == 0 && s + 12 + 4L * n > e) ||
              (fixed != 0 && fixed * n > b.length)) Array.empty
            else if (fixed != 0) Array.fill(n)(fixed)
            else Array.tabulate(n)(i => beInt(b, s + 12 + 4 * i) & 0xffffffffL)
          case _ => Array.empty
        }
        // chunk offsets: stco (32-bit) or co64 (64-bit)
        val chunkOffsets: Array[Long] = findBox(b, ss, se, "stco") match {
          case Some((s, e)) if s + 8 <= e =>
            val n = beInt(b, s + 4)
            if (n < 0 || s + 8 + 4L * n > e) Array.empty
            else Array.tabulate(n)(i => beInt(b, s + 8 + 4 * i) & 0xffffffffL)
          case _ => findBox(b, ss, se, "co64") match {
            case Some((s, e)) if s + 8 <= e =>
              val n = beInt(b, s + 4)
              if (n < 0 || s + 8 + 8L * n > e) Array.empty
              else Array.tabulate(n)(i => beLong(b, s + 8 + 8 * i))
            case _ => Array.empty
          }
        }
        // stsc: version/flags(4) entry_count(4) {first_chunk,
        // samples_per_chunk, sample_description_index}(12)…
        val stscRuns: Array[(Long, Long)] = findBox(b, ss, se, "stsc") match {
          case Some((s, e)) if s + 8 <= e =>
            val n = beInt(b, s + 4)
            if (n < 0 || s + 8 + 12L * n > e) Array.empty
            else Array.tabulate(n) { i =>
              (beInt(b, s + 8 + 12 * i) & 0xffffffffL,
                beInt(b, s + 12 + 12 * i) & 0xffffffffL)
            }
          case _ => Array.empty
        }
        if (sizes.isEmpty || chunkOffsets.isEmpty || stscRuns.isEmpty) return Nil
        val frames = Seq.newBuilder[Array[Byte]]
        var sample = 0
        var run = 0
        var chunk = 1L
        var copied = 0L // Σ extracted bytes — overlap amplification guard
        while (sample < sizes.length && chunk <= chunkOffsets.length) {
          // advance to the stsc run covering this chunk
          while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= chunk)
            run += 1
          var offset = chunkOffsets((chunk - 1).toInt)
          var inChunk = 0L
          while (inChunk < stscRuns(run)._2 && sample < sizes.length) {
            val sz = sizes(sample)
            // the per-sample bound alone admits a table whose chunks all
            // overlap (every offset 0, every size = file size): each copy
            // is legal but Σ copies is quadratic in the file. A real
            // table's samples tile the mdat at most once — cap the total
            if (offset < 0 || sz <= 0 || offset + sz > b.length ||
              copied + sz > b.length)
              return frames.result() // malformed table: bail, don't throw
            frames += java.util.Arrays.copyOfRange(
              b, offset.toInt, (offset + sz).toInt)
            copied += sz
            offset += sz
            sample += 1
            inChunk += 1
          }
          chunk += 1
        }
        frames.result()
  }

  /** The first `avc1` (H.264) track of an MP4: the avcC decoder
    * configuration's SPS/PPS NAL units, the per-sample NAL length-field
    * size, and the raw samples from the same stsc × stsz × stco walk the
    * JPEG path uses. avcC (ISO 14496-15 §5.2.4): configurationVersion(1)
    * profile(1) compat(1) level(1) 0xFC|lengthSizeMinusOne(1)
    * 0xE0|numSPS(1) {len(2) spsNAL}… numPPS(1) {len(2) ppsNAL}…, found
    * after the 86-byte VisualSampleEntry header of the stsd entry. */
  def mp4Avc1Track(bytes: Array[Byte])
      : Option[(Array[Byte], Array[Byte], Int, Seq[Array[Byte]])] = {
    if (mediaType(bytes) != "video/mp4") return None
    findBox(bytes, 0, bytes.length, "moov").flatMap { case (ms, me) =>
      var off = ms
      var found: Option[(Array[Byte], Array[Byte], Int, Seq[Array[Byte]])] = None
      while (found.isEmpty && off < me) {
        findBox(bytes, off, me, "trak") match {
          case None => off = me
          case Some((ts, te)) =>
            found = trakAvc1(bytes, ts, te)
            off = te
        }
      }
      found
    }
  }

  private def trakAvc1(b: Array[Byte], ts: Int, te: Int)
      : Option[(Array[Byte], Array[Byte], Int, Seq[Array[Byte]])] =
    for {
      (ss, se) <- trakStbl(b, ts, te)
      (fourcc, es, ee) <- stsdFirstEntry(b, ss, se)
      if fourcc == "avc1" && es + 86 <= ee
      (cs, ce) <- findBox(b, es + 86, ee, "avcC")
      cfg <- parseAvcC(b, cs, ce)
    } yield (cfg._1, cfg._2, cfg._3, sampleTableBytes(b, ss, se))

  private def parseAvcC(b: Array[Byte], cs: Int,
                        ce: Int): Option[(Array[Byte], Array[Byte], Int)] = {
    // 8 bytes precede the SPS body: version, profile, compat, level,
    // lengthSize, numSPS, and the 2-byte spsLen at cs+6..cs+7
    if (cs + 8 > ce || b(cs) != 1) return None
    val lengthSize = (b(cs + 4) & 0x03) + 1
    val numSps = b(cs + 5) & 0x1f
    // multi-SPS configs exist (ISO 14496-15 allows >1); parsing only the
    // first would misread the second SPS's bytes as the PPS count — bail
    // to the stub instead of decoding against a corrupted config
    if (numSps != 1) return None
    val spsLen = ((b(cs + 6) & 0xff) << 8) | (b(cs + 7) & 0xff)
    val spsEnd = cs + 8 + spsLen
    if (spsEnd + 1 > ce) return None
    val sps = java.util.Arrays.copyOfRange(b, cs + 8, spsEnd)
    val numPps = b(spsEnd) & 0xff
    if (numPps < 1 || spsEnd + 3 > ce) return None
    val ppsLen = ((b(spsEnd + 1) & 0xff) << 8) | (b(spsEnd + 2) & 0xff)
    if (spsEnd + 3 + ppsLen > ce) return None
    val pps = java.util.Arrays.copyOfRange(b, spsEnd + 3, spsEnd + 3 + ppsLen)
    Some((sps, pps, lengthSize))
  }

  /** Split one AVCC-format sample into its NAL units (each prefixed by
    * a big-endian `lengthSize`-byte length). Malformed lengths bail with
    * what parsed so far — the sample-walk discipline. */
  def avccNals(sample: Array[Byte], lengthSize: Int): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var off = 0
    while (off + lengthSize <= sample.length) {
      var len = 0L
      var i = 0
      while (i < lengthSize) {
        len = (len << 8) | (sample(off + i) & 0xff); i += 1
      }
      val start = off + lengthSize
      if (len <= 0 || start + len > sample.length) return out.result()
      out += java.util.Arrays.copyOfRange(sample, start, (start + len).toInt)
      off = (start + len).toInt
    }
    out.result()
  }

  /** AVI metadata from the `avih` main header inside `LIST hdrl`:
    * dwMicroSecPerFrame (offset 0), dwTotalFrames (16), dwWidth (32),
    * dwHeight (36) — duration = frames × µs/frame. */
  private def parseAvi(b: Array[Byte]): MediaMeta = {
    val meta = for {
      (hs, he) <- findRiffChunk(b, 12, b.length, null, "hdrl")
      (as, ae) <- findRiffChunk(b, hs, he, "avih") if ae - as >= 40
    } yield {
      val usPerFrame = leInt(b, as) & 0xffffffffL
      val totalFrames = leInt(b, as + 16) & 0xffffffffL
      MediaMeta("video/avi", leInt(b, as + 32), leInt(b, as + 36),
        usPerFrame * totalFrames / 1000, 0, 0)
    }
    meta.getOrElse(MediaMeta("video/avi", 0, 0, 0L, 0, 0))
  }

  /** Parse structural metadata from raw bytes (real header parsing):
    * PNG: width/height from the IHDR chunk (bytes 16..23);
    * JPEG: scan markers for SOF0-15, dims from its payload;
    * WAV: channels/sample-rate from the fmt chunk, duration from data size;
    * MP4: duration from moov/mvhd, dimensions from the first video
    * trak's tkhd (see [[parseMp4]]);
    * AVI: dimensions/duration from the avih main header (see [[parseAvi]]).
    */
  def parseMeta(bytes: Array[Byte]): MediaMeta = mediaType(bytes) match {
    case "video/mp4" => parseMp4(bytes)
    case "video/avi" => parseAvi(bytes)
    case "image/png" if bytes.length >= 24 =>
      MediaMeta("image/png", beInt(bytes, 16), beInt(bytes, 20), 0L, 0, 0)
    // GIF logical screen descriptor: LE uint16 dims at offsets 6/8
    case "image/gif" if bytes.length >= 10 =>
      MediaMeta("image/gif", leShort(bytes, 6), leShort(bytes, 8), 0L, 0, 0)
    // BITMAPINFOHEADER: LE int32 dims at 18/22 (height negative = top-down)
    case "image/bmp" if bytes.length >= 26 =>
      MediaMeta("image/bmp", leInt(bytes, 18), math.abs(leInt(bytes, 22)), 0L, 0, 0)
    case "image/jpeg" =>
      var i = 2
      var meta = MediaMeta("image/jpeg", 0, 0, 0L, 0, 0)
      var done = false
      while (!done && i + 9 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) { i += 1 }
        else {
          val marker = bytes(i + 1) & 0xff
          if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            meta = MediaMeta("image/jpeg",
              ((bytes(i + 7) & 0xff) << 8) | (bytes(i + 8) & 0xff),
              ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff), 0L, 0, 0)
            done = true
          } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
          else i += 2 + (((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff))
        }
      }
      meta
    case "audio/wav" if bytes.length >= 44 =>
      val channels = leShort(bytes, 22)
      val sampleRate = leInt(bytes, 24)
      val byteRate = leInt(bytes, 28)
      val dataSize = leInt(bytes, 40)
      val durMs = if (byteRate > 0) dataSize.toLong * 1000 / byteRate else 0L
      MediaMeta("audio/wav", 0, 0, durMs, channels, sampleRate)
    case t => MediaMeta(t, 0, 0, 0L, 0, 0)
  }

  /** Partition-local batched decode: groups each partition's records into
    * `batchSize` chunks and hands whole batches to the decoder — the batch
    * shape of a vectorized UDF, so a real decoder can amortize model /
    * codec setup per batch. No shuffle: decode is pure map-side work and
    * scales with input splits. */
  def extractFeatures(records: Dataset[MediaRecord], decoder: FeatureDecoder,
                      batchSize: Int = 64)
                     (implicit enc: Encoder[MediaFeatures]): Dataset[MediaFeatures] =
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val decoded = decoder.decodeBatch(batch.map(r => (r.meta, r.content)))
        batch.iterator.zip(decoded.iterator).map { case (r, feats) =>
          MediaFeatures(r.id, r.meta.mediaType,
            if (r.content == null) 0L else r.content.length.toLong, feats)
        }
      }
    }
}

/** Typed metadata carried beside the binary payload. */
case class MediaMeta(mediaType: String, width: Int, height: Int,
                     durationMs: Long, channels: Int, sampleRate: Int)

/** One media row: id + metadata + opaque bytes. */
case class MediaRecord(id: Long, meta: MediaMeta, content: Array[Byte])

/** Decoded features row. */
case class MediaFeatures(id: Long, mediaType: String, byteLen: Long,
                         features: Array[Float])

/** Batch decoder contract — receives whole batches (metadata + bytes),
  * returns one feature vector per input, in order. */
trait FeatureDecoder extends Serializable {
  def decodeBatch(batch: Seq[(MediaMeta, Array[Byte])]): Seq[Array[Float]]
}

/** REAL image decoder on the JDK's own codecs: `javax.imageio` ships
  * PNG/JPEG/GIF/BMP readers, so pixel decode needs no external libraries.
  * Proves the [[FeatureDecoder]] contract end-to-end with actual pixels;
  * non-image or undecodable payloads (e.g. audio, truncated bytes) fall
  * back to [[StubFeatureDecoder]] so mixed-modality batches still yield a
  * vector per row.
  *
  * Features (all in [0, 1]-ish ranges, deterministic):
  * width/4096, height/4096, aspect, mean R/G/B, mean luma, luma stddev —
  * the cheap global statistics a curation pipeline filters on before any
  * model runs. */
object ImageIoFeatureDecoder extends FeatureDecoder {
  val Dim = 8

  override def decodeBatch(batch: Seq[(MediaMeta, Array[Byte])]): Seq[Array[Float]] =
    batch.map { case (meta, bytes) =>
      val img =
        if (bytes == null) null
        else
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          // NonFatal only: an OOM or task-kill interrupt must fail the
          // task, not silently hand the record stub features
          catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) StubFeatureDecoder.decodeBatch(Seq((meta, bytes))).head
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr, sg, sb, sl, sl2 = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
            val l = 0.299 * r + 0.587 * g + 0.114 * b
            sr += r; sg += g; sb += b; sl += l; sl2 += l * l
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        val meanL = sl / n
        val varL = math.max(0.0, sl2 / n - meanL * meanL)
        Array(w / 4096f, h / 4096f, w.toFloat / h,
          (sr / n / 255).toFloat, (sg / n / 255).toFloat, (sb / n / 255).toFloat,
          (meanL / 255).toFloat, (math.sqrt(varL) / 255).toFloat)
      }
    }
}

/** REAL audio decoder on the JDK's own codec: `javax.sound.sampled`
  * ships a WAV/PCM reader, so sample decode needs no external libraries.
  * Proves the [[FeatureDecoder]] contract on actual audio samples;
  * undecodable payloads fall back to [[StubFeatureDecoder]].
  *
  * Features (deterministic): durationMin, channels/8, sampleRate/48k,
  * RMS amplitude, peak amplitude, zero-crossing rate (channel 0),
  * mean amplitude, amplitude stddev — the cheap global statistics an
  * audio curation pipeline gates on (silence, clipping, noise). */
object WavFeatureDecoder extends FeatureDecoder {
  val Dim = 8

  override def decodeBatch(batch: Seq[(MediaMeta, Array[Byte])]): Seq[Array[Float]] =
    batch.map { case (meta, bytes) =>
      val decoded =
        if (bytes == null) null
        // NonFatal only — same rationale as ImageIoFeatureDecoder
        else try decodePcm(bytes) catch { case scala.util.control.NonFatal(_) => null }
      decoded match {
        case null => StubFeatureDecoder.decodeBatch(Seq((meta, bytes))).head
        case (samples, channels, sampleRate) if samples.nonEmpty =>
          val n = samples.length
          var sum, sum2, peak = 0.0
          var zc = 0
          var i = 0
          var prev = samples(0)
          while (i < n) {
            val s = samples(i)
            sum += s; sum2 += s * s
            val a = math.abs(s)
            if (a > peak) peak = a
            // zero crossings on channel 0 only (stride = channel count)
            if (i >= channels && (channels == 1 || i % channels == 0)) {
              if (s * prev < 0) zc += 1
              prev = s
            }
            i += 1
          }
          val mean = sum / n
          val std = math.sqrt(math.max(0.0, sum2 / n - mean * mean))
          val frames = n.toDouble / channels
          val durMin = frames / sampleRate / 60.0
          val zcr = if (frames > 1) zc / (frames - 1) else 0.0
          Array(durMin.toFloat, channels / 8f, sampleRate / 48000f,
            math.sqrt(sum2 / n).toFloat, peak.toFloat, zcr.toFloat,
            mean.toFloat, std.toFloat)
        case _ => StubFeatureDecoder.decodeBatch(Seq((meta, bytes))).head
      }
    }

  /** PCM samples normalized to [-1, 1], interleaved; returns
    * (samples, channels, sampleRate). Covers the JDK reader's PCM forms:
    * 16-bit signed (either endianness) and 8-bit unsigned.
    * (widened to `private[multimodal]`: [[AudioSpectral]] reuses it.) */
  private[multimodal] def decodePcm(bytes: Array[Byte]): (Array[Float], Int, Int) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val raw = ais.readAllBytes()
      val samples =
        if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED && bits == 16) {
          val out = new Array[Float](raw.length / 2)
          var i = 0
          while (i < out.length) {
            val lo = raw(2 * i) & 0xff
            val hi = raw(2 * i + 1) & 0xff
            val v = if (fmt.isBigEndian) (raw(2 * i) << 8) | hi else (raw(2 * i + 1) << 8) | lo
            out(i) = v / 32768f
            i += 1
          }
          out
        } else if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED && bits == 8) {
          raw.map(b => ((b & 0xff) - 128) / 128f)
        } else null
      if (samples == null) null else (samples, fmt.getChannels, fmt.getSampleRate.toInt)
    } finally ais.close()
  }
}

/** REAL video-frame decoder for MJPEG-in-AVI: frame extraction is RIFF
  * byte walking ([[Multimodal.aviVideoChunks]]) and each MJPEG frame is a
  * complete JPEG, which `javax.imageio` decodes — so frame-sample +
  * pixel-decode runs on the JDK alone. Samples up to [[MaxFrames]] frames
  * evenly across the stream (the standard video-curation shape: cost is
  * per *sampled* frame, independent of clip length), computes per-frame
  * color/luma stats, and pools them.
  *
  * Features (deterministic): nFrames/1000, width/4096, height/4096,
  * mean R/G/B over sampled frames, mean luma, motion proxy = mean
  * |Δ mean-luma| between consecutive sampled frames (0..1).
  * Non-MJPEG video (e.g. H.264 in MP4 — no JDK codec) falls back to
  * [[StubFeatureDecoder]]. */
object MjpegAviFrameDecoder extends FeatureDecoder {
  val Dim = FramePool.Dim
  val MaxFrames = FramePool.MaxFrames

  override def decodeBatch(batch: Seq[(MediaMeta, Array[Byte])]): Seq[Array[Float]] =
    batch.map { case (meta, bytes) =>
      val frames = Multimodal.aviVideoChunks(bytes)
      val imgs = FramePool.sampleIndices(frames.length).flatMap { i =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frames(i)))
          // NonFatal only — same rationale as ImageIoFeatureDecoder
          catch { case scala.util.control.NonFatal(_) => null }
        Option(img)
      }
      FramePool.features(frames.length, imgs)
        .getOrElse(StubFeatureDecoder.decodeBatch(Seq((meta, bytes))).head)
    }
}

/** Shared frame-sampling + stat-pooling for the video-ish decoders
  * ([[MjpegAviFrameDecoder]], [[GifFrameDecoder]]): up to [[MaxFrames]]
  * frames sampled evenly across the stream, per-frame color/luma means,
  * pooled into the 8-feature layout documented on
  * [[MjpegAviFrameDecoder]]. */
private[multimodal] object FramePool {
  val Dim = 8
  val MaxFrames = 8

  /** Indices of up to [[MaxFrames]] frames, evenly spread over n. */
  def sampleIndices(n: Int): Seq[Int] =
    if (n <= MaxFrames) 0 until n
    else (0 until MaxFrames).map(i => i * (n - 1) / (MaxFrames - 1))

  /** Pool decoded frames into the feature vector; None when no frame
    * decoded (callers fall back to the stub). `nTotal` is the full frame
    * count of the stream (pre-sampling). */
  def features(nTotal: Int,
               imgs: Seq[java.awt.image.BufferedImage]): Option[Array[Float]] = {
    // (w, h, meanR, meanG, meanB, meanLuma) per decoded sampled frame
    val stats = imgs.map { img =>
      val w = img.getWidth; val h = img.getHeight
      var sr, sg, sb, sl = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          sr += r; sg += g; sb += b; sl += 0.299 * r + 0.587 * g + 0.114 * b
          x += 1
        }
        y += 1
      }
      val np = w.toDouble * h
      (w, h, sr / np / 255, sg / np / 255, sb / np / 255, sl / np / 255)
    }
    if (stats.isEmpty) None
    else {
      val k = stats.length.toDouble
      val motion =
        if (stats.length < 2) 0.0
        else stats.sliding(2).map { case Seq(a, b) => math.abs(b._6 - a._6) }
          .sum / (stats.length - 1)
      Some(Array(nTotal / 1000f, stats.head._1 / 4096f, stats.head._2 / 4096f,
        (stats.map(_._3).sum / k).toFloat, (stats.map(_._4).sum / k).toFloat,
        (stats.map(_._5).sum / k).toFloat, (stats.map(_._6).sum / k).toFloat,
        motion.toFloat))
    }
  }
}

/** REAL animated-GIF frame decoder: the JDK's GIF reader iterates frames
  * (`getNumImages`/`read(i)`), so frame sampling needs no codec library —
  * only the sampled indices are decoded, like a real video pipeline.
  * Same feature layout and pooling as [[MjpegAviFrameDecoder]]; a
  * still (1-frame) GIF degenerates to frame stats with zero motion.
  * Undecodable payloads fall back to [[StubFeatureDecoder]]. */
object GifFrameDecoder extends FeatureDecoder {
  val Dim = FramePool.Dim

  override def decodeBatch(batch: Seq[(MediaMeta, Array[Byte])]): Seq[Array[Float]] =
    batch.map { case (meta, bytes) =>
      val pooled =
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) None
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                val n = reader.getNumImages(true)
                val imgs = FramePool.sampleIndices(n).flatMap { i =>
                  try Option(reader.read(i))
                  catch { case scala.util.control.NonFatal(_) => None }
                }
                FramePool.features(n, imgs)
              } finally reader.dispose()
            }
          } finally if (iis != null) iis.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      pooled.getOrElse(StubFeatureDecoder.decodeBatch(Seq((meta, bytes))).head)
    }
}

/** MJPEG-in-MP4 twin of [[MjpegAviFrameDecoder]]: frame extraction is
  * sample-table walking ([[Multimodal.mp4VideoSamples]] — stsc × stsz ×
  * stco byte arithmetic), each sample a complete JPEG for
  * `javax.imageio`. An `avc1` (H.264) track is decoded for REAL when its
  * samples are I_PCM baseline ([[H264]] — the raw-macroblock subset a
  * from-spec parser can decode losslessly); only entropy-coded
  * H.264/HEVC falls through to [[StubFeatureDecoder]]. */
object Mp4FrameDecoder extends FeatureDecoder {
  val Dim = FramePool.Dim

  override def decodeBatch(batch: Seq[(MediaMeta, Array[Byte])]): Seq[Array[Float]] =
    batch.map { case (meta, bytes) =>
      val frames = Multimodal.mp4VideoSamples(bytes)
      val pooled =
        if (frames.nonEmpty) {
          val imgs = FramePool.sampleIndices(frames.length).flatMap { i =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frames(i)))
              catch { case scala.util.control.NonFatal(_) => null }
            Option(img)
          }
          FramePool.features(frames.length, imgs)
        } else
          try Multimodal.mp4Avc1Track(bytes).flatMap { case (sps, pps, lenSize, samples) =>
            val imgs = FramePool.sampleIndices(samples.length).flatMap { i =>
              try H264.decodeNals(
                  Seq(sps, pps) ++ Multimodal.avccNals(samples(i), lenSize))
                .headOption.map(H264.toImage)
              catch { case scala.util.control.NonFatal(_) => None }
            }
            FramePool.features(samples.length, imgs)
          } catch { case scala.util.control.NonFatal(_) => None }
      pooled.getOrElse(StubFeatureDecoder.decodeBatch(Seq((meta, bytes))).head)
    }
}

/** One decoder for a mixed-modality corpus: route each record to the JDK
  * codec for its container (imageio for PNG/JPEG, sampled-audio for WAV,
  * RIFF walking + imageio for MJPEG-AVI frames, sample-table walking +
  * imageio for MJPEG-MP4 samples, from-spec [[H264]] I_PCM decode for
  * avc1 tracks); only entropy-coded video takes the stub. */
object JdkFeatureDecoder extends FeatureDecoder {
  val Dim = 8

  override def decodeBatch(batch: Seq[(MediaMeta, Array[Byte])]): Seq[Array[Float]] =
    batch.map { rec =>
      rec._1.mediaType match {
        case "image/png" | "image/jpeg" | "image/bmp" =>
          ImageIoFeatureDecoder.decodeBatch(Seq(rec)).head
        case "audio/wav" => WavFeatureDecoder.decodeBatch(Seq(rec)).head
        case "video/avi" => MjpegAviFrameDecoder.decodeBatch(Seq(rec)).head
        case "video/mp4" => Mp4FrameDecoder.decodeBatch(Seq(rec)).head
        // GIFs can animate: the frame-sampling decoder covers both (a
        // still GIF is the 1-frame, zero-motion case)
        case "image/gif" => GifFrameDecoder.decodeBatch(Seq(rec)).head
        case _ => StubFeatureDecoder.decodeBatch(Seq(rec)).head
      }
    }
}

/** STUB — deterministic fake decoder for the payloads still outside
  * every real path: CABAC-coded H.264 and H.265 — I_PCM baseline,
  * CAVLC-intra (I-slices: Intra_4x4/Intra_16x16 prediction, full CAVLC
  * residual decode, dequant/IDCT), P-slices with FULL quarter-pel
  * motion compensation (P_Skip, every P partitioning down to 4x4
  * sub-macroblock partitions, the directional and median predictors,
  * the 6-tap half-pel filter + quarter-pel averaging, inter CBP,
  * residual-over-prediction) AND B-slices (two reference lists,
  * default bi-prediction, spatial direct + B_Skip, B_L0/L1/Bi 16x16,
  * intra-in-B) decode for real via
  * [[H264]]/[[H264Intra]]/[[H264Cavlc]]/[[H264Inter]]/[[H264BInter]] —
  * and exotic image/audio containers; stands in with a hash-derived
  * vector (stable across runs/engines) so the pipeline plumbing is
  * fully exercisable. Marked ??? on the real path. */
object StubFeatureDecoder extends FeatureDecoder {
  val Dim = 8

  override def decodeBatch(batch: Seq[(MediaMeta, Array[Byte])]): Seq[Array[Float]] =
    batch.map { case (meta, bytes) =>
      // real implementation would be: decodePixels(meta, bytes) → model(...)
      // ??? — no codec libs in this environment; deterministic fake below
      val h = if (bytes == null) 0 else java.util.Arrays.hashCode(bytes)
      Array.tabulate(Dim)(i => (((h * (i + 1)) % 1000).toFloat) / 1000f)
    }
}
