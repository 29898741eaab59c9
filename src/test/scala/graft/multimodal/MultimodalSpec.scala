package graft.multimodal

import graft.SparkSpec

/** Multimodal plumbing: header parsing is real (synthesized valid PNG /
  * JPEG / WAV headers), decode is the documented stub, batching is
  * observable through a counting decoder. */
class MultimodalSpec extends SparkSpec {

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val b = new Array[Byte](24)
    val magic = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    magic.copyToArray(b)
    // length(4) + "IHDR" then width/height big-endian
    b(12) = 'I'; b(13) = 'H'; b(14) = 'D'; b(15) = 'R'
    for (i <- 0 until 4) b(16 + i) = ((w >>> (24 - 8 * i)) & 0xff).toByte
    for (i <- 0 until 4) b(20 + i) = ((h >>> (24 - 8 * i)) & 0xff).toByte
    b
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    // SOI, APP0 (len 4, empty), SOF0 with height/width
    val b = scala.collection.mutable.ArrayBuffer[Byte]()
    b ++= Array(0xff, 0xd8).map(_.toByte)                     // SOI
    b ++= Array(0xff, 0xe0, 0x00, 0x04, 0x00, 0x00).map(_.toByte) // APP0 len=4
    b ++= Array(0xff, 0xc0, 0x00, 0x0b, 0x08).map(_.toByte)   // SOF0 len=11 prec=8
    b += ((h >> 8) & 0xff).toByte; b += (h & 0xff).toByte
    b += ((w >> 8) & 0xff).toByte; b += (w & 0xff).toByte
    b ++= Array(0x01, 0x01, 0x11, 0x00).map(_.toByte)
    b.toArray
  }

  private def wavBytes(sampleRate: Int, channels: Int, dataSize: Int): Array[Byte] = {
    val b = new Array[Byte](44 + dataSize)
    def le(off: Int, v: Int, n: Int): Unit =
      for (i <- 0 until n) b(off + i) = ((v >>> (8 * i)) & 0xff).toByte
    "RIFF".getBytes.copyToArray(b, 0); le(4, 36 + dataSize, 4)
    "WAVE".getBytes.copyToArray(b, 8); "fmt ".getBytes.copyToArray(b, 12)
    le(16, 16, 4); le(20, 1, 2); le(22, channels, 2); le(24, sampleRate, 4)
    val byteRate = sampleRate * channels * 2
    le(28, byteRate, 4); le(32, channels * 2, 2); le(34, 16, 2)
    "data".getBytes.copyToArray(b, 36); le(40, dataSize, 4)
    b
  }

  private def be(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xff).toByte)

  private def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatten.toArray
    be(body.length + 8L, 4) ++ typ.getBytes("ISO-8859-1") ++ body
  }

  /** Minimal valid MP4: ftyp + moov(mvhd v0, audio trak with zero dims,
    * video trak with 16.16 fixed-point dims) + mdat. */
  private def mp4Bytes(w: Int, h: Int, timescale: Int, duration: Int): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes, be(0, 4), "isomiso2".getBytes)
    val mvhd = box("mvhd", be(0, 4), be(0, 4), be(0, 4),
      be(timescale, 4), be(duration, 4), new Array[Byte](80))
    val audioTkhd = box("tkhd", new Array[Byte](84))
    val videoTkhd = box("tkhd", be(0, 4), new Array[Byte](72),
      be(w.toLong << 16, 4), be(h.toLong << 16, 4))
    val moov = box("moov", mvhd, box("trak", audioTkhd), box("trak", videoTkhd))
    ftyp ++ moov ++ box("mdat", new Array[Byte](8))
  }

  test("MP4 moov/mvhd/tkhd metadata from plain byte walking") {
    val mp4 = mp4Bytes(640, 360, 600, 3000)
    assert(Multimodal.mediaType(mp4) == "video/mp4")
    // timescale 600, duration 3000 ticks → 5000 ms; dims from the video
    // trak (the zero-dim audio trak before it is skipped)
    assert(Multimodal.parseMeta(mp4) == MediaMeta("video/mp4", 640, 360, 5000L, 0, 0))

    // version-1 (64-bit) mvhd and tkhd layouts
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0), be(0, 8), be(0, 8),
      be(1000, 4), be(90000, 8), new Array[Byte](80))
    val tkhd1 = box("tkhd", Array[Byte](1, 0, 0, 0), new Array[Byte](84),
      be(1920L << 16, 4), be(1080L << 16, 4))
    val v1 = box("ftyp", "isom".getBytes) ++ box("moov", mvhd1, box("trak", tkhd1))
    assert(Multimodal.parseMeta(v1) == MediaMeta("video/mp4", 1920, 1080, 90000L, 0, 0))

    // moov-less stream: container detected, metadata zeroed — not a crash
    val bare = box("ftyp", "isom".getBytes) ++ box("mdat", new Array[Byte](8))
    assert(Multimodal.parseMeta(bare) == MediaMeta("video/mp4", 0, 0, 0L, 0, 0))

    // corrupt size field (smaller than its own header) bails cleanly
    val corrupt = mp4Bytes(640, 360, 600, 3000)
    corrupt(ftypLen(corrupt)) = 0; corrupt(ftypLen(corrupt) + 3) = 2
    assert(Multimodal.parseMeta(corrupt).mediaType == "video/mp4")
  }

  private def ftypLen(b: Array[Byte]): Int =
    ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) | ((b(2) & 0xff) << 8) | (b(3) & 0xff)

  // --- MJPEG-AVI fixture: JDK-encoded JPEG frames in a hand-built RIFF ---

  private def jpegOf(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >>> (8 * i)) & 0xff).toByte)

  private def riffChunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
    val pad: Array[Byte] = if (body.length % 2 == 1) Array(0.toByte) else Array.empty
    fourcc.getBytes("ISO-8859-1") ++ le(body.length, 4) ++ body ++ pad
  }

  private def riffList(listType: String, children: Array[Byte]*): Array[Byte] =
    riffChunk("LIST", listType.getBytes("ISO-8859-1") ++ children.flatten)

  /** Minimal MJPEG AVI: avih main header + movi list of 00dc JPEG frames. */
  private def aviBytes(w: Int, h: Int, usPerFrame: Int,
                       frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = new Array[Byte](56)
    le(usPerFrame, 4).copyToArray(avih, 0)
    le(frames.length, 4).copyToArray(avih, 16)
    le(w, 4).copyToArray(avih, 32)
    le(h, 4).copyToArray(avih, 36)
    val body = "AVI ".getBytes ++
      riffList("hdrl", riffChunk("avih", avih)) ++
      riffList("movi", frames.map(riffChunk("00dc", _)): _*)
    "RIFF".getBytes ++ le(body.length, 4) ++ body
  }

  test("AVI avih metadata and movi frame walking from plain bytes") {
    val frames = Seq(jpegOf(16, 16, 0xff0000), jpegOf(16, 16, 0x00ff00))
    val avi = aviBytes(16, 16, 40000, frames) // 25 fps, 2 frames → 80 ms
    assert(Multimodal.mediaType(avi) == "video/avi")
    assert(Multimodal.parseMeta(avi) == MediaMeta("video/avi", 16, 16, 80L, 0, 0))
    val chunks = Multimodal.aviVideoChunks(avi)
    assert(chunks.length == 2)
    assert(chunks.zip(frames).forall { case (c, f) => c.toList == f.toList })
    // headerless / truncated RIFF bails to empty, not a crash
    assert(Multimodal.aviVideoChunks("RIFFxxxxAVI ".getBytes) == Nil)

    // interleaved layout: frames wrapped in 'LIST rec ' groups inside
    // movi (the standard AVI interleave) must still be found
    val avih = new Array[Byte](56)
    val recBody = "AVI ".getBytes ++
      riffList("hdrl", riffChunk("avih", avih)) ++
      riffList("movi",
        riffList("rec ", riffChunk("00dc", frames(0))),
        riffList("rec ", riffChunk("00dc", frames(1))))
    val recAvi = "RIFF".getBytes ++ le(recBody.length, 4) ++ recBody
    val recChunks = Multimodal.aviVideoChunks(recAvi)
    assert(recChunks.length == 2)
    assert(recChunks.zip(frames).forall { case (c, f) => c.toList == f.toList })
  }

  test("real MJPEG video-frame decode: sampled frames → color/motion features") {
    val s = spark
    import s.implicits._
    val frames = Seq(jpegOf(16, 16, 0xff0000), jpegOf(16, 16, 0x00ff00),
      jpegOf(16, 16, 0x0000ff))
    val avi = aviBytes(16, 16, 40000, frames)
    val meta = Multimodal.parseMeta(avi)
    val ds = s.createDataset(Seq(MediaRecord(1L, meta, avi)))
    val Array(f) = Multimodal.extractFeatures(ds, MjpegAviFrameDecoder).collect()
    val feats = f.features
    assert(feats.length == MjpegAviFrameDecoder.Dim)
    assert(math.abs(feats(0) - 3f / 1000f) < 1e-6)    // frame count
    assert(math.abs(feats(1) - 16f / 4096f) < 1e-6)   // width from decoded pixels
    assert(math.abs(feats(2) - 16f / 4096f) < 1e-6)   // height
    // one pure-R, one pure-G, one pure-B frame → each channel mean ≈ 1/3
    assert(math.abs(feats(3) - 1f / 3) < 0.05)
    assert(math.abs(feats(4) - 1f / 3) < 0.05)
    assert(math.abs(feats(5) - 1f / 3) < 0.05)
    assert(feats(7) > 0.1f)                           // frames differ → motion
    // static clip: identical frames → zero-ish motion
    val still = aviBytes(16, 16, 40000, Seq.fill(3)(jpegOf(16, 16, 0x808080)))
    val sf = MjpegAviFrameDecoder.decodeBatch(
      Seq((Multimodal.parseMeta(still), still))).head
    assert(sf(7) < 0.01f)
    // and it is NOT the stub's hash vector
    assert(feats.toList !=
      StubFeatureDecoder.decodeBatch(Seq((meta, avi))).head.toList)
  }

  test("GIF and BMP: sniffed, dims parsed, routed to the real imageio decoder") {
    def encoded(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(6, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, 0xff0000)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val gif = encoded("gif"); val bmp = encoded("bmp")
    assert(Multimodal.parseMeta(gif) == MediaMeta("image/gif", 6, 4, 0L, 0, 0))
    assert(Multimodal.parseMeta(bmp) == MediaMeta("image/bmp", 6, 4, 0L, 0, 0))
    val bmpRec = (Multimodal.parseMeta(bmp), bmp)
    val bmpFeats = JdkFeatureDecoder.decodeBatch(Seq(bmpRec)).head
    assert(bmpFeats.toList == ImageIoFeatureDecoder.decodeBatch(Seq(bmpRec)).head.toList)
    assert(bmpFeats(3) > 0.8f) // an all-red image decoded for real, not hashed
    // a still GIF goes through the frame decoder: 1 frame, real red, no motion
    val gifRec = (Multimodal.parseMeta(gif), gif)
    val gifFeats = JdkFeatureDecoder.decodeBatch(Seq(gifRec)).head
    assert(gifFeats.toList == GifFrameDecoder.decodeBatch(Seq(gifRec)).head.toList)
    assert(math.abs(gifFeats(0) - 1f / 1000f) < 1e-6)
    assert(gifFeats(3) > 0.8f)
    assert(gifFeats(7) == 0f)
  }

  /** Animated GIF via the JDK's own sequence writer. */
  private def animatedGif(colors: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, c)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    out.toByteArray
  }

  test("animated GIF: frames sampled and decoded for real, motion detected") {
    val gif = animatedGif(Seq(0x000000, 0xffffff, 0x000000))
    val meta = Multimodal.parseMeta(gif)
    assert(meta.mediaType == "image/gif" && meta.width == 8 && meta.height == 8)
    val feats = GifFrameDecoder.decodeBatch(Seq((meta, gif))).head
    assert(math.abs(feats(0) - 3f / 1000f) < 1e-6) // all 3 frames seen
    assert(feats(7) > 0.5f)                        // black↔white flicker = max motion
    assert(feats.toList != StubFeatureDecoder.decodeBatch(Seq((meta, gif))).head.toList)
  }

  test("AVI with no decodable frames falls back to the stub") {
    val avi = aviBytes(16, 16, 40000, Seq("not a jpeg".getBytes))
    val meta = Multimodal.parseMeta(avi)
    val out = MjpegAviFrameDecoder.decodeBatch(Seq((meta, avi))).head
    assert(out.toList == StubFeatureDecoder.decodeBatch(Seq((meta, avi))).head.toList)
  }

  test("MJPEG-in-MP4: the sample-table walk recovers every JPEG sample") {
    // n=1 (single-sample chunk run), even n (one two-per-chunk run), odd
    // n ≥ 3 (TWO stsc runs: (1,2) then a trailing single) — all three
    // run-table shapes, every sample a decodable JPEG at the id's dims
    Seq(0L, 1L, 2L, 4L, 7L, 36L, 123L).foreach { id =>
      val bytes = SyntheticMedia.mjpegMp4Bytes(id)
      assert(Multimodal.mediaType(bytes) == "video/mp4")
      val samples = Multimodal.mp4VideoSamples(bytes)
      assert(samples.length == SyntheticMedia.mjpegMp4FrameCount(id),
        s"id=$id: ${samples.length}")
      samples.foreach { s =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(s))
        assert(img != null, s"id=$id: sample did not decode")
        assert(img.getWidth == SyntheticMedia.mjpegMp4FrameW(id) &&
          img.getHeight == SyntheticMedia.mjpegMp4FrameH(id))
      }
    }
  }

  test("Mp4FrameDecoder: real frame features for MJPEG samples, stub for codec-less MP4s") {
    val mjpeg = SyntheticMedia.mjpegMp4Bytes(5L)
    val meta = Multimodal.parseMeta(mjpeg)
    val out = Mp4FrameDecoder.decodeBatch(Seq((meta, mjpeg))).head
    val stub = StubFeatureDecoder.decodeBatch(Seq((meta, mjpeg))).head
    assert(out.toList != stub.toList, "MJPEG samples must take the real path")
    // frame-count feature = n/1000 (FramePool layout)
    assert(math.abs(out(0) - SyntheticMedia.mjpegMp4FrameCount(5L) / 1000f) < 1e-6)
    // an MP4 with no sample table (m6's metadata-only container — the
    // H.264 stand-in: nothing the JDK can decode) falls back to the stub
    val bare = SyntheticMedia.videoBytes(2L)
    val bmeta = Multimodal.parseMeta(bare)
    val bout = Mp4FrameDecoder.decodeBatch(Seq((bmeta, bare))).head
    assert(bout.toList ==
      StubFeatureDecoder.decodeBatch(Seq((bmeta, bare))).head.toList)
  }

  test("a malformed MP4 sample table bails instead of throwing") {
    val bytes = SyntheticMedia.mjpegMp4Bytes(3L)
    // corrupt stco's entry count (top byte → ~2^30 chunks): the declared
    // table now escapes the box, which must read as "no offsets", not OOB
    val idx = {
      // locate 'stco' fourcc
      val pat = "stco".getBytes("US-ASCII")
      (0 until bytes.length - 4).find(i => pat.indices.forall(j => bytes(i + j) == pat(j))).get
    }
    val corrupted = bytes.clone()
    corrupted(idx + 8) = 0x7f.toByte
    val samples = Multimodal.mp4VideoSamples(corrupted)
    assert(samples.isEmpty, s"expected bail, got ${samples.length} samples")
  }

  test("container sniffing and header parsing (PNG/JPEG/WAV) without codec libs") {
    val png = Multimodal.parseMeta(pngBytes(640, 480))
    assert(png == MediaMeta("image/png", 640, 480, 0L, 0, 0))

    val jpg = Multimodal.parseMeta(jpegBytes(1920, 1080))
    assert(jpg == MediaMeta("image/jpeg", 1920, 1080, 0L, 0, 0))

    val wav = Multimodal.parseMeta(wavBytes(16000, 1, 32000))
    assert(wav.mediaType == "audio/wav" && wav.channels == 1 &&
      wav.sampleRate == 16000 && wav.durationMs == 1000L)

    assert(Multimodal.parseMeta("not media".getBytes).mediaType == "unknown")
  }

  test("real PNG decode via javax.imageio: fixture pixels → non-stub features") {
    val s = spark
    import s.implicits._
    // a genuine 4×4 PNG (left half red, right half blue) checked into
    // test resources — decoded by the JDK's own PNG reader, no stub
    val in = getClass.getResourceAsStream("/fixture.png")
    val bytes = in.readAllBytes(); in.close()
    assert(Multimodal.parseMeta(bytes) == MediaMeta("image/png", 4, 4, 0L, 0, 0))

    val ds = s.createDataset(Seq(MediaRecord(1L, Multimodal.parseMeta(bytes), bytes)))
    val Array(f) = Multimodal.extractFeatures(ds, ImageIoFeatureDecoder).collect()
    val feats = f.features
    assert(feats.length == ImageIoFeatureDecoder.Dim)
    assert(math.abs(feats(0) - 4f / 4096f) < 1e-6)  // width
    assert(math.abs(feats(1) - 4f / 4096f) < 1e-6)  // height
    assert(math.abs(feats(2) - 1f) < 1e-6)          // aspect
    assert(math.abs(feats(3) - 0.5f) < 1e-3)        // mean R: half the pixels are pure red
    assert(math.abs(feats(4)) < 1e-3)               // mean G: none
    assert(math.abs(feats(5) - 0.5f) < 1e-3)        // mean B: half pure blue
    assert(feats(7) > 0f)                           // two-tone image has luma variance
    // and it is NOT the stub's hash vector
    val stub = StubFeatureDecoder.decodeBatch(Seq((f1Meta(bytes), bytes))).head
    assert(feats.toList != stub.toList)
  }

  private def f1Meta(bytes: Array[Byte]) = Multimodal.parseMeta(bytes)

  /** A genuine WAV file produced by the JDK's own encoder (16-bit mono
    * PCM sine), so the decode test exercises the real reader round-trip,
    * not a hand-rolled header. */
  private def sineWav(sampleRate: Int, seconds: Double, amp: Double,
                      freq: Double): Array[Byte] = {
    val n = (sampleRate * seconds).toInt
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (amp * math.sin(2 * math.Pi * freq * i / sampleRate) * 32767).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real WAV decode via javax.sound.sampled: sine fixture → physical features") {
    val s = spark
    import s.implicits._
    val bytes = sineWav(8000, 0.25, 0.5, 440)
    val meta = Multimodal.parseMeta(bytes)
    assert(meta.mediaType == "audio/wav" && meta.channels == 1 && meta.sampleRate == 8000)

    val ds = s.createDataset(Seq(MediaRecord(1L, meta, bytes)))
    val Array(f) = Multimodal.extractFeatures(ds, WavFeatureDecoder).collect()
    val feats = f.features
    assert(feats.length == WavFeatureDecoder.Dim)
    assert(math.abs(feats(1) - 1f / 8f) < 1e-6)        // channels
    assert(math.abs(feats(2) - 8000f / 48000f) < 1e-6) // sample rate
    assert(math.abs(feats(3) - (0.5 / math.sqrt(2)).toFloat) < 0.01) // RMS of a 0.5-amp sine
    assert(math.abs(feats(4) - 0.5f) < 0.01)           // peak
    assert(feats(5) > 0.08f && feats(5) < 0.15f)       // zcr ≈ 2·440/8000 = 0.11
    assert(math.abs(feats(6)) < 0.01)                  // sine mean ≈ 0
    assert(feats.toList != StubFeatureDecoder.decodeBatch(Seq((meta, bytes))).head.toList)
  }

  test("JdkFeatureDecoder routes each record of a mixed batch to its codec") {
    val in = getClass.getResourceAsStream("/fixture.png")
    val png = in.readAllBytes(); in.close()
    val wav = sineWav(8000, 0.1, 0.3, 200)
    val avi = aviBytes(8, 8, 40000, Seq(jpegOf(8, 8, 0xffffff)))
    val junk = "definitely not media".getBytes
    val batch = Seq(png, wav, avi, junk).map(b => (Multimodal.parseMeta(b), b))
    val out = JdkFeatureDecoder.decodeBatch(batch)
    assert(out(0).toList == ImageIoFeatureDecoder.decodeBatch(Seq(batch(0))).head.toList)
    assert(out(1).toList == WavFeatureDecoder.decodeBatch(Seq(batch(1))).head.toList)
    assert(out(2).toList == MjpegAviFrameDecoder.decodeBatch(Seq(batch(2))).head.toList)
    assert(out(3).toList == StubFeatureDecoder.decodeBatch(Seq(batch(3))).head.toList)
  }

  test("undecodable bytes fall back to the stub path") {
    val wav = wavBytes(16000, 1, 320)
    val out = ImageIoFeatureDecoder.decodeBatch(
      Seq((Multimodal.parseMeta(wav), wav)))
    assert(out.head.toList ==
      StubFeatureDecoder.decodeBatch(Seq((Multimodal.parseMeta(wav), wav))).head.toList)
  }

  test("batched mapPartitions decode: real batch shape, stub features, deterministic") {
    val s = spark
    import s.implicits._
    val records = (0L until 100L).map(i =>
      MediaRecord(i, Multimodal.parseMeta(pngBytes(64, 64)), pngBytes(64, 64)))
    val ds = s.createDataset(records).repartition(4)

    val batchSizes = s.sparkContext.collectionAccumulator[Int]("batches")
    val countingDecoder = new FeatureDecoder {
      override def decodeBatch(batch: Seq[(MediaMeta, Array[Byte])]): Seq[Array[Float]] = {
        batchSizes.add(batch.size)
        StubFeatureDecoder.decodeBatch(batch)
      }
    }
    val feats = Multimodal.extractFeatures(ds, countingDecoder, batchSize = 16).collect()

    assert(feats.length == 100)
    assert(feats.forall(_.mediaType == "image/png"))
    assert(feats.forall(_.features.length == StubFeatureDecoder.Dim))
    // identical bytes → identical stub features (deterministic)
    assert(feats.map(_.features.toList).distinct.size == 1)
    // batches respect the requested size and cover all rows
    val sizes = batchSizes.value
    import scala.jdk.CollectionConverters._
    assert(sizes.asScala.sum == 100)
    assert(sizes.asScala.forall(_ <= 16))
  }
}
