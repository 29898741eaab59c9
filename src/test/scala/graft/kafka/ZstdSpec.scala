package graft.kafka

import org.scalatest.funsuite.AnyFunSuite

/** The from-spec zstd decoder against the REFERENCE implementation:
  * `src/test/resources/zstd_fixtures.txt` frames are produced by the
  * upstream `zstd` CLI (see `scripts/zstd_fixture_gen.py`) over
  * deterministic payloads at levels 1/3/19 plus no-checksum and
  * long-window variants — raw/RLE/compressed blocks, 1- and 4-stream
  * Huffman literals, direct and FSE-compressed tree descriptions,
  * treeless repeats, predefined/RLE/FSE/repeat sequence tables,
  * repeated offsets, multi-block frames, content checksums. Decoding
  * the defining implementation's bytes byte-exactly is the cross-check;
  * hardening (truncation/mutation/caps) rides below. */
class ZstdSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    if (s.isEmpty) Array.empty
    else s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private lazy val (payloads, frames): (Map[String, Array[Byte]],
      Seq[(String, String, Array[Byte])]) = {
    val in = getClass.getResourceAsStream("/zstd_fixtures.txt")
    assert(in != null, "zstd_fixtures.txt missing — run scripts/zstd_fixture_gen.py")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val p = Map.newBuilder[String, Array[Byte]]
      val f = Seq.newBuilder[(String, String, Array[Byte])]
      src.getLines().foreach { l =>
        val t = l.trim.split(" ")
        t(0) match {
          case "P" => p += (t(1) -> (if (t.length > 2) hex(t(2)) else Array.empty[Byte]))
          case "F" => f += ((t(1), t(2), hex(t(3))))
          case _ => () // comment line
        }
      }
      (p.result(), f.result())
    } finally src.close()
  }

  private val Cap = 4 << 20

  test("every reference-CLI frame decodes byte-exactly") {
    assert(frames.size >= 30, s"only ${frames.size} fixtures")
    frames.foreach { case (name, level, frame) =>
      val want = payloads(name)
      val got = Zstd.decompress(frame, Cap)
      assert(java.util.Arrays.equals(got, want),
        s"$name@$level: ${got.length} bytes vs ${want.length} expected")
    }
  }

  test("the raw-frame compressor round-trips and is structurally a zstd frame") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(0, 1, 255, 256, 65791, 65792, 70000, 200001)) {
      val data = new Array[Byte](n); rnd.nextBytes(data)
      val frame = Zstd.compressRaw(data)
      assert((frame(0) & 0xff) == 0x28 && (frame(1) & 0xff) == 0xb5 &&
        (frame(2) & 0xff) == 0x2f && (frame(3) & 0xff) == 0xfd, "magic")
      assert(java.util.Arrays.equals(Zstd.decompress(frame, Cap), data), s"n=$n")
    }
  }

  test("the real compressor round-trips and actually compresses") {
    val rnd = new scala.util.Random(77)
    val text = ("the quick brown fox jumps over the lazy dog; " * 500).getBytes
    val runs = Array.fill(100000)('A'.toByte)
    val periodic = Array.tabulate(150000)(i => (i % 251).toByte)
    val random = { val a = new Array[Byte](80000); rnd.nextBytes(a); a }
    val tiny = "abc".getBytes
    val crossBlock = { // a 130 KiB payload whose tail repeats its head:
      // matches reach across the 128 KiB block boundary, within the frame
      val a = new Array[Byte](133000)
      rnd.nextBytes(a)
      System.arraycopy(a, 0, a, 129000, 4000)
      a
    }
    val cases = Seq("text" -> text, "runs" -> runs, "periodic" -> periodic,
      "random" -> random, "tiny" -> tiny, "empty" -> Array.empty[Byte],
      "crossBlock" -> crossBlock) ++
      payloads.toSeq.map { case (k, v) => s"fixture:$k" -> v }
    cases.foreach { case (name, data) =>
      val frame = Zstd.compress(data)
      assert(java.util.Arrays.equals(Zstd.decompress(frame, Cap), data),
        s"$name: round-trip")
    }
    // the point of the exercise: repetitive payloads SHRINK
    assert(Zstd.compress(text).length < text.length / 5, "text ratio")
    assert(Zstd.compress(runs).length < 200, "run ratio")
    assert(Zstd.compress(periodic).length < periodic.length / 10, "periodic ratio")
    // and incompressible ones fall back to RAW blocks (bounded overhead)
    assert(Zstd.compress(random).length <= random.length + 32, "raw fallback")
  }

  test("mutations of OUR OWN compressed frames die cleanly or decode (never crash)") {
    // the CLI fixtures exercise upstream's encoder choices; our frames
    // exercise the direct-weight Huffman + predefined-sequence shapes —
    // mutate those too so the decoder's walls cover both producers
    val payload = ("quality data for the training corpus; " * 200).getBytes
    val frame = Zstd.compress(payload)
    var decoded = 0
    for (i <- 4 until frame.length; bit <- Seq(0x01, 0x80)) {
      val m = frame.clone()
      m(i) = (m(i) ^ bit).toByte
      try { Zstd.decompress(m, Cap); decoded += 1 }
      catch { case _: IllegalArgumentException => () } // the clean wall
    }
    // the checksum catches nearly everything; a mutation may still land
    // on another VALID frame of different content — crashing is the
    // only forbidden outcome
    assert(decoded < frame.length / 4, s"$decoded mutations decoded")
  }

  test("concatenated frames and skippable frames decode in sequence") {
    val a = Zstd.compressRaw("first|".getBytes)
    val b = Zstd.compressRaw("second".getBytes)
    val skip = Array[Byte](0x52, 0x2a, 0x4d, 0x18, 3, 0, 0, 0, 9, 9, 9)
    val got = Zstd.decompress(a ++ skip ++ b, Cap)
    assert(new String(got) == "first|second")
  }

  test("every truncation of a compressed frame fails cleanly") {
    val frame = frames.find(f => f._1 == "text_5k" && f._2 == "3").get._3
    for (cut <- 0 until frame.length) {
      val t = java.util.Arrays.copyOf(frame, cut)
      try {
        Zstd.decompress(t, Cap) // rarely a prefix is self-consistent? no:
        fail(s"truncation at $cut decoded")
      } catch { case _: IllegalArgumentException => () }
    }
  }

  test("single-byte mutations die cleanly or decode (never crash, never over-allocate)") {
    val frame = frames.find(f => f._1 == "text_200" && f._2 == "3").get._3
    for (i <- frame.indices; bit <- Seq(1, 0x40)) {
      val m = frame.clone(); m(i) = (m(i) ^ bit).toByte
      try { Zstd.decompress(m, Cap); () }
      catch { case _: IllegalArgumentException => () }
      // anything else (OOM, AIOOBE, negative-size) fails the test by throwing
    }
  }

  test("declared sizes beyond the cap are refused before allocation") {
    val big = frames.find(f => f._1 == "text_100k" && f._2 == "3").get._3
    val e = intercept[IllegalArgumentException](Zstd.decompress(big, 1000))
    assert(e.getMessage.contains("cap"), e.getMessage)
  }

  test("dictionaries, bad magic, and reserved blocks are refused loudly") {
    // dictionary id present
    val d = hex("28b52ffd") ++ Array[Byte](0x01, 0x58, 0x2a) ++ Array[Byte](1, 0, 0)
    val e1 = intercept[IllegalArgumentException](Zstd.decompress(d, Cap))
    assert(e1.getMessage.contains("dictionary"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Zstd.decompress(hex("00112233445566"), Cap))
    assert(e2.getMessage.contains("magic"), e2.getMessage)
    // reserved block type (bits 1-2 = 3)
    val r = Zstd.compressRaw(Array[Byte](1, 2, 3))
    // block header starts after magic(4) + FHD(1) + FCS(1) for n<256
    r(6) = (r(6) | 0x06).toByte
    val e3 = intercept[IllegalArgumentException](Zstd.decompress(r, Cap))
    assert(e3.getMessage.contains("reserved block"), e3.getMessage)
  }

  /** A hand-built minimal compressed frame (single-segment, no
    * checksum, declared content 4): one raw literal 'X', then one
    * sequence via RLE sequence tables (LL sym 1 → litLen 1, ML sym 0 →
    * matchLen 3, OF sym `ofSym`) with backward bitstream `bits`. */
  private def oneSeqFrame(ofSym: Int, bits: Int): Array[Byte] =
    hex("28b52ffd2004") ++ // magic, FHD single-segment, FCS = 4
      hex("450000") ++     // block header: last, compressed, size 8
      hex("0858") ++       // literals: raw, 1 byte, 'X'
      Array[Byte](0x01, 0x54, 0x01, ofSym.toByte, 0x00, bits.toByte)

  test("match offsets are bounded to the current frame, not prior frames") {
    // OF code 0 → Offset_Value 1 → rep1 = 1: well-formed, decodes alone
    assert(new String(Zstd.decompress(oneSeqFrame(0, 0x01), Cap)) == "XXXX")
    // OF code 4 (+4 zero bits) → Offset_Value 16 → offset 13: reaches
    // past this frame's 1 produced byte, into the PREVIOUS frame's
    // output when one is prepended — spec-invalid either way (RFC 8878
    // scopes the match window to the frame)
    val cross = oneSeqFrame(4, 0x10)
    val e1 = intercept[IllegalArgumentException](Zstd.decompress(cross, Cap))
    assert(e1.getMessage.contains("offset"), e1.getMessage)
    val prior = Zstd.compressRaw("thirteen-plus bytes of prior frame".getBytes)
    val e2 = intercept[IllegalArgumentException](Zstd.decompress(prior ++ cross, Cap))
    assert(e2.getMessage.contains("offset"), e2.getMessage)
  }

  test("RLE blocks obey the 128 KiB block-size ceiling") {
    def rleFrame(regen: Int): Array[Byte] = {
      val h = (regen << 3) | (1 << 1) | 1
      hex("28b52ffda0") ++
        Array[Byte](
          (regen & 0xff).toByte, ((regen >> 8) & 0xff).toByte,
          ((regen >> 16) & 0xff).toByte, ((regen >> 24) & 0xff).toByte) ++
        Array[Byte]((h & 0xff).toByte, ((h >> 8) & 0xff).toByte,
          ((h >> 16) & 0xff).toByte, 0x41)
    }
    val max = Zstd.decompress(rleFrame(128 * 1024), Cap)
    assert(max.length == 128 * 1024 && max.forall(_ == 'A'.toByte))
    val e = intercept[IllegalArgumentException](
      Zstd.decompress(rleFrame(128 * 1024 + 1), Cap))
    assert(e.getMessage.contains("RLE"), e.getMessage)
  }

  test("content checksum mismatches are detected") {
    val frame = Zstd.compressRaw("checksummed payload".getBytes)
    frame(frame.length - 1) = (frame(frame.length - 1) ^ 1).toByte
    val e = intercept[IllegalArgumentException](Zstd.decompress(frame, Cap))
    assert(e.getMessage.contains("checksum"), e.getMessage)
  }

  test("xxh64 matches the published test vectors") {
    // the xxHash reference vectors (seed 0 and a nonzero seed)
    def h(s: String, seed: Long): Long =
      Zstd.xxh64(s.getBytes("UTF-8"), 0, s.getBytes("UTF-8").length, seed)
    assert(h("", 0L) == 0xEF46DB3751D8E999L)
    assert(h("a", 0L) == 0xD24EC4F1A98C6E5BL)
    assert(h("abc", 0L) == 0x44BC2CF5AD770999L)
    assert(h("abc", 1L) == 0xBEA9CA8199328908L)
  }

  test("a zstd v2 record batch goes through decode end-to-end") {
    import Wire.WireRecord
    val recs = Seq(
      WireRecord(0L, 1000L, "k1".getBytes, ("v" * 500).getBytes),
      WireRecord(1L, 1001L, null, "v2".getBytes))
    val batch = RecordBatchV2.encode(recs, codec = 4)
    val got = Wire.decodeMessageSet(batch, allowTruncatedTail = false)
    assert(got.map(r => new String(r.value)) == Seq("v" * 500, "v2"))
    assert(got(1).key == null)
  }

  test("a zstd v2 batch round-trips through a real broker socket") {
    import Wire.WireRecord
    val broker = new MiniBroker(numPartitions = 1)
    try {
      val batch = RecordBatchV2.encode(Seq(
        WireRecord(0L, 7000L, "zk".getBytes, "zv".getBytes),
        WireRecord(1L, 7001L, "zk2".getBytes, ("z" * 300).getBytes)), codec = 4)
      // produce the raw v2 batch bytes as the partition payload (the
      // modern producer's record format arriving at the v0-era api)
      val sock = new java.net.Socket("localhost", broker.port)
      sock.setTcpNoDelay(true)
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      val in = new java.io.DataInputStream(sock.getInputStream)
      val body = new Wire.Buf
      body.int16(1); body.int32(10000)
      body.int32(1).string("zt")
      body.int32(1).int32(0)
      body.bytes(batch)
      val payload = new Wire.Buf
      payload.int16(Wire.ApiProduce); payload.int16(0); payload.int32(1)
      payload.string("graft"); payload.raw(body.toArray)
      Wire.writeFrame(out, payload.toArray)
      val resp = Wire.readFrame(in).get
      val r = new Wire.Reader(java.nio.ByteBuffer.wrap(resp))
      r.int32() // correlation id
      r.int32(); r.string(); r.int32(); r.int32()
      assert(r.int16() == Wire.ErrNone, "produce error")
      sock.close()
      val client = new MiniKafkaClient("localhost", broker.port)
      try {
        val got = client.fetch("zt", 0, 0L)
        assert(got.map(_.timestamp) == Seq(7000L, 7001L))
        assert(new String(got(1).value) == "z" * 300)
      } finally client.close()
    } finally broker.close()
  }
}
