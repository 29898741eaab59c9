package graft.kafka

import org.scalatest.funsuite.AnyFunSuite

/** Round-15 wire-layer hardening pins:
  *
  *  - integer-overflow-safe bounds checks in [[BlockCodecs]]: crafted
  *    4-byte lengths near Int.MaxValue must die as clean parse errors,
  *    never as ArrayIndexOutOfBoundsException (which MiniBroker's
  *    produce path used not to translate into ErrCorruptMessage);
  *  - [[Wire.decodeMessageSet]] honors `allowTruncatedTail` for a
  *    trailing v2 RecordBatch — real brokers cut fetch responses at
  *    max_bytes mid-batch, so the fetch path must tolerate it exactly
  *    like the v0/v1 truncated-tail branch, while the produce path
  *    still rejects it as corruption;
  *  - v2 key/value varint lengths: only −1 encodes null; −2 and below
  *    are malformed, not silently null.
  */
class CodecHardeningR15Spec extends AnyFunSuite {

  private def iae(body: => Any): IllegalArgumentException =
    intercept[IllegalArgumentException](body)

  test("snappy literal with a 4-byte length near Int.MaxValue is a clean parse error") {
    // ulen 10; 1-byte literal 'a' (so o = 1 and o + len wraps);
    // then tag 0xfc = literal with 4 extra LE length bytes, v = 0x7ffffffe
    // -> len = 0x7fffffff; p + len and o + len both wrap negative
    val in = Array[Byte](0x0a, 0x00, 'a', 0xfc.toByte,
      0xfe.toByte, 0xff.toByte, 0xff.toByte, 0x7f)
    val e = iae(BlockCodecs.snappyRawDecompress(in, 1 << 20))
    assert(e.getMessage.contains("overruns"), e.getMessage)
  }

  test("lz4 literal length accumulated near Int.MaxValue is a clean parse error") {
    // token 0xf0: literal nibble 15, then 255-continuations summing the
    // literal length to ~0x7fff0000 — p + litLen wraps negative
    val target = 0x7fff0000
    val k = (target - 15) / 255
    val rem = (target - 15) % 255
    val in = new Array[Byte](1 + k + 1)
    in(0) = 0xf0.toByte
    java.util.Arrays.fill(in, 1, 1 + k, 0xff.toByte)
    in(1 + k) = rem.toByte
    val e = iae(BlockCodecs.lz4BlockDecompress(in, 0, in.length, 1 << 20))
    assert(e.getMessage.contains("literals overrun"), e.getMessage)
  }

  test("lz4 match length whose +4 wraps negative is rejected, not silently empty") {
    // 1-byte literal 'a', match offset 1, match-length nibble 15 with
    // continuations summing extLen to 0x7ffffffc so matchLen = +4 wraps
    val target = 0x7ffffffcL
    val k = ((target - 15) / 255).toInt
    val rem = ((target - 15) % 255).toInt
    val out = new java.io.ByteArrayOutputStream(k + 16)
    out.write(0x1f) // token: 1 literal, match nibble 15
    out.write('a')
    out.write(1); out.write(0) // match offset 1 (LE)
    for (_ <- 0 until k) out.write(255)
    out.write(rem)
    val in = out.toByteArray
    val e = iae(BlockCodecs.lz4BlockDecompress(in, 0, in.length, 1 << 20))
    assert(e.getMessage.contains("match length overflow"), e.getMessage)
  }

  test("a truncated trailing v2 batch is tolerated on the fetch path, rejected on produce") {
    import Wire.WireRecord
    val recs = Seq(
      WireRecord(0L, 1000L, "k1".getBytes, "v1".getBytes),
      WireRecord(1L, 1001L, "k2".getBytes, "v2".getBytes))
    val full = RecordBatchV2.encode(recs, codec = 0)
    for (cut <- Seq(17, 40, 60, full.length - 1)) { // header floor to one-short
      val buf = full ++ java.util.Arrays.copyOf(full, cut)
      val got = Wire.decodeMessageSet(buf, allowTruncatedTail = true)
      assert(got.map(r => new String(r.value)) == Seq("v1", "v2"),
        s"cut=$cut: full batch must still decode before the truncated tail")
      val e = iae(Wire.decodeMessageSet(buf, allowTruncatedTail = false))
      assert(e.getMessage.contains("truncated"), s"cut=$cut: ${e.getMessage}")
    }
  }

  test("v2 record key length -2 is malformed, not null") {
    // hand-build a batch whose single record declares key length -2
    // (zigzag varint 3); CRC32C is recomputed so only the varint is wrong
    val body = new java.io.ByteArrayOutputStream()
    body.write(0) // record attributes
    RecordBatchV2.writeVarLong(body, 0L) // tsDelta
    RecordBatchV2.writeVarLong(body, 0L) // offsetDelta
    RecordBatchV2.writeVarLong(body, -2L) // key length: RESERVED, only -1 is null
    RecordBatchV2.writeVarLong(body, 1L); body.write('v') // value
    RecordBatchV2.writeVarLong(body, 0L) // headers
    val rec = body.toByteArray
    val recBuf = new java.io.ByteArrayOutputStream()
    RecordBatchV2.writeVarLong(recBuf, rec.length.toLong)
    recBuf.write(rec, 0, rec.length)
    val recsRaw = recBuf.toByteArray
    val covered = java.nio.ByteBuffer.allocate(40 + recsRaw.length)
    covered.putShort(0); covered.putInt(0) // attributes, lastOffsetDelta
    covered.putLong(0L); covered.putLong(0L) // base/max timestamp
    covered.putLong(-1L); covered.putShort(-1); covered.putInt(-1)
    covered.putInt(1) // recordCount
    covered.put(recsRaw)
    val cov = covered.array()
    val crc = new java.util.zip.CRC32C
    crc.update(cov, 0, cov.length)
    val out = java.nio.ByteBuffer.allocate(12 + 9 + cov.length)
    out.putLong(0L); out.putInt(9 + cov.length)
    out.putInt(-1); out.put(2.toByte); out.putInt(crc.getValue.toInt)
    out.put(cov)
    val e = iae(Wire.decodeMessageSet(out.array(), allowTruncatedTail = false))
    assert(e.getMessage.contains("only -1 encodes null"), e.getMessage)
  }
}
