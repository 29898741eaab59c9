package graft.kafka

import java.nio.ByteBuffer
import java.util.zip.CRC32C

/** The v2 RecordBatch format (KIP-98, message format "magic 2" — what
  * every Kafka client since 0.11 actually ships), implemented from the
  * public protocol guide:
  *
  *  - batch header: baseOffset(8) batchLength(4) partitionLeaderEpoch(4)
  *    magic(1)=2 crc(4, CRC32C over attributes..end) attributes(2)
  *    lastOffsetDelta(4) baseTimestamp(8) maxTimestamp(8) producerId(8)
  *    producerEpoch(2) baseSequence(4) recordCount(4);
  *  - records (the region after recordCount), compressed AS A WHOLE by
  *    the attribute codec bits (none/gzip/snappy/lz4 here — snappy and
  *    lz4 via the from-spec [[BlockCodecs]]; zstd rejected loudly);
  *  - each record: length(varint) attributes(1) timestampDelta(varlong)
  *    offsetDelta(varint) key(varint length + bytes, −1 null)
  *    value(varint length + bytes) headers(varint count, k/v varint
  *    lengths) — all varints ZIGZAG-encoded per the protocol's varint
  *    rule;
  *  - control batches (attributes bit 5: transaction markers) carry no
  *    user records and are skipped, per the consumer contract.
  *
  * Both directions live here so the fixture interop can hold encode to
  * independent Python bytes; [[Wire.decodeMessageSet]] dispatches to
  * [[decode]] when an entry's magic byte (position 16 in both the v0/v1
  * and v2 layouts) reads 2, so a log buffer may interleave old message
  * sets and new record batches exactly as a real broker log does. */
private[kafka] object RecordBatchV2 {

  import Wire.WireRecord

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // ---- zigzag varints (protocol "varint"/"varlong") ---------------------

  private[kafka] def writeVarLong(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var u = (v << 1) ^ (v >> 63) // zigzag
    while ((u & ~0x7fL) != 0) { out.write(((u & 0x7f) | 0x80).toInt); u >>>= 7 }
    out.write(u.toInt)
  }

  private[kafka] def readVarLong(bb: ByteBuffer): Long = {
    var u = 0L; var shift = 0
    var more = true
    while (more) {
      if (!bb.hasRemaining) fail("v2: truncated varint")
      val b = bb.get() & 0xff
      u |= (b & 0x7fL) << shift; shift += 7
      more = (b & 0x80) != 0
      if (shift > 70) fail("v2: varint too long")
    }
    (u >>> 1) ^ -(u & 1) // un-zigzag
  }

  private def readVarInt(bb: ByteBuffer): Int = {
    val v = readVarLong(bb)
    if (v < Int.MinValue || v > Int.MaxValue) fail(s"v2: varint $v out of int range")
    v.toInt
  }

  // ---- decode ------------------------------------------------------------

  /** Decode ONE record batch starting at `bb`'s position (which must
    * point at baseOffset); advances the buffer past the batch. Returns
    * the user records (empty for control batches). */
  def decode(bb: ByteBuffer): Seq[WireRecord] = {
    if (bb.remaining() < 61) fail(s"v2: ${bb.remaining()} bytes below the batch header floor")
    val baseOffset = bb.getLong()
    val batchLength = bb.getInt()
    // header after the length field is 49 bytes up to recordCount
    if (batchLength < 49 || batchLength > bb.remaining())
      fail(s"v2: batch length $batchLength vs ${bb.remaining()} remaining")
    val start = bb.position() // partitionLeaderEpoch position
    bb.getInt() // partitionLeaderEpoch (not CRC-covered)
    val magic = bb.get()
    if (magic != 2) fail(s"v2: magic $magic in a record batch")
    val storedCrc = bb.getInt()
    val crcStart = bb.position() // attributes onward
    val crcLen = batchLength - (crcStart - start)
    if (crcLen < 0 || crcLen > bb.remaining()) fail("v2: truncated batch body")
    val crc = new CRC32C
    crc.update(bb.duplicate().limit(crcStart + crcLen).position(crcStart)
      .asInstanceOf[ByteBuffer])
    if (crc.getValue.toInt != storedCrc)
      fail(s"v2: CRC32C mismatch (wire $storedCrc, computed ${crc.getValue.toInt})")
    val attributes = bb.getShort()
    bb.getInt() // lastOffsetDelta
    val baseTimestamp = bb.getLong()
    bb.getLong() // maxTimestamp
    bb.getLong() // producerId
    bb.getShort() // producerEpoch
    bb.getInt() // baseSequence
    val recordCount = bb.getInt()
    if (recordCount < 0) fail(s"v2: negative record count $recordCount")
    val recordsLen = batchLength - (bb.position() - start)
    if (recordsLen < 0 || recordsLen > bb.remaining()) fail("v2: truncated records")
    val raw = new Array[Byte](recordsLen)
    bb.get(raw)
    val isControl = (attributes & 0x20) != 0
    if (isControl) return Seq.empty // transaction markers: no user records
    val plain = (attributes & 0x07) match {
      case 0 => raw
      case 1 =>
        try Wire.gunzipForV2(raw)
        catch { case e: IllegalArgumentException => fail(s"v2: ${e.getMessage}") }
      case 2 => BlockCodecs.snappyDecompress(raw, Wire.MaxFrame)
      case 3 => BlockCodecs.lz4FrameDecompress(raw, Wire.MaxFrame)
      case 4 => // zstd (KIP-110), from-spec RFC 8878 decoder
        try Zstd.decompress(raw, Wire.MaxFrame)
        catch { case e: IllegalArgumentException => fail(s"v2: ${e.getMessage}") }
      case c => fail(s"v2: unknown codec $c")
    }
    val rb = ByteBuffer.wrap(plain)
    val out = Seq.newBuilder[WireRecord]
    var i = 0
    while (i < recordCount) {
      val len = readVarInt(rb)
      if (len < 1 || len > rb.remaining()) fail(s"v2: record length $len")
      val end = rb.position() + len
      rb.get() // record attributes (unused)
      val tsDelta = readVarLong(rb)
      val offDelta = readVarInt(rb)
      val key = readBytes(rb)
      val value = readBytes(rb)
      val nHeaders = readVarInt(rb)
      if (nHeaders < 0) fail("v2: negative header count")
      var h = 0
      while (h < nHeaders) { // headers parsed (and validated) but not kept
        val kl = readVarInt(rb)
        if (kl < 0 || kl > rb.remaining()) fail("v2: header key length")
        rb.position(rb.position() + kl)
        val vl = readVarInt(rb)
        if (vl > rb.remaining()) fail("v2: header value length")
        if (vl > 0) rb.position(rb.position() + vl)
        h += 1
      }
      if (rb.position() != end)
        fail(s"v2: record consumed ${rb.position()} of declared end $end")
      out += WireRecord(baseOffset + offDelta, baseTimestamp + tsDelta, key, value)
      i += 1
    }
    if (rb.hasRemaining) fail(s"v2: ${rb.remaining()} bytes after the last record")
    out.result()
  }

  private def readBytes(rb: ByteBuffer): Array[Byte] = {
    val n = readVarInt(rb)
    if (n < -1) fail(s"v2: bytes length $n (only -1 encodes null)")
    else if (n == -1) null
    else {
      if (n > rb.remaining()) fail(s"v2: bytes length $n exceeds ${rb.remaining()}")
      val a = new Array[Byte](n); rb.get(a); a
    }
  }

  // ---- encode ------------------------------------------------------------

  /** Encode records as ONE v2 batch (producer shape: baseOffset 0 or the
    * caller's log base, offsets dense from it). `codec`: 0 none, 1 gzip,
    * 2 snappy, 3 lz4. */
  def encode(records: Seq[WireRecord], codec: Int = 0,
             baseOffset: Long = 0L): Array[Byte] = {
    require(records.nonEmpty, "v2 batch needs at least one record")
    require(codec >= 0 && codec <= 4, s"v2 codec $codec not encodable")
    val baseTs = records.map(_.timestamp).min
    val recBuf = new java.io.ByteArrayOutputStream(256)
    records.zipWithIndex.foreach { case (r, i) =>
      val body = new java.io.ByteArrayOutputStream(64)
      body.write(0) // record attributes
      writeVarLong(body, r.timestamp - baseTs)
      writeVarLong(body, i.toLong)
      if (r.key == null) writeVarLong(body, -1L)
      else { writeVarLong(body, r.key.length.toLong); body.write(r.key, 0, r.key.length) }
      if (r.value == null) writeVarLong(body, -1L)
      else { writeVarLong(body, r.value.length.toLong); body.write(r.value, 0, r.value.length) }
      writeVarLong(body, 0L) // headers
      val b = body.toByteArray
      writeVarLong(recBuf, b.length.toLong)
      recBuf.write(b, 0, b.length)
    }
    val recs = codec match {
      case 0 => recBuf.toByteArray
      case 1 => Wire.gzipForV2(recBuf.toByteArray)
      case 2 => BlockCodecs.snappyCompress(recBuf.toByteArray)
      case 3 => BlockCodecs.lz4FrameCompress(recBuf.toByteArray)
      case _ => Zstd.compress(recBuf.toByteArray) // real LZ77 + FSE frame
    }
    // body from attributes to end (CRC-covered)
    val covered = ByteBuffer.allocate(2 + 4 + 8 + 8 + 8 + 2 + 4 + 4 + recs.length)
    covered.putShort(codec.toShort) // attributes: codec bits, CreateTime
    covered.putInt(records.size - 1) // lastOffsetDelta
    covered.putLong(baseTs)
    covered.putLong(records.map(_.timestamp).max)
    covered.putLong(-1L) // producerId (non-transactional)
    covered.putShort(-1) // producerEpoch
    covered.putInt(-1) // baseSequence
    covered.putInt(records.size)
    covered.put(recs)
    val cov = covered.array()
    val crc = new CRC32C
    crc.update(cov, 0, cov.length)
    val batchLength = 4 + 1 + 4 + cov.length // epoch + magic + crc + covered
    val out = ByteBuffer.allocate(8 + 4 + batchLength)
    out.putLong(baseOffset)
    out.putInt(batchLength)
    out.putInt(-1) // partitionLeaderEpoch
    out.put(2.toByte)
    out.putInt(crc.getValue.toInt)
    out.put(cov)
    out.array()
  }
}
