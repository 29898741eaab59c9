package graft.kafka

import java.io.{DataInputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

/** Kafka wire-protocol codec — the byte-level subset both [[MiniBroker]]
  * and [[MiniKafkaClient]] speak, implemented from the PUBLIC protocol
  * guide (kafka.apache.org/protocol): big-endian primitives, INT16-length
  * STRING / INT32-length BYTES (−1 = null), INT32-count arrays; request
  * envelope = INT32 size ++ (api_key INT16, api_version INT16,
  * correlation_id INT32, client_id STRING) ++ body; response envelope =
  * INT32 size ++ correlation_id INT32 ++ body.
  *
  * Messages travel as MessageSet v1 entries (offset INT64, size INT32,
  * then CRC32 INT32 over the remainder, magic=1, attributes=0,
  * timestamp INT64, key BYTES, value BYTES) — magic 1 because it is the
  * oldest format carrying a producer-assigned timestamp, which is the
  * engine's event-time contract at the edge (reference
  * `utils/Producer.scala:41-45` assigns event time at produce).
  *
  * The DECODE side additionally accepts what real-world clients send:
  * v2 RecordBatches (magic 2 — every 0.11+ producer; KIP-98 header,
  * CRC32C, zigzag-varint records, whole-batch compression, control
  * batches skipped — see [[RecordBatchV2]], dispatched on the magic
  * byte shared at entry position 16 by both layouts), magic-0 messages
  * (pre-0.10 producers; no timestamp field → ts = −1,
  * the broker up-converts on fetch) and gzip-compressed sets (attribute
  * codec bits = 1: the wrapper's value is a gzip stream of an inner
  * MessageSet; for magic 1 the inner offsets are RELATIVE and the
  * wrapper carries the last inner offset, per KIP-31 — both the
  * producer convention, wrapper = n−1 over relative 0..n−1, and the
  * broker-log convention, wrapper = absolute last, resolve through the
  * same base = wrapper − lastInner formula). Snappy (codec 2, xerial
  * framing or raw block) and LZ4 (codec 3, frame format with
  * KAFKA-3160-tolerant header checksum) decode through the from-spec
  * [[BlockCodecs]]; zstd (codec 4) belongs to record-batch v2 producers
  * and is rejected LOUDLY rather than misread. The encode side stays
  * uncompressed-magic-1 by default ([[encodeMessageSet]]);
  * [[encodeMessageSetGzip]] / [[encodeMessageSetCompressed]] build
  * spec-shaped compressed wrappers for producers that want the on-wire
  * compression.
  *
  * Nothing here is Spark-specific; the DSv2 edge
  * ([[GraftKafkaSourceProvider]]) rides on [[MiniKafkaClient]].
  */
object Wire {

  val ApiProduce: Short = 0
  val ApiFetch: Short = 1
  val ApiListOffsets: Short = 2
  val ApiMetadata: Short = 3
  val ApiVersions: Short = 18

  val ErrNone: Short = 0
  val ErrUnknownTopicOrPartition: Short = 3
  val ErrOffsetOutOfRange: Short = 1
  val ErrCorruptMessage: Short = 2

  /** One record as it crosses the wire (and sits in a broker log). */
  final case class WireRecord(offset: Long, timestamp: Long,
                              key: Array[Byte], value: Array[Byte])

  /** Growable big-endian writer for one frame body. */
  final class Buf {
    private var arr = new Array[Byte](256)
    private var len = 0
    private def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        var cap = arr.length * 2
        while (cap < len + n) cap *= 2
        arr = java.util.Arrays.copyOf(arr, cap)
      }
    def int8(v: Byte): Buf = { ensure(1); arr(len) = v; len += 1; this }
    def int16(v: Short): Buf = {
      ensure(2); arr(len) = (v >> 8).toByte; arr(len + 1) = v.toByte
      len += 2; this
    }
    def int32(v: Int): Buf = {
      ensure(4)
      arr(len) = (v >>> 24).toByte; arr(len + 1) = (v >>> 16).toByte
      arr(len + 2) = (v >>> 8).toByte; arr(len + 3) = v.toByte
      len += 4; this
    }
    def int64(v: Long): Buf = { int32((v >>> 32).toInt); int32(v.toInt) }
    def raw(bytes: Array[Byte]): Buf = {
      ensure(bytes.length)
      System.arraycopy(bytes, 0, arr, len, bytes.length)
      len += bytes.length; this
    }
    /** Protocol STRING: INT16 length, −1 = null. */
    def string(s: String): Buf =
      if (s == null) int16(-1)
      else {
        val b = s.getBytes(StandardCharsets.UTF_8)
        int16(b.length.toShort); raw(b)
      }
    /** Protocol BYTES: INT32 length, −1 = null. */
    def bytes(b: Array[Byte]): Buf =
      if (b == null) int32(-1) else { int32(b.length); raw(b) }
    def size: Int = len
    def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  /** Big-endian reader over one frame body. */
  final class Reader(bb: ByteBuffer) {
    def int8(): Byte = bb.get()
    def int16(): Short = bb.getShort()
    def int32(): Int = bb.getInt()
    def int64(): Long = bb.getLong()
    // length fields are validated against the buffer BEFORE allocating:
    // a malformed frame declaring a 2 GB string must die as a clean
    // parse error, never as an attacker-chosen allocation
    def string(): String = {
      val n = bb.getShort()
      if (n < 0) null
      else {
        require(n <= bb.remaining(),
          s"string length $n exceeds remaining ${bb.remaining()}")
        val b = new Array[Byte](n); bb.get(b)
        new String(b, StandardCharsets.UTF_8)
      }
    }
    def bytes(): Array[Byte] = {
      val n = bb.getInt()
      if (n < 0) null
      else {
        require(n <= bb.remaining(),
          s"bytes length $n exceeds remaining ${bb.remaining()}")
        val b = new Array[Byte](n); bb.get(b); b
      }
    }
    def remaining: Int = bb.remaining()
    def slice(n: Int): Reader = {
      val s = bb.slice(); s.limit(n); bb.position(bb.position() + n)
      new Reader(s)
    }
  }

  // ---- message set v1 --------------------------------------------------

  /** Encode records as a v1 MessageSet. `assignedBase` < 0 means the
    * producer side (offsets written as 0 — the broker assigns); ≥ 0
    * renders broker log offsets for a fetch response. */
  def encodeMessageSet(records: Seq[WireRecord]): Array[Byte] = {
    val out = new Buf
    records.foreach { r =>
      val msg = new Buf
      msg.int8(1) // magic
      msg.int8(0) // attributes: no codec, CreateTime
      msg.int64(r.timestamp)
      msg.bytes(r.key)
      msg.bytes(r.value)
      val body = msg.toArray
      val crc = new CRC32
      crc.update(body)
      out.int64(r.offset)
      out.int32(4 + body.length) // crc + message body
      out.int32(crc.getValue.toInt)
      out.raw(body)
    }
    out.toArray
  }

  /** Decode a MessageSet, CRC-checking every entry. Accepts magic 0 and
    * magic 1 messages and transparently unwraps gzip-compressed wrappers
    * (see the class doc for the relative-offset rules). A trailing
    * truncated entry is legal ONLY on the fetch path (Kafka cuts fetch
    * responses at max_bytes mid-message); callers decoding produce
    * requests must pass `allowTruncatedTail = false` so a half-received
    * set is rejected as corruption instead of half-accepted. */
  def decodeMessageSet(data: Array[Byte],
                       allowTruncatedTail: Boolean = true): Seq[WireRecord] =
    decodeMessageSet(data, allowTruncatedTail, inWrapper = false)

  private def decodeMessageSet(data: Array[Byte], allowTruncatedTail: Boolean,
                               inWrapper: Boolean): Seq[WireRecord] = {
    val bb = ByteBuffer.wrap(data)
    val out = Seq.newBuilder[WireRecord]
    while (bb.remaining() >= 12) {
      // both layouts carry the magic byte 16 bytes into the entry
      // (v0/v1: offset+size+crc+magic; v2: baseOffset+length+epoch+magic)
      // — a modern producer's v2 RecordBatch dispatches to its own codec,
      // so a log buffer may interleave formats like a real broker log
      if (bb.remaining() >= 17 && data(bb.position() + 16) == 2) {
        require(!inWrapper, "v2 record batch inside a compressed v0/v1 wrapper")
        // Kafka cuts fetch responses at max_bytes mid-batch: a trailing
        // v2 batch whose declared length overruns the buffer is a legal
        // truncated tail on the fetch path (mirror of the v0/v1 branch);
        // on the produce path it stays corruption
        val declared = bb.getInt(bb.position() + 8) // batchLength peek
        if (declared.toLong + 12L > bb.remaining()) {
          require(allowTruncatedTail,
            s"truncated v2 record batch: ${declared.toLong + 12} declared, " +
              s"${bb.remaining()} present")
          bb.position(bb.limit())
        } else out ++= RecordBatchV2.decode(bb)
      } else {
      val offset = bb.getLong()
      val size = bb.getInt()
      // magic-0 message floor: crc(4) + magic(1) + attrs(1) + two
      // null-BYTES markers (4+4) — a smaller size is corruption, not a
      // message (and would otherwise read as a negative array length);
      // the v1 floor (+8 for the timestamp) is enforced after magic is
      // known, below
      require(size >= 14, s"message size $size below the v0 minimum at offset $offset")
      if (bb.remaining() < size) { // truncated tail
        require(allowTruncatedTail,
          s"truncated message at offset $offset: $size declared, ${bb.remaining()} present")
        bb.position(bb.limit())
      }
      else {
        val stored = bb.getInt()
        val body = new Array[Byte](size - 4)
        bb.get(body)
        val crc = new CRC32
        crc.update(body)
        require(crc.getValue.toInt == stored,
          s"CRC mismatch at offset $offset: wire ${stored}, computed ${crc.getValue.toInt}")
        out ++= parseMessage(offset, body, inWrapper)
      }
      }
    }
    // a sub-header tail (< 12 bytes) is the same truncation case
    require(allowTruncatedTail || bb.remaining() == 0,
      s"${bb.remaining()} trailing bytes after the last complete message")
    out.result()
  }

  /** One CRC-verified message body → its records: itself when plain, the
    * unwrapped inner set when it is a gzip wrapper. `inWrapper` guards
    * the spec's no-nested-compression rule — without it a crafted chain
    * of wrappers-in-wrappers would recurse once per ~36 payload bytes,
    * deep enough to overflow the stack inside a single legal frame. */
  private def parseMessage(offset: Long, body: Array[Byte],
                           inWrapper: Boolean): Seq[WireRecord] = {
    val r = new Reader(ByteBuffer.wrap(body))
    val magic = r.int8()
    require(magic == 0 || magic == 1,
      s"unsupported message magic $magic (codec speaks v0/v1 message sets)")
    val attrs = r.int8()
    // the v0 10-byte body floor is already guaranteed by decodeMessageSet's
    // size >= 14 check (body = size − 4); only v1's timestamp-bearing
    // larger floor needs enforcing here
    require(magic == 0 || body.length >= 18,
      s"magic-1 body ${body.length} below the 18-byte floor at offset $offset")
    val ts = if (magic == 1) r.int64() else -1L // v0 carries no timestamp
    val key = r.bytes()
    val value = r.bytes()
    (attrs & 0x07) match {
      case 0 => Seq(WireRecord(offset, ts, key, value))
      case c @ (1 | 2 | 3) => // compressed wrapper: value = codec(inner MessageSet)
        require(!inWrapper,
          s"nested compressed wrapper at offset $offset — the protocol " +
            "forbids compression inside a compressed message set")
        require(value != null,
          s"compressed wrapper (codec $c) with null value at offset $offset")
        val plain = c match {
          case 1 => gzipDecompress(value)
          case 2 => // snappy: xerial-framed or raw block (BlockCodecs)
            try BlockCodecs.snappyDecompress(value, MaxFrame)
            catch { case e: IllegalArgumentException =>
              throw new IllegalArgumentException(
                s"corrupt snappy wrapper at offset $offset: ${e.getMessage}") }
          case _ => // lz4: frame format, KAFKA-3160-tolerant header checksum
            try BlockCodecs.lz4FrameDecompress(value, MaxFrame)
            catch { case e: IllegalArgumentException =>
              throw new IllegalArgumentException(
                s"corrupt lz4 wrapper at offset $offset: ${e.getMessage}") }
        }
        val inner = decodeMessageSet(plain,
          allowTruncatedTail = false, inWrapper = true)
        require(inner.nonEmpty,
          s"compressed wrapper with empty inner set at offset $offset")
        if (magic == 1) {
          // KIP-31: inner offsets are relative; the wrapper carries the
          // last inner offset (absolute in a broker log, n−1 from a
          // producer) — one base shift resolves both conventions
          val base = offset - inner.last.offset
          inner.map(m => m.copy(offset = base + m.offset))
        } else inner // magic 0: inner offsets are already absolute
      case c =>
        throw new IllegalArgumentException(
          s"unsupported compression codec $c at offset $offset " +
            "(none=0, gzip=1, snappy=2, lz4=3 decode here; zstd=4 needs " +
            "a record-batch v2 producer and is outside the v0/v1 codec)")
    }
  }

  /** Encode records as ONE gzip-wrapped v1 message (the on-wire shape a
    * `compression.type=gzip` producer sends): inner set with relative
    * offsets 0..n−1, wrapper offset n−1, wrapper timestamp = max inner
    * timestamp, codec bits = 1. */
  def encodeMessageSetGzip(records: Seq[WireRecord]): Array[Byte] =
    encodeMessageSetCompressed(records, codec = 1)

  /** As [[encodeMessageSetGzip]] for the other v1 wrapper codecs:
    * codec 2 = snappy (xerial framing), codec 3 = lz4 (frame format) —
    * both emitted by [[BlockCodecs]]' from-spec encoders. */
  def encodeMessageSetCompressed(records: Seq[WireRecord], codec: Int): Array[Byte] = {
    require(records.nonEmpty, "compressed wrapper needs at least one record")
    require(codec >= 1 && codec <= 3, s"wrapper codec $codec not encodable (gzip|snappy|lz4)")
    val inner = encodeMessageSet(
      records.zipWithIndex.map { case (r, i) => r.copy(offset = i.toLong) })
    val msg = new Buf
    msg.int8(1) // magic
    msg.int8(codec.toByte) // attributes: codec bits, CreateTime
    msg.int64(records.map(_.timestamp).max)
    msg.bytes(null) // wrapper key
    msg.bytes(codec match {
      case 1 => gzipCompress(inner)
      case 2 => BlockCodecs.snappyCompress(inner)
      case _ => BlockCodecs.lz4FrameCompress(inner)
    })
    val body = msg.toArray
    val crc = new CRC32
    crc.update(body)
    val out = new Buf
    out.int64(records.size - 1L) // producer convention: last relative offset
    out.int32(4 + body.length)
    out.int32(crc.getValue.toInt)
    out.raw(body)
    out.toArray
  }

  /** gzip helpers for the v2 record-batch codec (same bomb-capped
    * implementations as the v0/v1 wrapper path). */
  private[kafka] def gzipForV2(data: Array[Byte]): Array[Byte] = gzipCompress(data)
  private[kafka] def gunzipForV2(data: Array[Byte]): Array[Byte] = gzipDecompress(data)

  private def gzipCompress(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }

  /** Bounded gunzip: a wrapper that inflates past [[MaxFrame]] is a
    * zip bomb, not a message set — rejected before the allocation, and
    * every stream error surfaces as the same IllegalArgumentException
    * the CRC path throws so the broker maps it to ErrCorruptMessage. */
  private def gzipDecompress(data: Array[Byte]): Array[Byte] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(data))
      val bos = new java.io.ByteArrayOutputStream(data.length * 2 + 64)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      var total = 0L
      while (n > 0) {
        total += n
        require(total <= MaxFrame,
          s"gzip wrapper inflates past the $MaxFrame-byte frame cap")
        bos.write(buf, 0, n)
        n = in.read(buf)
      }
      bos.toByteArray
    } catch {
      case e: java.io.IOException =>
        throw new IllegalArgumentException(s"corrupt gzip wrapper: ${e.getMessage}")
    }

  // ---- framing ---------------------------------------------------------

  /** Write one size-prefixed frame. */
  def writeFrame(out: DataOutputStream, payload: Array[Byte]): Unit = {
    out.writeInt(payload.length)
    out.write(payload)
    out.flush()
  }

  /** Read one size-prefixed frame (blocking); None on clean EOF. */
  def readFrame(in: DataInputStream): Option[Array[Byte]] = {
    val size =
      try in.readInt()
      catch { case _: java.io.EOFException => return None }
    require(size >= 0 && size <= MaxFrame, s"bad frame size $size")
    val buf = new Array[Byte](size)
    in.readFully(buf)
    Some(buf)
  }

  /** 64 MiB — far above any test frame, far below anything that could
    * mask a framing bug as an OOM. */
  val MaxFrame: Int = 64 << 20

  /** Kafka's default-partitioner hash (murmur2, seed 0x9747b28c, public
    * in the Kafka client sources) — used by the DSv2 sink so keyed
    * records land on the same partition a stock producer would pick. */
  def murmur2(data: Array[Byte]): Int = {
    val seed = 0x9747b28c
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ data.length
    val n4 = data.length / 4 * 4
    var i = 0
    while (i < n4) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 4
    }
    val rem = data.length - n4
    if (rem == 3) h ^= (data(n4 + 2) & 0xff) << 16
    if (rem >= 2) h ^= (data(n4 + 1) & 0xff) << 8
    if (rem >= 1) { h ^= data(n4) & 0xff; h *= m }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  /** Kafka's DefaultPartitioner placement: positive murmur2 mod count. */
  def partitionFor(key: Array[Byte], numPartitions: Int): Int =
    (murmur2(key) & 0x7fffffff) % numPartitions
}
