package graft.kafka

/** Pure-JVM snappy and LZ4 codecs for the Kafka wire layer, implemented
  * from the PUBLIC format specifications with no codec libraries:
  *
  *  - raw snappy block format (google/snappy `format_description.txt`):
  *    uvarint uncompressed length, then literal/copy elements tagged by
  *    the low two bits (00 literal, 01/10/11 copies with 1/2/4-byte
  *    offsets); copies may self-overlap and are replayed byte-by-byte;
  *  - the xerial `SnappyOutputStream` framing Kafka's snappy messages
  *    ship in: 8-byte magic {0x82 "SNAPPY" 0x00}, two int32 version
  *    fields, then (int32 length, raw-snappy block)* — plus the
  *    unframed raw-block form old clients produced, detected by magic;
  *  - the LZ4 block format (token nibbles: literal length / match
  *    length−4, 255-continuation length bytes, little-endian 16-bit
  *    match offsets, overlap-legal matches, literals-only final
  *    sequence) and the LZ4 FRAME format Kafka wraps it in (magic
  *    0x184D2204, FLG/BD descriptor, xxHash32 header checksum, 4-byte
  *    little-endian block sizes with an uncompressed-bit, end mark).
  *    KAFKA-3160 compatibility: magic-0 era producers computed the
  *    header checksum over magic+descriptor instead of the descriptor
  *    alone — both checksums are accepted, anything else is rejected;
  *  - xxHash32 (public xxHash spec) for the frame checksums.
  *
  * The compressors emit spec-valid literal-only streams (plus the
  * standard greedy match emitter is NOT needed for correctness —
  * compression ratio is a quality-of-service property, losslessness is
  * the contract the decoder is held to; fixtures with real copy/match
  * elements come from the independent Python generator so the decode
  * paths are cross-checked, not self-checked).
  *
  * Every decoder bounds its output by `cap` BEFORE allocating or
  * copying — a crafted frame claiming a 2 GB expansion dies as a clean
  * parse error, never as an attacker-chosen allocation (the gzip-path
  * discipline in [[Wire]]).
  */
private[kafka] object BlockCodecs {

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // ---- raw snappy block ------------------------------------------------

  /** Decompress one raw snappy block; `cap` bounds the declared output. */
  def snappyRawDecompress(in: Array[Byte], cap: Int): Array[Byte] = {
    var p = 0
    // uvarint uncompressed length
    var ulen = 0L; var shift = 0
    var more = true
    while (more) {
      if (p >= in.length) fail("snappy: truncated length varint")
      val b = in(p) & 0xff; p += 1
      ulen |= (b & 0x7fL) << shift; shift += 7
      more = (b & 0x80) != 0
      if (shift > 35) fail("snappy: oversized length varint")
    }
    if (ulen > cap) fail(s"snappy: declared $ulen bytes exceeds the $cap cap")
    val out = new Array[Byte](ulen.toInt)
    var o = 0
    def u8(i: Int): Int = { if (i >= in.length) fail("snappy: truncated"); in(i) & 0xff }
    while (p < in.length) {
      val tag = u8(p); p += 1
      (tag & 3) match {
        case 0 => // literal
          var len = (tag >>> 2) + 1
          if (len > 60) {
            val n = len - 60 // 1..4 extra little-endian length bytes
            var v = 0; var i = 0
            while (i < n) { v |= u8(p + i) << (8 * i); i += 1 }
            p += n; len = v + 1
            if (len < 0) fail("snappy: negative literal length")
          }
          // overflow-safe form: `p + len` could wrap negative for a
          // crafted 4-byte length near Int.MaxValue
          if (len > in.length - p || len > out.length - o)
            fail("snappy: literal overruns")
          System.arraycopy(in, p, out, o, len); p += len; o += len
        case c => // copy
          var len = 0; var off = 0
          c match {
            case 1 =>
              len = ((tag >>> 2) & 0x7) + 4
              off = ((tag >>> 5) << 8) | u8(p); p += 1
            case 2 =>
              len = (tag >>> 2) + 1
              off = u8(p) | (u8(p + 1) << 8); p += 2
            case _ =>
              len = (tag >>> 2) + 1
              off = u8(p) | (u8(p + 1) << 8) | (u8(p + 2) << 16) | (u8(p + 3) << 24)
              p += 4
          }
          if (off <= 0 || off > o) fail(s"snappy: copy offset $off at $o")
          if (len > out.length - o) fail("snappy: copy overruns output")
          var i = 0
          while (i < len) { out(o) = out(o - off); o += 1; i += 1 } // overlap-legal
      }
    }
    if (o != out.length) fail(s"snappy: produced $o of ${out.length} declared bytes")
    out
  }

  /** Literal-only raw snappy block (spec-valid; ratio-free). */
  def snappyRawCompress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 16)
    var v = data.length
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
    var p = 0
    while (p < data.length) {
      val len = math.min(data.length - p, 1 << 16)
      if (len <= 60) out.write((len - 1) << 2)
      else { // 61 = two extra LE length bytes
        out.write(61 << 2); out.write((len - 1) & 0xff); out.write(((len - 1) >>> 8) & 0xff)
      }
      out.write(data, p, len); p += len
    }
    out.toByteArray // empty input ⇒ the lone varint 0, the legal empty block
  }

  private val XerialMagic: Array[Byte] =
    Array(-126, 'S'.toByte, 'N'.toByte, 'A'.toByte, 'P'.toByte, 'P'.toByte,
      'Y'.toByte, 0)

  /** Kafka snappy value → bytes: xerial-framed when the magic matches,
    * else one raw snappy block (the pre-framing client shape). */
  def snappyDecompress(in: Array[Byte], cap: Int): Array[Byte] = {
    val framed = in.length >= 16 &&
      java.util.Arrays.equals(java.util.Arrays.copyOf(in, 8), XerialMagic)
    if (!framed) snappyRawDecompress(in, cap)
    else {
      val bb = java.nio.ByteBuffer.wrap(in, 8, in.length - 8)
      bb.getInt(); bb.getInt() // version, min-compatible version
      val out = new java.io.ByteArrayOutputStream(math.min(cap, in.length * 2 + 64))
      var total = 0L
      while (bb.remaining() > 0) {
        if (bb.remaining() < 4) fail("snappy: truncated xerial block header")
        val n = bb.getInt()
        if (n < 0 || n > bb.remaining()) fail(s"snappy: xerial block size $n")
        val block = new Array[Byte](n); bb.get(block)
        val plain = snappyRawDecompress(block, cap)
        total += plain.length
        if (total > cap) fail(s"snappy: stream inflates past the $cap cap")
        out.write(plain, 0, plain.length)
      }
      out.toByteArray
    }
  }

  /** Xerial-framed snappy (what a `compression.type=snappy` producer
    * ships): one block per 32 KiB of input. */
  def snappyCompress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 64)
    out.write(XerialMagic, 0, 8)
    def i32(v: Int): Unit = {
      out.write(v >>> 24); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    i32(1); i32(1)
    var p = 0
    do {
      val len = math.min(data.length - p, 32 * 1024)
      val block = snappyRawCompress(java.util.Arrays.copyOfRange(data, p, p + len))
      i32(block.length); out.write(block, 0, block.length)
      p += len
    } while (p < data.length)
    out.toByteArray
  }

  // ---- xxHash32 (public spec; seed 0 for LZ4F checksums) ---------------

  private val P1 = 0x9e3779b1; private val P2 = 0x85ebca77
  private val P3 = 0xc2b2ae3d; private val P4 = 0x27d4eb2f; private val P5 = 0x165667b1

  def xxhash32(data: Array[Byte], off: Int, len: Int, seed: Int): Int = {
    def rotl(x: Int, r: Int): Int = (x << r) | (x >>> (32 - r))
    def le32(i: Int): Int =
      (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
    val end = off + len
    var p = off
    var h =
      if (len >= 16) {
        var v1 = seed + P1 + P2; var v2 = seed + P2; var v3 = seed; var v4 = seed - P1
        while (p <= end - 16) {
          v1 = rotl(v1 + le32(p) * P2, 13) * P1
          v2 = rotl(v2 + le32(p + 4) * P2, 13) * P1
          v3 = rotl(v3 + le32(p + 8) * P2, 13) * P1
          v4 = rotl(v4 + le32(p + 12) * P2, 13) * P1
          p += 16
        }
        rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      } else seed + P5
    h += len
    while (p <= end - 4) { h = rotl(h + le32(p) * P3, 17) * P4; p += 4 }
    while (p < end) { h = rotl(h + (data(p) & 0xff) * P5, 11) * P1; p += 1 }
    h ^= h >>> 15; h *= P2; h ^= h >>> 13; h *= P3; h ^= h >>> 16
    h
  }

  // ---- LZ4 block -------------------------------------------------------

  /** Decompress one LZ4 block into at most `cap` bytes. */
  def lz4BlockDecompress(in: Array[Byte], off0: Int, len0: Int, cap: Int): Array[Byte] = {
    val end = off0 + len0
    var p = off0
    // decode into a growable array with random access for overlap copies
    var buf = new Array[Byte](math.min(cap, math.max(64, len0 * 3)))
    var o = 0
    def ensure(n: Int): Unit = {
      // overflow-safe: `o + n` could wrap negative for n near Int.MaxValue
      if (n < 0 || n > cap - o) fail(s"lz4: output exceeds the $cap cap")
      if (o + n > buf.length) {
        var c = buf.length * 2
        while (c < o + n) c *= 2
        buf = java.util.Arrays.copyOf(buf, math.min(c, cap))
      }
    }
    def u8(): Int = { if (p >= end) fail("lz4: truncated block"); val b = in(p) & 0xff; p += 1; b }
    def extLen(base: Int): Int = {
      var len = base
      if (base == 15) {
        var b = 255
        while (b == 255) { b = u8(); len += b; if (len < 0) fail("lz4: length overflow") }
      }
      len
    }
    var done = false
    while (!done) {
      val token = u8()
      val litLen = extLen(token >>> 4)
      if (litLen > end - p) fail("lz4: literals overrun input")
      ensure(litLen)
      System.arraycopy(in, p, buf, o, litLen); p += litLen; o += litLen
      if (p == end) done = true // literals-only final sequence
      else {
        if (p + 2 > end) fail("lz4: truncated match offset")
        val offv = (in(p) & 0xff) | ((in(p + 1) & 0xff) << 8); p += 2
        if (offv == 0 || offv > o) fail(s"lz4: match offset $offv at $o")
        val matchLen = extLen(token & 0xf) + 4
        if (matchLen < 0) fail("lz4: match length overflow") // +4 wrapped
        ensure(matchLen)
        var i = 0
        while (i < matchLen) { buf(o) = buf(o - offv); o += 1; i += 1 }
      }
    }
    java.util.Arrays.copyOf(buf, o)
  }

  /** Literal-only LZ4 block (one final sequence; spec-valid). */
  def lz4BlockCompress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 8)
    var len = data.length
    if (len < 15) out.write(len << 4)
    else {
      out.write(15 << 4); len -= 15
      while (len >= 255) { out.write(255); len -= 255 }
      out.write(len)
    }
    out.write(data, 0, data.length)
    out.toByteArray
  }

  private val Lz4Magic = 0x184d2204

  /** Decompress an LZ4 FRAME (the Kafka `compression.type=lz4` value).
    * Header checksum accepts both the spec computation (descriptor only)
    * and the KAFKA-3160 legacy one (magic included). */
  def lz4FrameDecompress(in: Array[Byte], cap: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.wrap(in).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    if (bb.remaining() < 7) fail("lz4: truncated frame header")
    if (bb.getInt() != Lz4Magic) fail("lz4: bad frame magic")
    val descStart = bb.position()
    val flg = bb.get() & 0xff
    if ((flg >>> 6) != 1) fail(s"lz4: unsupported frame version ${flg >>> 6}")
    val blockChecksum = (flg & 0x10) != 0
    val contentSize = (flg & 0x08) != 0
    val contentChecksum = (flg & 0x04) != 0
    if ((flg & 0x01) != 0) fail("lz4: dictionaries unsupported")
    bb.get() // BD (block max size — decoder output is cap-bounded anyway)
    if (contentSize) bb.getLong()
    val descEnd = bb.position()
    val hc = bb.get() & 0xff
    val spec = (xxhash32(in, descStart, descEnd - descStart, 0) >>> 8) & 0xff
    val legacy = (xxhash32(in, 0, descEnd, 0) >>> 8) & 0xff // KAFKA-3160 clients
    if (hc != spec && hc != legacy)
      fail(s"lz4: header checksum $hc matches neither spec $spec nor legacy $legacy")
    val out = new java.io.ByteArrayOutputStream(math.min(cap, in.length * 3 + 64))
    var total = 0L
    var endMark = false
    while (!endMark) {
      if (bb.remaining() < 4) fail("lz4: truncated block size")
      val sz = bb.getInt()
      if (sz == 0) endMark = true
      else {
        val uncompressed = (sz & 0x80000000) != 0
        val n = sz & 0x7fffffff
        if (n < 0 || n > bb.remaining()) fail(s"lz4: block size $n")
        val pos = bb.position()
        val plain =
          if (uncompressed) java.util.Arrays.copyOfRange(in, pos, pos + n)
          else lz4BlockDecompress(in, pos, n, cap)
        bb.position(pos + n)
        if (blockChecksum) {
          val bc = bb.getInt()
          if (bc != xxhash32(in, pos, n, 0)) fail("lz4: block checksum mismatch")
        }
        total += plain.length
        if (total > cap) fail(s"lz4: frame inflates past the $cap cap")
        out.write(plain, 0, plain.length)
      }
    }
    val plainAll = out.toByteArray
    if (contentChecksum) {
      if (bb.remaining() < 4) fail("lz4: truncated content checksum")
      val cc = bb.getInt()
      if (cc != xxhash32(plainAll, 0, plainAll.length, 0))
        fail("lz4: content checksum mismatch")
    }
    plainAll
  }

  /** Spec-form LZ4 frame (64 KiB blocks, content checksum on). */
  def lz4FrameCompress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 64)
    def i32le(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    i32le(Lz4Magic)
    val flg = (1 << 6) | (1 << 5) | (1 << 2) // v01, block-independent, content checksum
    val bd = 4 << 4 // 64 KiB max block
    val desc = Array(flg.toByte, bd.toByte)
    out.write(flg); out.write(bd)
    out.write((xxhash32(desc, 0, 2, 0) >>> 8) & 0xff)
    var p = 0
    while (p < data.length) {
      val len = math.min(data.length - p, 64 * 1024)
      val block = lz4BlockCompress(java.util.Arrays.copyOfRange(data, p, p + len))
      i32le(block.length); out.write(block, 0, block.length)
      p += len
    }
    i32le(0) // end mark
    i32le(xxhash32(data, 0, data.length, 0))
    out.toByteArray
  }
}
