package graft.kafka

/** Zstandard DECODER, implemented from the public specification
  * (RFC 8878 / the Zstandard format document) with no codec libraries —
  * the [[BlockCodecs]] discipline applied to Kafka's fourth codec so v2
  * RecordBatches with `compression.type=zstd` decode:
  *
  *  - frame layer: magic, frame-header descriptor (single-segment,
  *    content size, dictionary-ID fields, checksum flag), window
  *    descriptor, skippable frames, multi-frame concatenation, and the
  *    XXH64-low32 content checksum (xxh64 implemented from the public
  *    xxHash spec below);
  *  - block layer: Raw, RLE, and Compressed blocks (3-byte little-endian
  *    headers, last-block bit, 128 KiB block ceiling);
  *  - literals: Raw, RLE, Huffman-compressed (1- and 4-stream with the
  *    6-byte jump table) and Treeless (previous table reuse); Huffman
  *    tree descriptions in both the direct-nibble and FSE-compressed
  *    weight forms, with the implicit last weight completing the Kraft
  *    sum to a power of two;
  *  - FSE: normalized-count table descriptions (accuracy-log bounds,
  *    the −1 "less-than-one" probability, zero-run repeat flags), the
  *    spread-step table construction, and the backward bitstream with
  *    sentinel bit;
  *  - sequences: predefined / RLE / FSE-compressed / repeat table modes
  *    for LL/OF/ML, the three-state interleaved decode, baseline+bits
  *    code tables, and the three-slot repeated-offset history including
  *    the literals-length-0 index shift and the rep1−1 special case.
  *
  * The encode side is REAL compression ([[compress]]): greedy hash-4
  * LZ77 over the frame-scoped window, raw literals, and sequences
  * entropy-coded with the predefined FSE tables — the encode tables
  * derived as the exact inverse of this decoder's own tables
  * ([[FseEnc]]), with a RAW-block fallback on incompressible blocks
  * (and [[compressRaw]] kept as the minimal literal-only variant).
  * Output frames are held to the upstream `zstd` CLI byte-exactly in
  * `ZstdEncodeInteropSpec`. Every declared size on the decode side is
  * bounds-checked against the caller's `cap` BEFORE any allocation or
  * copy, so a crafted frame dies as a clean IllegalArgumentException,
  * never as an attacker-chosen allocation.
  *
  * Cross-checked against the REFERENCE implementation: the committed
  * `src/test/resources/zstd_fixtures.txt` frames are produced by the
  * upstream `zstd` CLI over deterministic payloads at levels 1/3/19
  * (plus no-checksum and long-window variants) — see
  * `scripts/zstd_fixture_gen.py` and `ZstdSpec`.
  */
private[kafka] object Zstd {

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private val FrameMagic = 0xFD2FB528
  private val SkippableMagicMask = 0xFFFFFFF0
  private val SkippableMagic = 0x184D2A50
  private val MaxBlockSize = 128 * 1024

  // ---- little-endian primitive reads ------------------------------------

  private def le16(a: Array[Byte], p: Int): Int =
    (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8)
  private def le24(a: Array[Byte], p: Int): Int =
    (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8) | ((a(p + 2) & 0xff) << 16)
  private def le32(a: Array[Byte], p: Int): Int =
    le16(a, p) | (le16(a, p + 2) << 16)
  private def le64(a: Array[Byte], p: Int): Long =
    (le32(a, p) & 0xFFFFFFFFL) | ((le32(a, p + 4) & 0xFFFFFFFFL) << 32)

  // ---- forward bit reader (FSE table descriptions) -----------------------

  /** Little-endian forward bit reader over `[off, end)`: bit i of the
    * stream is bit (i % 8) of byte off + i/8. */
  private final class FwdBits(a: Array[Byte], off: Int, end: Int) {
    private var pos = 0
    private val total = (end - off).toLong * 8
    def read(n: Int): Int = { val v = peek(n); skip(n); v }
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = pos + i
        if (b < total) {
          val byte = a(off + (b >> 3)) & 0xff
          v |= ((byte >> (b & 7)) & 1) << i
        } // past-end bits read as 0 (the final count may straddle)
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = pos += n
    def bytesConsumed: Int = (pos + 7) >> 3
    def bitsOverrun: Boolean = pos > total
  }

  // ---- backward bit reader (FSE / Huffman data streams) ------------------

  /** The spec's backward bitstream over `[off, end)`: the last byte's
    * highest set bit is the sentinel; reads consume bits from just
    * below it toward the start. Reads past the start return zero bits
    * and set `overflowed` (the FSE tail-flush contract). */
  private final class BwdBits(a: Array[Byte], off: Int, end: Int) {
    if (end <= off) fail("zstd: empty backward bitstream")
    private val last = a(end - 1) & 0xff
    if (last == 0) fail("zstd: backward bitstream missing sentinel bit")
    private var bitPos: Long = (end - off - 1).toLong * 8 +
      (31 - Integer.numberOfLeadingZeros(last))
    def read(n: Int): Int = {
      bitPos -= n
      var v = 0
      var j = 0
      while (j < n) {
        val b = bitPos + j
        if (b >= 0) {
          val byte = a(off + (b >> 3).toInt) & 0xff
          v |= ((byte >> (b & 7).toInt) & 1) << j
        }
        j += 1
      }
      v
    }
    def peek(n: Int): Int = { val p = bitPos; val v = read(n); bitPos = p; v }
    def skip(n: Int): Unit = bitPos -= n
    def overflowed: Boolean = bitPos < 0
    def finished: Boolean = bitPos == 0
  }

  // ---- FSE ---------------------------------------------------------------

  /** One decoding-table cell. */
  private final class FseTable(val accuracyLog: Int, val symbol: Array[Int],
                               val nbBits: Array[Int], val newState: Array[Int])

  /** Read a normalized-count table description (forward bitstream);
    * returns the built table and the byte length consumed. */
  private def readFseTable(a: Array[Byte], off: Int, end: Int,
                           maxLog: Int, maxSymbol: Int): (FseTable, Int) = {
    val br = new FwdBits(a, off, end)
    val accuracyLog = 5 + br.read(4)
    if (accuracyLog > maxLog) fail(s"zstd: FSE accuracy $accuracyLog > max $maxLog")
    val tableSize = 1 << accuracyLog
    var remaining = tableSize + 1
    var threshold = tableSize
    var nbBits = accuracyLog + 1
    val counts = new Array[Int](maxSymbol + 1)
    var symbol = 0
    var previous0 = false
    while (remaining > 1) {
      if (symbol > maxSymbol) fail("zstd: FSE table has too many symbols")
      if (previous0) {
        // zero-run repeat flags: 2-bit groups, 3 = continue
        var more = true
        while (more) {
          val rep = br.read(2)
          symbol += rep
          more = rep == 3
          if (symbol > maxSymbol + 1) fail("zstd: FSE zero-run overruns symbols")
        }
        if (remaining <= 1) fail("zstd: FSE zero-run at table end")
        if (symbol > maxSymbol) fail("zstd: FSE table has too many symbols")
      }
      val max = (2 * threshold - 1) - remaining
      var count =
        if ((br.peek(nbBits - 1) & (threshold - 1)) < max) {
          val c = br.peek(nbBits - 1) & (threshold - 1)
          br.skip(nbBits - 1); c
        } else {
          var c = br.peek(nbBits) & (2 * threshold - 1)
          if (c >= threshold) c -= max
          br.skip(nbBits); c
        }
      count -= 1 // -1 encodes the "less than 1" probability
      remaining -= math.abs(count)
      counts(symbol) = count
      symbol += 1
      previous0 = count == 0
      while (remaining > 1 && remaining < threshold) {
        nbBits -= 1; threshold >>= 1
      }
    }
    if (remaining != 1) fail("zstd: FSE counts do not sum to table size")
    if (br.bitsOverrun) fail("zstd: FSE table description overruns its bytes")
    (buildFseTable(counts, symbol - 1, accuracyLog), br.bytesConsumed)
  }

  /** FSE decoding-table construction (spec §4.1.1: low-probability
    * symbols at the top, positive counts spread by the fixed step). */
  private def buildFseTable(counts: Array[Int], maxSym: Int,
                            accuracyLog: Int): FseTable = {
    val tableSize = 1 << accuracyLog
    val symbolT = new Array[Int](tableSize)
    var highThreshold = tableSize - 1
    for (s <- 0 to maxSym if counts(s) == -1) {
      symbolT(highThreshold) = s; highThreshold -= 1
    }
    val step = (tableSize >> 1) + (tableSize >> 3) + 3
    val mask = tableSize - 1
    var pos = 0
    for (s <- 0 to maxSym; _ <- 0 until math.max(0, counts(s))) {
      symbolT(pos) = s
      pos = (pos + step) & mask
      while (pos > highThreshold) pos = (pos + step) & mask
    }
    if (pos != 0) fail("zstd: FSE spread did not close")
    val next = new Array[Int](maxSym + 1)
    for (s <- 0 to maxSym) next(s) = if (counts(s) == -1) 1 else counts(s)
    val nbBits = new Array[Int](tableSize)
    val newState = new Array[Int](tableSize)
    for (u <- 0 until tableSize) {
      val s = symbolT(u)
      val n = next(s); next(s) += 1
      val bits = accuracyLog - (31 - Integer.numberOfLeadingZeros(n))
      nbBits(u) = bits
      newState(u) = (n << bits) - tableSize
    }
    new FseTable(accuracyLog, symbolT, nbBits, newState)
  }

  /** A degenerate one-symbol table (the RLE sequence-table mode). */
  private def rleTable(symbol: Int): FseTable =
    new FseTable(0, Array(symbol), Array(0), Array(0))

  // ---- Huffman ------------------------------------------------------------

  /** Literals decoding table: `tableLog`-bit prefix → (symbol, nbBits). */
  private final class HufTable(val tableLog: Int, val symbol: Array[Byte],
                               val nbBits: Array[Byte])

  /** Read a Huffman tree description at `off`; returns (table, bytes). */
  private def readHufTable(a: Array[Byte], off: Int, end: Int): (HufTable, Int) = {
    if (off >= end) fail("zstd: truncated Huffman description")
    val hb = a(off) & 0xff
    val (weights, consumed) =
      if (hb >= 128) { // direct 4-bit weights
        val n = hb - 127
        val bytes = (n + 1) / 2
        if (off + 1 + bytes > end) fail("zstd: truncated direct Huffman weights")
        val w = new Array[Int](n)
        for (i <- 0 until n) {
          val b = a(off + 1 + i / 2) & 0xff
          w(i) = if (i % 2 == 0) b >> 4 else b & 0xf
        }
        (w, 1 + bytes)
      } else { // FSE-compressed weights, two interleaved states
        val csize = hb
        if (off + 1 + csize > end) fail("zstd: truncated FSE Huffman weights")
        val (table, descBytes) = readFseTable(a, off + 1, off + 1 + csize,
          maxLog = 6, maxSymbol = 255)
        if (descBytes >= csize) fail("zstd: FSE weights have no bitstream")
        val bits = new BwdBits(a, off + 1 + descBytes, off + 1 + csize)
        var s1 = bits.read(table.accuracyLog)
        var s2 = bits.read(table.accuracyLog)
        if (bits.overflowed) fail("zstd: FSE weight init states overrun")
        val out = scala.collection.mutable.ArrayBuffer.empty[Int]
        def emitAndUpdate(state: Int): Int = {
          out += table.symbol(state)
          table.newState(state) + bits.read(table.nbBits(state))
        }
        var done = false
        while (!done) {
          if (out.size > 255) fail("zstd: more than 255 Huffman weights")
          s1 = emitAndUpdate(s1)
          if (bits.overflowed) { out += table.symbol(s2); done = true }
          else {
            s2 = emitAndUpdate(s2)
            if (bits.overflowed) { out += table.symbol(s1); done = true }
          }
        }
        if (out.size > 255) fail("zstd: more than 255 Huffman weights")
        (out.toArray, 1 + csize)
      }
    (buildHufTable(weights), consumed)
  }

  /** Canonical table build: the implicit last symbol completes the
    * weight sum to a power of two; per-symbol span = 2^(w−1) cells,
    * filled in weight order (longer codes at lower prefixes). */
  private def buildHufTable(explicitWeights: Array[Int]): HufTable = {
    var total = 0L
    explicitWeights.foreach { w =>
      if (w > 11) fail(s"zstd: Huffman weight $w out of range")
      if (w > 0) total += 1L << (w - 1)
    }
    if (total == 0) fail("zstd: Huffman tree with no weights")
    val tableLog = 64 - java.lang.Long.numberOfLeadingZeros(total) // floor+1
    if (tableLog > 11) fail(s"zstd: Huffman table log $tableLog > 11")
    val rest = (1L << tableLog) - total
    if (rest <= 0 || (rest & (rest - 1)) != 0)
      fail("zstd: Huffman weights do not complete a power of two")
    val lastWeight = java.lang.Long.numberOfTrailingZeros(rest).toInt + 1
    val weights = explicitWeights :+ lastWeight
    val n = weights.length
    if (n > 256) fail("zstd: too many Huffman symbols")
    // rank offsets: weight w spans 2^(w-1) cells per symbol, weights
    // ascending from table index 0
    val counts = new Array[Int](13)
    weights.foreach(w => if (w > 0) counts(w) += 1)
    val rankStart = new Array[Int](14)
    for (w <- 1 to 12) rankStart(w + 1) = rankStart(w) + counts(w) * (1 << (w - 1))
    if (rankStart(13) != (1 << tableLog)) fail("zstd: Huffman rank fill mismatch")
    val size = 1 << tableLog
    val sym = new Array[Byte](size)
    val nb = new Array[Byte](size)
    val cursor = rankStart.clone()
    for (s <- 0 until n) {
      val w = weights(s)
      if (w > 0) {
        val len = 1 << (w - 1)
        val bits = (tableLog + 1 - w).toByte
        var p = cursor(w)
        cursor(w) += len
        var i = 0
        while (i < len) { sym(p) = s.toByte; nb(p) = bits; p += 1; i += 1 }
      }
    }
    new HufTable(tableLog, sym, nb)
  }

  /** Decode exactly `count` literals from one backward Huffman stream. */
  private def hufDecodeStream(a: Array[Byte], off: Int, end: Int,
                              table: HufTable, out: Array[Byte], outOff: Int,
                              count: Int): Unit = {
    val bits = new BwdBits(a, off, end)
    var i = 0
    while (i < count) {
      val idx = bits.peek(table.tableLog)
      out(outOff + i) = table.symbol(idx)
      bits.skip(table.nbBits(idx))
      if (bits.overflowed) fail("zstd: Huffman literal stream overruns")
      i += 1
    }
    if (!bits.finished) fail("zstd: Huffman literal stream not fully consumed")
  }

  // ---- sequence code tables (spec §3.1.1.3.2.1.1) -------------------------

  private val LlBase = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536)
  private val LlBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private val MlBase = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539)
  private val MlBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // predefined normalized counts (spec §3.1.1.3.2.2)
  private val LlPredef = Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val MlPredef = Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OfPredef = Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  private lazy val LlDefault = buildFseTable(LlPredef, 35, 6)
  private lazy val MlDefault = buildFseTable(MlPredef, 52, 6)
  private lazy val OfDefault = buildFseTable(OfPredef, 28, 5)

  // ---- per-frame decoder state -------------------------------------------

  private final class FrameState {
    var huf: HufTable = _
    var llTable: FseTable = _
    var ofTable: FseTable = _
    var mlTable: FseTable = _
    var rep1 = 1L; var rep2 = 4L; var rep3 = 8L
  }

  /** Growable cap-bounded output buffer. */
  private final class Out(cap: Int) {
    var buf = new Array[Byte](1024)
    var len = 0
    /** Start offset of the frame currently being decoded: RFC 8878 §3.1.1
      * scopes the match window to the frame, so a match offset reaching
      * into a PREVIOUS frame's output is spec-invalid and rejected. */
    var frameStart = 0
    def ensure(n: Int): Unit = {
      if (n < 0 || n > cap - len) fail(s"zstd: output exceeds the $cap cap")
      if (len + n > buf.length) {
        var c = buf.length.toLong * 2
        while (c < len + n) c *= 2
        buf = java.util.Arrays.copyOf(buf, math.min(c, cap.toLong).toInt)
      }
    }
    def append(a: Array[Byte], off: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(a, off, buf, len, n); len += n
    }
    def appendRun(b: Byte, n: Int): Unit = {
      ensure(n); java.util.Arrays.fill(buf, len, len + n, b); len += n
    }
    /** Overlap-legal match copy from `offset` back (bounded to the
      * current frame, never a previous frame's output). */
    def matchCopy(offset: Long, n: Int): Unit = {
      if (offset <= 0 || offset > len - frameStart)
        fail(s"zstd: match offset $offset at ${len - frameStart} into the frame")
      ensure(n)
      var i = 0
      val off = offset.toInt
      while (i < n) { buf(len) = buf(len - off); len += 1; i += 1 }
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  // ---- literals section ---------------------------------------------------

  /** Decode the literals section of one compressed block; returns
    * (literals bytes, section byte length). */
  private def decodeLiterals(a: Array[Byte], off: Int, end: Int,
                             st: FrameState, cap: Int): (Array[Byte], Int) = {
    if (off >= end) fail("zstd: missing literals section")
    val b0 = a(off) & 0xff
    val blockType = b0 & 3
    val sizeFormat = (b0 >> 2) & 3
    blockType match {
      case 0 | 1 => // Raw | RLE
        val (regen, hdr) = sizeFormat match {
          case 0 | 2 => (b0 >> 3, 1)
          case 1 =>
            if (off + 2 > end) fail("zstd: truncated literals header")
            ((b0 >> 4) | ((a(off + 1) & 0xff) << 4), 2)
          case _ =>
            if (off + 3 > end) fail("zstd: truncated literals header")
            ((b0 >> 4) | ((a(off + 1) & 0xff) << 4) | ((a(off + 2) & 0xff) << 12), 3)
        }
        if (regen > cap) fail(s"zstd: literals size $regen exceeds the $cap cap")
        if (blockType == 0) { // Raw
          if (off + hdr + regen > end) fail("zstd: raw literals overrun block")
          (java.util.Arrays.copyOfRange(a, off + hdr, off + hdr + regen),
            hdr + regen)
        } else { // RLE
          if (off + hdr + 1 > end) fail("zstd: RLE literals missing byte")
          val out = new Array[Byte](regen)
          java.util.Arrays.fill(out, a(off + hdr))
          (out, hdr + 1)
        }
      case _ => // Compressed | Treeless
        val (regen, csize, hdr) = sizeFormat match {
          case 0 | 1 => // 10-bit sizes, 3-byte header
            if (off + 3 > end) fail("zstd: truncated literals header")
            val h = le24(a, off)
            ((h >> 4) & 0x3ff, (h >> 14) & 0x3ff, 3)
          case 2 => // 14-bit sizes, 4-byte header
            if (off + 4 > end) fail("zstd: truncated literals header")
            val h = le32(a, off)
            ((h >>> 4) & 0x3fff, (h >>> 18) & 0x3fff, 4)
          case _ => // 18-bit sizes, 5-byte header
            if (off + 5 > end) fail("zstd: truncated literals header")
            val h = le32(a, off) & 0xFFFFFFFFL
            val h5 = a(off + 4) & 0xff
            (((h >>> 4) & 0x3ffff).toInt,
              (((h >>> 22) | (h5.toLong << 10)) & 0x3ffff).toInt, 5)
        }
        if (regen > cap) fail(s"zstd: literals size $regen exceeds the $cap cap")
        if (off + hdr + csize > end) fail("zstd: compressed literals overrun block")
        val fourStreams = sizeFormat != 0
        var p = off + hdr
        if (blockType == 2) { // Compressed: tree description first
          val (table, treeBytes) = readHufTable(a, p, p + csize)
          st.huf = table
          p += treeBytes
        } else if (st.huf == null)
          fail("zstd: treeless literals with no previous Huffman table")
        val streamsEnd = off + hdr + csize
        val out = new Array[Byte](regen)
        if (!fourStreams) {
          hufDecodeStream(a, p, streamsEnd, st.huf, out, 0, regen)
        } else {
          if (p + 6 > streamsEnd) fail("zstd: truncated literals jump table")
          val s1 = le16(a, p); val s2 = le16(a, p + 2); val s3 = le16(a, p + 4)
          p += 6
          val seg = (regen + 3) / 4
          val last = regen - 3 * seg
          if (last < 0) fail("zstd: 4-stream literals smaller than 3 segments")
          val starts = Array(p, p + s1, p + s1 + s2, p + s1 + s2 + s3)
          val ends = Array(p + s1, p + s1 + s2, p + s1 + s2 + s3, streamsEnd)
          if (ends(2) > streamsEnd) fail("zstd: literal streams overrun section")
          for (i <- 0 until 4) {
            val cnt = if (i < 3) seg else last
            hufDecodeStream(a, starts(i), ends(i), st.huf, out, i * seg, cnt)
          }
        }
        (out, hdr + csize)
    }
  }

  // ---- sequences section ---------------------------------------------------

  /** Resolve a table per the 2-bit compression mode; returns (table,
    * bytes consumed by its description). */
  private def seqTable(a: Array[Byte], off: Int, end: Int, mode: Int,
                       default: FseTable, prev: FseTable, maxLog: Int,
                       maxSymbol: Int, what: String): (FseTable, Int) =
    mode match {
      case 0 => (default, 0)
      case 1 => // RLE: one byte symbol
        if (off >= end) fail(s"zstd: truncated $what RLE symbol")
        val s = a(off) & 0xff
        if (s > maxSymbol) fail(s"zstd: $what RLE symbol $s out of range")
        (rleTable(s), 1)
      case 2 =>
        val (t, n) = readFseTable(a, off, end, maxLog, maxSymbol)
        (t, n)
      case _ =>
        if (prev == null) fail(s"zstd: $what repeat mode with no previous table")
        (prev, 0)
    }

  /** Decode and execute one compressed block's sequences. */
  private def decodeSequences(a: Array[Byte], off0: Int, end: Int,
                              literals: Array[Byte], st: FrameState,
                              out: Out): Unit = {
    var p = off0
    if (p >= end) fail("zstd: missing sequences section")
    val b0 = a(p) & 0xff; p += 1
    val nbSeq =
      if (b0 == 0) 0
      else if (b0 < 128) b0
      else if (b0 < 255) {
        if (p >= end) fail("zstd: truncated sequence count")
        val v = ((b0 - 128) << 8) + (a(p) & 0xff); p += 1; v
      } else {
        if (p + 2 > end) fail("zstd: truncated sequence count")
        val v = le16(a, p) + 0x7F00; p += 2; v
      }
    if (nbSeq == 0) {
      if (p != end) fail("zstd: bytes after empty sequences section")
      out.append(literals, 0, literals.length)
      return
    }
    if (p >= end) fail("zstd: truncated sequence modes")
    val modes = a(p) & 0xff; p += 1
    if ((modes & 3) != 0) fail("zstd: reserved sequence-mode bits set")
    val (ll, n1) = seqTable(a, p, end, (modes >> 6) & 3, LlDefault, st.llTable,
      9, 35, "literals-length"); p += n1
    val (of, n2) = seqTable(a, p, end, (modes >> 4) & 3, OfDefault, st.ofTable,
      8, 31, "offset"); p += n2
    val (ml, n3) = seqTable(a, p, end, (modes >> 2) & 3, MlDefault, st.mlTable,
      9, 52, "match-length"); p += n3
    st.llTable = ll; st.ofTable = of; st.mlTable = ml

    val bits = new BwdBits(a, p, end)
    var llState = bits.read(ll.accuracyLog)
    var ofState = bits.read(of.accuracyLog)
    var mlState = bits.read(ml.accuracyLog)
    if (bits.overflowed) fail("zstd: sequence init states overrun")

    var litPos = 0
    var seq = 0
    while (seq < nbSeq) {
      val ofCode = of.symbol(ofState)
      val llCode = ll.symbol(llState)
      val mlCode = ml.symbol(mlState)
      if (llCode > 35 || mlCode > 52 || ofCode > 31)
        fail("zstd: sequence code out of range")
      // field bits in spec order: offset, match length, literals length
      val ofValue = (1L << ofCode) +
        (if (ofCode > 0) readLongBits(bits, ofCode) else 0L)
      val matchLen = MlBase(mlCode) + bits.read(MlBits(mlCode))
      val litLen = LlBase(llCode) + bits.read(LlBits(llCode))
      if (bits.overflowed) fail("zstd: sequence field bits overrun")

      // repeated-offset resolution (incl. the litLen==0 index shift)
      val offset: Long =
        if (ofValue > 3) {
          val o = ofValue - 3
          st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = o; o
        } else {
          val idx = ofValue.toInt + (if (litLen == 0) 1 else 0)
          idx match {
            case 1 => st.rep1
            case 2 =>
              val o = st.rep2; st.rep2 = st.rep1; st.rep1 = o; o
            case 3 =>
              val o = st.rep3; st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = o; o
            case _ =>
              val o = st.rep1 - 1
              if (o <= 0) fail("zstd: rep1-1 offset underflow")
              st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = o; o
          }
        }

      if (litPos + litLen > literals.length)
        fail("zstd: sequence literals overrun the literal buffer")
      out.append(literals, litPos, litLen)
      litPos += litLen
      out.matchCopy(offset, matchLen)

      seq += 1
      if (seq < nbSeq) { // states do not update after the last sequence
        llState = ll.newState(llState) + bits.read(ll.nbBits(llState))
        mlState = ml.newState(mlState) + bits.read(ml.nbBits(mlState))
        ofState = of.newState(ofState) + bits.read(of.nbBits(ofState))
        if (bits.overflowed) fail("zstd: sequence state update overruns")
      }
    }
    if (!bits.finished) fail("zstd: sequence bitstream not fully consumed")
    out.append(literals, litPos, literals.length - litPos)
  }

  /** Read up to 31 extra offset bits as a long. */
  private def readLongBits(bits: BwdBits, n: Int): Long =
    if (n <= 30) bits.read(n).toLong & 0x7FFFFFFFL
    else {
      val hi = bits.read(n - 30).toLong
      val lo = bits.read(30).toLong & 0x3FFFFFFFL
      (hi << 30) | lo
    }

  // ---- frame layer ---------------------------------------------------------

  /** Decompress a zstd value (one or more frames, skippables allowed)
    * into at most `cap` bytes. */
  def decompress(in: Array[Byte], cap: Int): Array[Byte] = {
    val out = new Out(cap)
    var p = 0
    if (in.length < 4) fail("zstd: input below magic size")
    while (p < in.length) {
      if (p + 4 > in.length) fail("zstd: trailing bytes below magic size")
      val magic = le32(in, p)
      if ((magic & SkippableMagicMask) == SkippableMagic) {
        if (p + 8 > in.length) fail("zstd: truncated skippable frame")
        val n = le32(in, p + 4)
        if (n < 0 || p + 8 + n > in.length) fail("zstd: skippable frame overruns")
        p += 8 + n
      } else if (magic == FrameMagic) {
        p = decodeFrame(in, p + 4, out, cap)
      } else fail(f"zstd: bad magic 0x$magic%08x")
    }
    out.result()
  }

  private def decodeFrame(in: Array[Byte], start: Int, out: Out, cap: Int): Int = {
    var p = start
    if (p >= in.length) fail("zstd: truncated frame header")
    val fhd = in(p) & 0xff; p += 1
    val fcsFlag = fhd >> 6
    val singleSegment = (fhd & 0x20) != 0
    if ((fhd & 0x08) != 0) fail("zstd: reserved frame-header bit set")
    val checksum = (fhd & 0x04) != 0
    val dictIdFlag = fhd & 3
    if (!singleSegment) {
      if (p >= in.length) fail("zstd: truncated window descriptor")
      p += 1 // window size only caps memory; our cap already does
    }
    val dictBytes = Array(0, 1, 2, 4)(dictIdFlag)
    if (p + dictBytes > in.length) fail("zstd: truncated dictionary id")
    var dictId = 0L
    for (i <- 0 until dictBytes) dictId |= (in(p + i) & 0xffL) << (8 * i)
    p += dictBytes
    if (dictId != 0) fail(s"zstd: dictionary $dictId required but unsupported")
    val fcsBytes =
      if (fcsFlag == 0) (if (singleSegment) 1 else 0)
      else Array(0, 2, 4, 8)(fcsFlag)
    if (p + fcsBytes > in.length) fail("zstd: truncated content size")
    val contentSize: Long = fcsBytes match {
      case 0 => -1L
      case 1 => in(p) & 0xffL
      case 2 => 256L + le16(in, p)
      case 4 => le32(in, p) & 0xFFFFFFFFL
      case _ => le64(in, p)
    }
    p += fcsBytes
    if (contentSize > cap)
      fail(s"zstd: declared content $contentSize exceeds the $cap cap")

    val st = new FrameState
    val frameStart = out.len
    out.frameStart = frameStart
    var last = false
    while (!last) {
      if (p + 3 > in.length) fail("zstd: truncated block header")
      val h = le24(in, p); p += 3
      last = (h & 1) != 0
      val blockType = (h >> 1) & 3
      val blockSize = h >>> 3
      blockType match {
        case 0 => // Raw
          if (p + blockSize > in.length) fail("zstd: raw block overruns input")
          out.append(in, p, blockSize)
          p += blockSize
        case 1 => // RLE: blockSize is the REGENERATED size, content 1 byte
          // §3.1.1.2: Block_Size (the regenerated size here) is bounded
          // by Block_Maximum_Size like every other block type
          if (blockSize > MaxBlockSize) fail(s"zstd: RLE block size $blockSize > 128 KiB")
          if (p >= in.length) fail("zstd: RLE block missing byte")
          out.appendRun(in(p), blockSize)
          p += 1
        case 2 => // Compressed
          if (blockSize > MaxBlockSize) fail(s"zstd: block size $blockSize > 128 KiB")
          if (p + blockSize > in.length) fail("zstd: compressed block overruns input")
          val blockEnd = p + blockSize
          val (literals, litBytes) = decodeLiterals(in, p, blockEnd, st, cap)
          decodeSequences(in, p + litBytes, blockEnd, literals, st, out)
          p = blockEnd
        case _ => fail("zstd: reserved block type")
      }
    }
    if (contentSize >= 0 && out.len - frameStart != contentSize)
      fail(s"zstd: frame produced ${out.len - frameStart} of $contentSize declared bytes")
    if (checksum) {
      if (p + 4 > in.length) fail("zstd: truncated content checksum")
      val want = le32(in, p); p += 4
      val got = (xxh64(out.buf, frameStart, out.len - frameStart, 0L) & 0xFFFFFFFFL).toInt
      if (got != want)
        fail(f"zstd: content checksum mismatch (wire 0x$want%08x, computed 0x$got%08x)")
    }
    p
  }

  // ---- spec-valid raw-frame compressor (the produce side) ------------------

  /** A spec-valid zstd frame of RAW blocks — the literal-only stance of
    * [[BlockCodecs.snappyRawCompress]]: lossless, ratio-free, and
    * decodable by any conformant decoder (single-segment header with
    * exact content size, 64 KiB raw blocks, content checksum). */
  def compressRaw(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 32)
    def le(v: Long, n: Int): Unit =
      for (i <- 0 until n) out.write(((v >> (8 * i)) & 0xff).toInt)
    le(FrameMagic & 0xFFFFFFFFL, 4)
    val n = data.length
    // single-segment; FCS field sized to the content; checksum on
    val fcsFlag = if (n < 256) 0 else if (n < 65536 + 256) 1 else 2
    out.write((fcsFlag << 6) | 0x20 | 0x04)
    fcsFlag match {
      case 0 => le(n, 1)
      case 1 => le(n - 256, 2)
      case _ => le(n, 4)
    }
    var p = 0
    do {
      val len = math.min(n - p, 64 * 1024)
      val lastBit = if (p + len >= n) 1 else 0
      le((len.toLong << 3) | lastBit, 3) // type 0 = Raw
      out.write(data, p, len)
      p += len
    } while (p < n)
    le(xxh64(data, 0, n, 0L) & 0xFFFFFFFFL, 4)
    out.toByteArray
  }

  // ---- real compressor: greedy LZ77 + predefined-FSE sequences ------------
  //
  // The encode direction of the block format, built as the EXACT
  // inverse of this file's decoder: matches come from a greedy hash-4
  // LZ77 over the whole frame (offsets may reach previous blocks —
  // the frame-scoped window the decoder enforces), literals ship RAW,
  // and sequences are entropy-coded with the PREDEFINED FSE tables
  // (mode 0 — no table serialization), so every (code, extra-bits,
  // state-transition) decision is derived from the same decode tables
  // `decodeSequences` reads. Blocks that fail to shrink fall back to
  // RAW, so output never exceeds input + headers.

  /** Per-symbol ENCODE view of a decode [[FseTable]]: decode cell `u`
    * covers the next-state interval [newState(u), newState(u) +
    * 2^nbBits(u)); the intervals of one symbol's cells tile the whole
    * state space, so encoding symbol s from known next-decoder-state c
    * means finding the covering u, emitting (c − newState(u)) in
    * nbBits(u) bits, and making u the state — FSE encoding without a
    * separately-built (and separately-trusted) encode table. */
  private final class FseEnc(val t: FseTable) {
    private val states: Array[Array[Int]] = {
      val maxSym = t.symbol.max
      val buf = Array.fill(maxSym + 1)(
        scala.collection.mutable.ArrayBuffer.empty[Int])
      for (u <- 0 until (1 << t.accuracyLog)) buf(t.symbol(u)) += u
      buf.map(_.sortBy(u => t.newState(u)).toArray)
    }
    /** Any state decoding `sym` (the free choice for the last sequence). */
    def first(sym: Int): Int = states(sym)(0)
    /** The state decoding `sym` whose next-interval covers `c`. */
    def covering(sym: Int, c: Int): Int = {
      val ss = states(sym)
      var i = 0
      while (i < ss.length) {
        val u = ss(i)
        if (c >= t.newState(u) && c < t.newState(u) + (1 << t.nbBits(u)))
          return u
        i += 1
      }
      fail(s"zstd: FSE encode state $c uncovered for symbol $sym") // unreachable
    }
  }

  private lazy val LlEnc = new FseEnc(LlDefault)
  private lazy val OfEnc = new FseEnc(OfDefault)
  private lazy val MlEnc = new FseEnc(MlDefault)

  /** The length code whose [base, base + 2^bits) range holds `len`
    * (the base/bits arrays tile the representable lengths). */
  private def codeOf(base: Array[Int], bits: Array[Int], len: Int): Int = {
    var c = base.length - 1
    while (base(c) > len) c -= 1
    if (len - base(c) >= (1 << bits(c)))
      fail(s"zstd: length $len outside code $c range") // unreachable by construction
    c
  }

  /** One LZ77 sequence: `ofValue` is the real offset + 3 (repeat
    * offsets are never emitted). */
  private final case class Sq(litLen: Int, ofValue: Long, matchLen: Int)

  /** Backward-bitstream writer: fields pushed in DECODER READ order,
    * rendered little-endian with the sentinel bit above the
    * first-read field — the exact inverse of [[BwdBits]]. */
  private final class BwdWriter {
    private val fields = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    def push(v: Long, n: Int): Unit = {
      if (n > 0) fields += ((v, n))
    }
    def render(): Array[Byte] = {
      var total = 0L
      fields.foreach(total += _._2)
      val out = new Array[Byte](((total + 1 + 7) / 8).toInt)
      def setBit(b: Long): Unit = {
        val at = (b >> 3).toInt
        out(at) = (out(at) | (1 << (b & 7).toInt)).toByte
      }
      var cursor = 0L
      var i = fields.length - 1
      while (i >= 0) { // last-read field sits at the lowest stream bits
        val (v, n) = fields(i)
        var j = 0
        while (j < n) {
          if (((v >> j) & 1L) != 0) setBit(cursor + j)
          j += 1
        }
        cursor += n
        i -= 1
      }
      setBit(cursor) // the sentinel
      out
    }
  }

  /** Serialize one block's sequences section (predefined tables). */
  private def encodeSequencesSection(seqs: IndexedSeq[Sq]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(16 + seqs.length * 3)
    val n = seqs.length
    if (n < 128) out.write(n)
    else if (n < 0x7F00) { out.write((n >> 8) + 128); out.write(n & 0xff) }
    else { out.write(255); out.write((n - 0x7F00) & 0xff); out.write(((n - 0x7F00) >> 8) & 0xff) }
    if (n == 0) return out.toByteArray
    out.write(0) // symbol compression modes: LL/OF/ML all predefined
    val llC = new Array[Int](n); val mlC = new Array[Int](n); val ofC = new Array[Int](n)
    var i = 0
    while (i < n) {
      llC(i) = codeOf(LlBase, LlBits, seqs(i).litLen)
      mlC(i) = codeOf(MlBase, MlBits, seqs(i).matchLen)
      ofC(i) = 63 - java.lang.Long.numberOfLeadingZeros(seqs(i).ofValue)
      i += 1
    }
    // backward induction of the three decoder-state chains: pick any
    // state for the last sequence, then each earlier state must map
    // onto its successor through the decode transition
    val llU = new Array[Int](n); val mlU = new Array[Int](n); val ofU = new Array[Int](n)
    llU(n - 1) = LlEnc.first(llC(n - 1))
    mlU(n - 1) = MlEnc.first(mlC(n - 1))
    ofU(n - 1) = OfEnc.first(ofC(n - 1))
    i = n - 2
    while (i >= 0) {
      llU(i) = LlEnc.covering(llC(i), llU(i + 1))
      mlU(i) = MlEnc.covering(mlC(i), mlU(i + 1))
      ofU(i) = OfEnc.covering(ofC(i), ofU(i + 1))
      i -= 1
    }
    val w = new BwdWriter
    w.push(llU(0).toLong, LlDefault.accuracyLog) // init states, read first
    w.push(ofU(0).toLong, OfDefault.accuracyLog)
    w.push(mlU(0).toLong, MlDefault.accuracyLog)
    i = 0
    while (i < n) {
      w.push(seqs(i).ofValue - (1L << ofC(i)), ofC(i))
      w.push((seqs(i).matchLen - MlBase(mlC(i))).toLong, MlBits(mlC(i)))
      w.push((seqs(i).litLen - LlBase(llC(i))).toLong, LlBits(llC(i)))
      if (i < n - 1) { // decoder updates LL, ML, OF after each non-final seq
        w.push((llU(i + 1) - LlDefault.newState(llU(i))).toLong,
          LlDefault.nbBits(llU(i)))
        w.push((mlU(i + 1) - MlDefault.newState(mlU(i))).toLong,
          MlDefault.nbBits(mlU(i)))
        w.push((ofU(i + 1) - OfDefault.newState(ofU(i))).toLong,
          OfDefault.nbBits(ofU(i)))
      }
      i += 1
    }
    val bits = w.render()
    out.write(bits, 0, bits.length)
    out.toByteArray
  }

  // ---- Huffman literal encoding (direct weights, 1 or 4 streams) ----------

  /** Plain Huffman code lengths over `freq` (two smallest merged until
    * one root; absent symbols get length 0). */
  private def plainHuffmanLengths(freq: Array[Long]): Array[Int] = {
    final case class Nd(f: Long, id: Int)
    implicit val ord: Ordering[Nd] = Ordering.by(n => (-n.f, -n.id))
    val pq = scala.collection.mutable.PriorityQueue.empty[Nd]
    val parent = new Array[Int](512)
    java.util.Arrays.fill(parent, -1)
    var next = 256
    for (s <- 0 until 256 if freq(s) > 0) pq.enqueue(Nd(freq(s), s))
    if (pq.size == 1) { // degenerate: a single symbol still needs 1 bit
      val lens = new Array[Int](256)
      lens(pq.head.id) = 1
      return lens
    }
    while (pq.size > 1) {
      val a = pq.dequeue(); val b = pq.dequeue()
      parent(a.id) = next; parent(b.id) = next
      pq.enqueue(Nd(a.f + b.f, next))
      next += 1
    }
    val lens = new Array[Int](256)
    for (s <- 0 until 256 if freq(s) > 0) {
      var d = 0
      var p = parent(s)
      while (p != -1) { d += 1; p = parent(p) }
      lens(s) = d
    }
    lens
  }

  /** Length-limited (≤ 11) Huffman via frequency halving: a true
    * Huffman tree is rebuilt over halved counts until it fits, so the
    * lengths stay Kraft-TIGHT (Σ 2^−len = 1) — exactly the property
    * the weight format's power-of-two completion requires. */
  private def huffmanLengths(freq0: Array[Long]): Array[Int] = {
    var freq = freq0
    var lens = plainHuffmanLengths(freq)
    while (lens.max > 11) {
      freq = freq.map(f => if (f == 0) 0L else math.max(1L, f >> 1))
      lens = plainHuffmanLengths(freq)
    }
    lens
  }

  /** One backward Huffman stream over `lits[from, from+count)`. */
  private def hufEncodeStream(lits: Array[Byte], from: Int, count: Int,
                              codes: Array[Int],
                              lens: Array[Int]): Array[Byte] = {
    val w = new BwdWriter
    var i = 0
    while (i < count) {
      val s = lits(from + i) & 0xff
      w.push(codes(s).toLong, lens(s))
      i += 1
    }
    w.render()
  }

  /** A Compressed_Literals_Block (type 2) for `lits`: per-block
    * Huffman table shipped as DIRECT 4-bit weights, codes derived from
    * the decoder's OWN canonical table build ([[buildHufTable]] over
    * the same weights), one stream under 1 KiB and the four-stream
    * layout above it. None when the direct-weight format cannot
    * express the alphabet (a single symbol; a present byte above 128 —
    * the 127 + n header ceiling) or the result does not shrink. */
  private def huffmanLiteralsSection(lits: Array[Byte]): Option[Array[Byte]] = {
    val regen = lits.length
    if (regen < 32 || regen > 262143) return None
    val freq = new Array[Long](256)
    lits.foreach(b => freq(b & 0xff) += 1)
    var maxSym = 255
    while (maxSym >= 0 && freq(maxSym) == 0) maxSym -= 1
    if ((0 to maxSym).count(freq(_) > 0) < 2) return None
    if (maxSym > 128) return None // direct weights carry at most 128 entries
    val lens = huffmanLengths(freq)
    var maxLen = 0
    for (s <- 0 to maxSym if freq(s) > 0) maxLen = math.max(maxLen, lens(s))
    val weights = Array.tabulate(maxSym + 1)(s =>
      if (freq(s) == 0) 0 else maxLen + 1 - lens(s))
    // Kraft-tightness check: the decoder derives the LAST weight from
    // power-of-two completion, so it must equal the one we assigned
    var explicitTotal = 0L
    for (s <- 0 until maxSym if weights(s) > 0)
      explicitTotal += 1L << (weights(s) - 1)
    val rest = (1L << maxLen) - explicitTotal
    if (rest != (1L << (weights(maxSym) - 1))) return None // not tight (unreachable)
    val table = buildHufTable(weights.init)
    // per-symbol (code, len) from the canonical table: symbol cells are
    // contiguous; code = first cell's prefix truncated to its length
    val codes = new Array[Int](256)
    val codeLens = new Array[Int](256)
    var idx = 0
    while (idx < (1 << table.tableLog)) {
      val s = table.symbol(idx) & 0xff
      if (codeLens(s) == 0) {
        val l = table.nbBits(idx).toInt
        codes(s) = idx >> (table.tableLog - l)
        codeLens(s) = l
      }
      idx += 1
    }
    val treeBytes = {
      val out = new java.io.ByteArrayOutputStream(2 + maxSym / 2)
      out.write(127 + maxSym) // n = maxSym explicit weights (symbols 0..maxSym-1)
      var i = 0
      while (i < maxSym) {
        val hi = weights(i)
        val lo = if (i + 1 < maxSym) weights(i + 1) else 0
        out.write((hi << 4) | lo)
        i += 2
      }
      out.toByteArray
    }
    val streams: Seq[Array[Byte]] =
      if (regen <= 1023) Seq(hufEncodeStream(lits, 0, regen, codes, codeLens))
      else {
        val seg = (regen + 3) / 4
        (0 until 4).map { i =>
          val cnt = if (i < 3) seg else regen - 3 * seg
          hufEncodeStream(lits, i * seg, cnt, codes, codeLens)
        }
      }
    val oneStream = streams.size == 1
    val jump =
      if (oneStream) Array.emptyByteArray
      else {
        val j = new Array[Byte](6)
        for (i <- 0 until 3) {
          val s = streams(i).length
          if (s > 0xffff) return None // jump-table field ceiling
          j(2 * i) = (s & 0xff).toByte
          j(2 * i + 1) = ((s >> 8) & 0xff).toByte
        }
        j
      }
    val csize = treeBytes.length + jump.length + streams.map(_.length).sum
    val header: Array[Byte] =
      if (oneStream) { // size_format 0: 10-bit sizes, 3-byte header
        if (csize > 1023) return None
        val h = 2 | (0 << 2) | (regen << 4) | (csize << 14)
        Array((h & 0xff).toByte, ((h >> 8) & 0xff).toByte,
          ((h >> 16) & 0xff).toByte)
      } else if (regen <= 16383 && csize <= 16383) { // format 2: 14-bit
        val h = 2 | (2 << 2) | (regen << 4) | (csize << 18)
        Array((h & 0xff).toByte, ((h >> 8) & 0xff).toByte,
          ((h >> 16) & 0xff).toByte, ((h >> 24) & 0xff).toByte)
      } else { // format 3: 18-bit sizes, 5-byte header
        if (csize > 262143) return None
        val h = 2L | (3L << 2) | (regen.toLong << 4) | (csize.toLong << 22)
        Array((h & 0xff).toByte, ((h >> 8) & 0xff).toByte,
          ((h >> 16) & 0xff).toByte, ((h >> 24) & 0xff).toByte,
          ((h >> 32) & 0xff).toByte)
      }
    val total = header.length + csize
    // only worth it when smaller than the raw section it replaces
    val rawSize = regen + (if (regen <= 31) 1 else if (regen <= 4095) 2 else 3)
    if (total >= rawSize) None
    else {
      val out = new Array[Byte](total)
      var p = 0
      for (part <- Seq(header, treeBytes, jump) ++ streams) {
        System.arraycopy(part, 0, out, p, part.length); p += part.length
      }
      Some(out)
    }
  }

  /** Raw-literals section header + bytes. */
  private def rawLiteralsSection(data: Array[Byte], off: Int,
                                 len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(len + 3)
    if (len <= 31) out.write(len << 3) // size_format 0, 1-byte header
    else if (len <= 4095) { // size_format 1, 12-bit size
      out.write(((len & 15) << 4) | (1 << 2))
      out.write((len >> 4) & 0xff)
    } else { // size_format 3, 20-bit size
      out.write(((len & 15) << 4) | (3 << 2))
      out.write((len >> 4) & 0xff)
      out.write((len >> 12) & 0xff)
    }
    out.write(data, off, len)
    out.toByteArray
  }

  private val MatchWindow = 1 << 27 // ofValue stays within OF code 28

  private def read32(a: Array[Byte], p: Int): Int =
    (a(p) & 0xff) | ((a(p + 1) & 0xff) << 8) |
      ((a(p + 2) & 0xff) << 16) | ((a(p + 3) & 0xff) << 24)

  private def hash4(a: Array[Byte], p: Int): Int =
    (read32(a, p) * 0x9E3779B1) >>> 16

  /** A real zstd compressor: single-segment frame, content checksum,
    * ≤128 KiB blocks of raw literals + greedy-LZ77 matches entropy-
    * coded with the predefined FSE tables. Deterministic; every block
    * that does not shrink ships RAW, so the frame never exceeds the
    * input by more than the per-block headers. */
  def compress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    def le(v: Long, n: Int): Unit =
      for (i <- 0 until n) out.write(((v >> (8 * i)) & 0xff).toInt)
    le(FrameMagic & 0xFFFFFFFFL, 4)
    val n = data.length
    val fcsFlag = if (n < 256) 0 else if (n < 65536 + 256) 1 else 2
    out.write((fcsFlag << 6) | 0x20 | 0x04) // single-segment + checksum
    fcsFlag match {
      case 0 => le(n, 1)
      case 1 => le(n - 256, 2)
      case _ => le(n, 4)
    }
    val head = new Array[Int](1 << 16) // hash4 -> position + 1, frame-wide
    var bs = 0
    do {
      val be = math.min(n, bs + MaxBlockSize)
      val lastBit = if (be >= n) 1 else 0
      // greedy matcher over [bs, be) against the whole frame history
      val seqs = scala.collection.immutable.IndexedSeq.newBuilder[Sq]
      var nSeqs = 0
      var anchor = bs
      var i = bs
      val limit = be - 4
      while (i < limit) {
        val h = hash4(data, i)
        val cand = head(h) - 1
        head(h) = i + 1
        if (cand >= 0 && i - cand <= MatchWindow &&
            read32(data, cand) == read32(data, i)) {
          var l = 4
          while (i + l < be && data(cand + l) == data(i + l)) l += 1
          seqs += Sq(i - anchor, (i - cand).toLong + 3, l)
          nSeqs += 1
          // index a couple of positions inside the match so runs and
          // periodic data keep finding themselves, then jump past it
          if (i + 1 < limit) head(hash4(data, i + 1)) = i + 2
          if (i + 2 < limit) head(hash4(data, i + 2)) = i + 3
          i += l
          anchor = i
        } else i += 1
      }
      val content = {
        val lits = new java.io.ByteArrayOutputStream(be - bs)
        var litFrom = bs
        val built = seqs.result()
        built.foreach { s =>
          lits.write(data, litFrom, s.litLen)
          litFrom += s.litLen + s.matchLen
        }
        lits.write(data, anchor, be - anchor) // trailing literals
        val litBytes = lits.toByteArray
        val sect = huffmanLiteralsSection(litBytes)
          .getOrElse(rawLiteralsSection(litBytes, 0, litBytes.length))
        val seqSect = encodeSequencesSection(built)
        val c = new Array[Byte](sect.length + seqSect.length)
        System.arraycopy(sect, 0, c, 0, sect.length)
        System.arraycopy(seqSect, 0, c, sect.length, seqSect.length)
        c
      }
      if (content.length < be - bs) {
        le((content.length.toLong << 3) | (2L << 1) | lastBit, 3) // Compressed
        out.write(content, 0, content.length)
      } else {
        le(((be - bs).toLong << 3) | lastBit, 3) // Raw fallback
        out.write(data, bs, be - bs)
      }
      bs = be
    } while (bs < n)
    le(xxh64(data, 0, n, 0L) & 0xFFFFFFFFL, 4)
    out.toByteArray
  }

  // ---- XXH64 (public xxHash spec; zstd checksums use seed 0) --------------

  private val P1 = 0x9E3779B185EBCA87L; private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L; private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  def xxh64(a: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))
    def round(acc: Long, lane: Long): Long = rotl(acc + lane * P2, 31) * P1
    val end = off + len
    var p = off
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2; var v3 = seed; var v4 = seed - P1
        while (p <= end - 32) {
          v1 = round(v1, le64(a, p)); v2 = round(v2, le64(a, p + 8))
          v3 = round(v3, le64(a, p + 16)); v4 = round(v4, le64(a, p + 24))
          p += 32
        }
        var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        acc = (acc ^ round(0, v1)) * P1 + P4
        acc = (acc ^ round(0, v2)) * P1 + P4
        acc = (acc ^ round(0, v3)) * P1 + P4
        acc = (acc ^ round(0, v4)) * P1 + P4
        acc
      } else seed + P5
    h += len
    while (p <= end - 8) { h = rotl(h ^ round(0, le64(a, p)), 27) * P1 + P4; p += 8 }
    if (p <= end - 4) {
      h = rotl(h ^ ((le32(a, p) & 0xFFFFFFFFL) * P1), 23) * P2 + P3; p += 4
    }
    while (p < end) { h = rotl(h ^ ((a(p) & 0xffL) * P5), 11) * P1; p += 1 }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }
}
