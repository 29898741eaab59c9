package graft.multimodal

/** CAVLC residual coding (ITU-T H.264 §9.2) for the intra-frame subset:
  * `coeff_token` (Table 9-5 — the three VLC columns for nC < 8, the
  * 6-bit `(TotalCoeff−1)·4 + TrailingOnes` FLC for nC ≥ 8, and the
  * chroma-DC nC = −1 column), trailing-one signs, the level
  * prefix/suffix state machine
  * (§9.2.2.1 including the level_prefix ≥ 15 escape), `total_zeros`
  * (Tables 9-7/9-8 for 4×4 blocks, Table 9-9(a) for 4:2:0 chroma DC)
  * and `run_before` (Table 9-10).
  *
  * The VLC constants are transcribed from the published spec tables and
  * machine-validated by [[graft.multimodal]] `H264CavlcTableSpec`:
  * every table/row must be prefix-free and COMPLETE — Kraft sum exactly
  * 1, or 1 − 2^−maxLen with the single free slot being the all-zeros
  * codeword (the structure the spec's tables share so that long zero
  * runs cannot alias a start code). A mislength or prefix-colliding
  * transcription cannot tile the code space and fails the spec.
  * Encode→decode round-trips are additionally sweep-tested, and the
  * cross-implementation fixtures (`scripts/h264_fixture_gen.py`) pin
  * the bits against an independent Python encoding.
  */
private[multimodal] object H264Cavlc {

  import H264.{BitReader, BitWriter}

  // ---- Table 9-5: coeff_token ------------------------------------------
  // rows = TotalCoeff 0..16; columns = TrailingOnes 0..3 (null where
  // TrailingOnes > min(TotalCoeff, 3)); codeword strings MSB-first.

  private[multimodal] val CoeffTokenN0: Array[Array[String]] = Array(
    Array("1", null, null, null),
    Array("000101", "01", null, null),
    Array("00000111", "000100", "001", null),
    Array("000000111", "00000110", "0000101", "00011"),
    Array("0000000111", "000000110", "00000101", "000011"),
    Array("00000000111", "0000000110", "000000101", "0000100"),
    Array("0000000001111", "00000000110", "0000000101", "00000100"),
    Array("0000000001011", "0000000001110", "00000000101", "000000100"),
    Array("0000000001000", "0000000001010", "0000000001101", "0000000100"),
    Array("00000000001111", "00000000001110", "0000000001001", "00000000100"),
    Array("00000000001011", "00000000001010", "00000000001101", "0000000001100"),
    Array("000000000001111", "000000000001110", "00000000001001", "00000000001100"),
    Array("000000000001011", "000000000001010", "000000000001101", "00000000001000"),
    Array("0000000000001111", "000000000000001", "000000000001001", "000000000001100"),
    Array("0000000000001011", "0000000000001110", "0000000000001101", "000000000001000"),
    Array("0000000000000111", "0000000000001010", "0000000000001001", "0000000000001100"),
    Array("0000000000000100", "0000000000000110", "0000000000000101", "0000000000001000"))

  private[multimodal] val CoeffTokenN2: Array[Array[String]] = Array(
    Array("11", null, null, null),
    Array("001011", "10", null, null),
    Array("000111", "00111", "011", null),
    Array("0000111", "001010", "001001", "0101"),
    Array("00000111", "000110", "000101", "0100"),
    Array("00000100", "0000110", "0000101", "00110"),
    Array("000000111", "00000110", "00000101", "001000"),
    Array("00000001111", "000000110", "000000101", "000100"),
    Array("00000001011", "00000001110", "00000001101", "0000100"),
    Array("000000001111", "00000001010", "00000001001", "000000100"),
    Array("000000001011", "000000001110", "000000001101", "00000001100"),
    Array("000000001000", "000000001010", "000000001001", "00000001000"),
    Array("0000000001111", "0000000001110", "0000000001101", "000000001100"),
    Array("0000000001011", "0000000001010", "0000000001001", "0000000001100"),
    Array("0000000000111", "00000000001011", "0000000000110", "0000000001000"),
    Array("00000000001001", "00000000001000", "00000000001010", "0000000000001"),
    Array("00000000000111", "00000000000110", "00000000000101", "00000000000100"))

  /** 4 ≤ nC < 8. Kraft sum is 1 − 2⁻¹⁰; the free slot is the
    * all-zeros 10-bit codeword (spec structure: long zero runs cannot
    * alias a coeff_token). */
  private[multimodal] val CoeffTokenN4: Array[Array[String]] = Array(
    Array("1111", null, null, null),
    Array("001111", "1110", null, null),
    Array("001011", "01111", "1101", null),
    Array("001000", "01100", "01110", "1100"),
    Array("0001111", "01010", "01011", "1011"),
    Array("0001011", "01000", "01001", "1010"),
    Array("0001001", "001110", "001101", "1001"),
    Array("0001000", "001010", "001001", "1000"),
    Array("00001111", "0001110", "0001101", "01101"),
    Array("00001011", "00001110", "0001010", "001100"),
    Array("000001111", "00001010", "00001101", "0001100"),
    Array("000001011", "000001110", "00001001", "00001100"),
    Array("000001000", "000001010", "000001101", "00001000"),
    Array("0000001101", "000000111", "000001001", "000001100"),
    Array("0000001001", "0000001100", "0000001011", "0000001010"),
    Array("0000000101", "0000001000", "0000000111", "0000000110"),
    Array("0000000001", "0000000100", "0000000011", "0000000010"))

  /** nC = −1 (4:2:0 chroma DC, 4-coefficient blocks). */
  private[multimodal] val CoeffTokenChromaDc: Array[Array[String]] = Array(
    Array("01", null, null, null),
    Array("000111", "1", null, null),
    Array("000100", "000110", "001", null),
    Array("000011", "0000011", "0000010", "000101"),
    Array("000010", "00000011", "00000010", "0000000"))

  // ---- Tables 9-7/9-8: total_zeros for 4×4 blocks ----------------------
  // rows = TotalCoeff 1..15; row i has 17−i entries (total_zeros 0..16−i)

  private[multimodal] val TotalZeros4x4: Array[Array[String]] = Array(
    Array("1", "011", "010", "0011", "0010", "00011", "00010", "000011",
      "000010", "0000011", "0000010", "00000011", "00000010", "000000011",
      "000000010", "000000001"),
    Array("111", "110", "101", "100", "011", "0101", "0100", "0011",
      "0010", "00011", "00010", "000011", "000010", "000001", "000000"),
    Array("0101", "111", "110", "101", "0100", "0011", "100", "011",
      "0010", "00011", "00010", "000001", "00001", "000000"),
    Array("00011", "111", "0101", "0100", "110", "101", "100", "0011",
      "011", "0010", "00010", "00001", "00000"),
    Array("0101", "0100", "0011", "111", "110", "101", "100", "011",
      "0010", "00001", "0001", "00000"),
    Array("000001", "00001", "111", "110", "101", "100", "011", "010",
      "0001", "001", "000000"),
    Array("000001", "00001", "101", "100", "011", "11", "010", "0001",
      "001", "000000"),
    Array("000001", "0001", "00001", "011", "11", "10", "010", "001",
      "000000"),
    Array("000001", "000000", "0001", "11", "10", "001", "01", "00001"),
    Array("00001", "00000", "001", "11", "10", "01", "0001"),
    Array("0000", "0001", "001", "010", "1", "011"),
    Array("0000", "0001", "01", "1", "001"),
    Array("000", "001", "1", "01"),
    Array("00", "01", "1"),
    Array("0", "1"))

  /** Table 9-9(a): total_zeros for 4:2:0 chroma DC (TotalCoeff 1..3). */
  private[multimodal] val TotalZerosChromaDc: Array[Array[String]] = Array(
    Array("1", "01", "001", "000"),
    Array("1", "01", "00"),
    Array("1", "0"))

  // ---- Table 9-10: run_before ------------------------------------------
  // rows = min(zerosLeft, 7) − 1; last row extends with k zeros + "1"
  // for run_before 7..14 (handled in code).

  private[multimodal] val RunBefore: Array[Array[String]] = Array(
    Array("1", "0"),
    Array("1", "01", "00"),
    Array("11", "10", "01", "00"),
    Array("11", "10", "01", "001", "000"),
    Array("11", "10", "011", "010", "001", "000"),
    Array("11", "000", "001", "011", "010", "101", "100"),
    Array("111", "110", "101", "100", "011", "010", "001"))

  // ---- VLC helpers -----------------------------------------------------

  private def writeCode(w: BitWriter, code: String): Unit =
    code.foreach(c => w.bit(c - '0'))

  /** Decode one codeword from a (complete, prefix-free) string table:
    * extend bit by bit until a unique match. Tables are tiny (≤ 62
    * entries); linear probing is fine at this layer's call rate. */
  private def readCode(r: BitReader, entries: Seq[(String, Int)]): Int = {
    val maxLen = entries.iterator.map(_._1.length).max
    val sb = new StringBuilder
    while (sb.length < maxLen) {
      sb.append(('0' + r.bit()).toChar)
      val s = sb.toString
      entries.find(_._1 == s) match {
        case Some((_, v)) => return v
        case None => ()
      }
    }
    throw new IllegalArgumentException(
      s"CAVLC: no codeword matches bit pattern $sb")
  }

  private def tokenEntries(tab: Array[Array[String]]): Seq[(String, Int)] =
    for {
      tc <- tab.indices
      t1 <- 0 until 4
      if tab(tc)(t1) != null
    } yield (tab(tc)(t1), tc * 4 + t1)

  private lazy val N0Entries = tokenEntries(CoeffTokenN0)
  private lazy val N2Entries = tokenEntries(CoeffTokenN2)
  private lazy val N4Entries = tokenEntries(CoeffTokenN4)
  private lazy val CdcEntries = tokenEntries(CoeffTokenChromaDc)

  /** One decoded residual block: coefficient levels in SCAN order
    * (zig-zag for 4×4; raster for the 2×2 chroma DC), length =
    * maxNumCoeff, plus the block's TotalCoeff (the neighbor-nC datum). */
  final case class ResidualBlock(levels: Array[Int], totalCoeff: Int)

  /** Decode `residual_block_cavlc` (§9.2). `nC` selects the
    * coeff_token context (−1 = chroma DC). */
  def decodeResidualBlock(r: BitReader, nC: Int, maxNumCoeff: Int): ResidualBlock = {
    require(maxNumCoeff == 4 || maxNumCoeff == 15 || maxNumCoeff == 16,
      s"maxNumCoeff $maxNumCoeff")
    // coeff_token → (TotalCoeff, TrailingOnes)
    val token =
      if (nC == -1) readCode(r, CdcEntries)
      else if (nC < 2) readCode(r, N0Entries)
      else if (nC < 4) readCode(r, N2Entries)
      else if (nC < 8) readCode(r, N4Entries)
      else { // nC ≥ 8: the 6-bit (TotalCoeff−1)·4 + TrailingOnes FLC
        val v = r.u(6)
        if (v == 3) 0 else { val tc = (v >> 2) + 1; tc * 4 + (v & 3) }
      }
    val totalCoeff = token / 4
    val trailingOnes = token % 4
    require(totalCoeff <= maxNumCoeff,
      s"CAVLC: TotalCoeff $totalCoeff exceeds maxNumCoeff $maxNumCoeff")
    // only the 6-bit enumeration can produce this shape (the VLC tables
    // have no such entries); it is not a valid coeff_token
    require(trailingOnes <= totalCoeff,
      s"CAVLC: TrailingOnes $trailingOnes exceeds TotalCoeff $totalCoeff")
    val levels = new Array[Int](maxNumCoeff)
    if (totalCoeff == 0) return ResidualBlock(levels, 0)

    // levels, highest-frequency first (§9.2.2)
    val levelVal = new Array[Int](totalCoeff)
    var i = 0
    while (i < trailingOnes) {
      levelVal(i) = if (r.bit() == 1) -1 else 1
      i += 1
    }
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    while (i < totalCoeff) {
      var levelPrefix = 0
      while (r.bit() == 0) {
        levelPrefix += 1
        require(levelPrefix <= 31, "CAVLC: level_prefix run too long")
      }
      var levelCode = math.min(15, levelPrefix) << suffixLength
      if (suffixLength > 0 || levelPrefix >= 14) {
        val levelSuffixSize =
          if (levelPrefix == 14 && suffixLength == 0) 4
          else if (levelPrefix >= 15) levelPrefix - 3
          else suffixLength
        levelCode += r.u(levelSuffixSize)
      }
      if (levelPrefix >= 15 && suffixLength == 0) levelCode += 15
      if (levelPrefix >= 16) levelCode += (1 << (levelPrefix - 3)) - 4096
      if (i == trailingOnes && trailingOnes < 3) levelCode += 2
      levelVal(i) =
        if (levelCode % 2 == 0) (levelCode + 2) >> 1 else -((levelCode + 1) >> 1)
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(levelVal(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }

    // total_zeros
    val totalZeros =
      if (totalCoeff == maxNumCoeff) 0
      else if (maxNumCoeff == 4)
        readCodeRow(r, TotalZerosChromaDc(totalCoeff - 1))
      else readCodeRow(r, TotalZeros4x4(totalCoeff - 1))

    // run_before per coefficient, last run implied
    var zerosLeft = totalZeros
    val runs = new Array[Int](totalCoeff)
    i = 0
    while (i < totalCoeff - 1 && zerosLeft > 0) {
      runs(i) = readRunBefore(r, zerosLeft)
      zerosLeft -= runs(i)
      i += 1
    }
    runs(totalCoeff - 1) = zerosLeft

    // place into scan positions: coefficients were read highest
    // frequency first; walk backwards from the top filled position
    var pos = totalCoeff - 1 + totalZeros
    i = 0
    while (i < totalCoeff) {
      require(pos >= 0 && pos < maxNumCoeff, s"CAVLC: scan position $pos")
      levels(pos) = levelVal(i)
      pos -= 1 + runs(i)
      i += 1
    }
    ResidualBlock(levels, totalCoeff)
  }

  private def readCodeRow(r: BitReader, row: Array[String]): Int =
    readCode(r, row.zipWithIndex.map { case (s, i) => (s, i) }.toSeq)

  private def readRunBefore(r: BitReader, zerosLeft: Int): Int = {
    val zl = math.min(zerosLeft, 7)
    if (zl < 7) readCodeRow(r, RunBefore(zl - 1))
    else {
      // zerosLeft > 6: 3-bit codes "111".."001" give run 0..6 (run =
      // 7 − value); "000" extends as (run − 4) zeros then a 1 for
      // run 7..14 (code length run − 3)
      val v = r.u(3)
      if (v > 0) 7 - v
      else {
        var run = 7
        while (r.bit() == 0) {
          run += 1
          require(run <= 14, "CAVLC: run_before exceeds 14")
        }
        run
      }
    }
  }

  // ---- encode ----------------------------------------------------------

  /** Encode `residual_block_cavlc` for `levels` given in scan order.
    * Returns TotalCoeff (the datum neighbors need for nC). */
  def encodeResidualBlock(w: BitWriter, levels: Array[Int], nC: Int): Int = {
    val maxNumCoeff = levels.length
    require(maxNumCoeff == 4 || maxNumCoeff == 15 || maxNumCoeff == 16,
      s"maxNumCoeff $maxNumCoeff")
    // gather coefficients highest frequency first
    val nz = levels.zipWithIndex.filter(_._1 != 0).reverse
    val totalCoeff = nz.length
    require(totalCoeff <= (if (nC == -1) 4 else 16), "too many coefficients")
    // trailing ones: up to 3 leading (highest-frequency) ±1 values
    var trailingOnes = 0
    while (trailingOnes < math.min(3, totalCoeff) &&
      math.abs(nz(trailingOnes)._1) == 1) trailingOnes += 1

    // coeff_token
    if (nC == -1) writeCode(w, CoeffTokenChromaDc(totalCoeff)(trailingOnes))
    else if (nC < 2) writeCode(w, CoeffTokenN0(totalCoeff)(trailingOnes))
    else if (nC < 4) writeCode(w, CoeffTokenN2(totalCoeff)(trailingOnes))
    else if (nC < 8) writeCode(w, CoeffTokenN4(totalCoeff)(trailingOnes))
    else w.u(if (totalCoeff == 0) 3 else (totalCoeff - 1) * 4 + trailingOnes, 6)
    if (totalCoeff == 0) return 0

    var i = 0
    while (i < trailingOnes) { w.bit(if (nz(i)._1 < 0) 1 else 0); i += 1 }
    var suffixLength = if (totalCoeff > 10 && trailingOnes < 3) 1 else 0
    while (i < totalCoeff) {
      val level = nz(i)._1
      var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (i == trailingOnes && trailingOnes < 3) {
        require(levelCode >= 2, s"level ±1 outside the trailing-ones slots")
        levelCode -= 2
      }
      // emit prefix/suffix per §9.2.2.1 (inverse of the decode cases);
      // at suffixLength 0 a prefix of 14 means "4-bit suffix follows",
      // so the plain-prefix form stops at 13 there
      if (levelCode < (if (suffixLength == 0) 14 else 15 << suffixLength)) {
        val prefix = levelCode >> suffixLength
        w.u(0, prefix); w.bit(1)
        if (suffixLength > 0) w.u(levelCode & ((1 << suffixLength) - 1), suffixLength)
      } else if (suffixLength == 0 && levelCode < 30) {
        // level_prefix = 14, 4-bit suffix
        w.u(0, 14); w.bit(1)
        w.u(levelCode - 14, 4)
      } else {
        // escape: level_prefix = p ≥ 15, suffix size p − 3. The decoder
        // computes lc = (15 << s) + suffix + extra(p) (+15 when s = 0),
        // extra(15) = 0, extra(p ≥ 16) = 2^(p−3) − 4096 — the ranges
        // tile contiguously, so p is the unique prefix whose window
        // holds the remainder
        val lcAdj = if (suffixLength == 0) levelCode - 15 else levelCode
        val rem = lcAdj - (15 << suffixLength)
        require(rem >= 0, s"escape remainder $rem")
        var p = 15
        def extra(q: Int) = if (q >= 16) (1 << (q - 3)) - 4096 else 0
        while (p < 28 && rem - extra(p) >= (1 << (p - 3))) p += 1
        w.u(0, p); w.bit(1)
        w.u(rem - extra(p), p - 3)
      }
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }

    // total_zeros: zeros below the highest nonzero scan position
    val highest = nz.head._2
    val totalZeros = highest + 1 - totalCoeff
    if (totalCoeff < maxNumCoeff) {
      if (maxNumCoeff == 4) writeCode(w, TotalZerosChromaDc(totalCoeff - 1)(totalZeros))
      else writeCode(w, TotalZeros4x4(totalCoeff - 1)(totalZeros))
    }

    // run_before per coefficient (all but the lowest), zerosLeft shrinking
    var zerosLeft = totalZeros
    i = 0
    while (i < totalCoeff - 1 && zerosLeft > 0) {
      val run = nz(i)._2 - nz(i + 1)._2 - 1
      writeRunBefore(w, run, zerosLeft)
      zerosLeft -= run
      i += 1
    }
    totalCoeff
  }

  private def writeRunBefore(w: BitWriter, run: Int, zerosLeft: Int): Unit = {
    val zl = math.min(zerosLeft, 7)
    require(run >= 0 && run <= zerosLeft && run <= 14, s"run_before $run of $zerosLeft")
    if (zl < 7) writeCode(w, RunBefore(zl - 1)(run))
    else if (run < 7) writeCode(w, RunBefore(6)(run))
    else { w.u(0, run - 4); w.bit(1) } // run 7..14: (run−4) zeros then a 1
  }
}
