package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** CAVLC transcription and codec laws. The VLC constants in
  * [[H264Cavlc]] are hand-transcribed from the published spec tables;
  * these tests make a transcription slip a hard failure:
  *
  *  - every VLC table/row must be prefix-free and COMPLETE — Kraft sum
  *    exactly 1, or 1 − 2^−L with the single uncovered codeword being
  *    the all-zeros pattern (the structure the spec's tables share);
  *  - encode→decode must round-trip over randomized residual blocks in
  *    every coeff_token context, including the level-escape range and
  *    the run_before > 6 extension;
  *  - the Intra_16x16 DC-only chain at QP 28 must reconstruct the
  *    closed-form constant plane 128 + level the m12 oracle states.
  */
class H264CavlcSpec extends AnyFunSuite {

  // ---- table structure -------------------------------------------------

  private def checkTable(name: String, codes: Seq[String],
                         allowFreeAllZeros: Boolean = true): Unit = {
    assert(codes.distinct.size == codes.size, s"$name: duplicate codewords")
    for (a <- codes; b <- codes if a != b)
      assert(!b.startsWith(a), s"$name: '$a' is a prefix of '$b'")
    val kraft = codes.map(c => BigDecimal(1) / BigDecimal(BigInt(1) << c.length)).sum
    if (kraft == BigDecimal(1)) ()
    else {
      assert(allowFreeAllZeros, s"$name: incomplete (Kraft $kraft)")
      // exactly one free slot, and it must be the all-zeros codeword
      val maxLen = codes.map(_.length).max
      val frees = scala.collection.mutable.ArrayBuffer.empty[String]
      def walk(p: String): Unit =
        if (!codes.exists(c => p.startsWith(c))) {
          if (codes.exists(_.startsWith(p))) {
            if (p.length < maxLen) { walk(p + "0"); walk(p + "1") }
          } else frees += p
        }
      walk("")
      assert(frees.toSeq.forall(_.forall(_ == '0')) && frees.size <= 1,
        s"$name: unexpected uncovered codewords $frees (Kraft $kraft)")
      assert(frees.nonEmpty, s"$name: Kraft $kraft but no free slot found")
    }
  }

  test("coeff_token tables are prefix-free and complete") {
    def flat(t: Array[Array[String]]) =
      t.flatten.filter(_ != null).toSeq
    checkTable("coeff_token nC<2", flat(H264Cavlc.CoeffTokenN0))
    checkTable("coeff_token 2<=nC<4", flat(H264Cavlc.CoeffTokenN2))
    checkTable("coeff_token 4<=nC<8", flat(H264Cavlc.CoeffTokenN4))
    checkTable("coeff_token chroma DC", flat(H264Cavlc.CoeffTokenChromaDc),
      allowFreeAllZeros = false)
  }

  test("total_zeros tables are prefix-free and complete per row") {
    H264Cavlc.TotalZeros4x4.zipWithIndex.foreach { case (row, i) =>
      checkTable(s"total_zeros tc=${i + 1}", row.toSeq)
    }
    H264Cavlc.TotalZerosChromaDc.zipWithIndex.foreach { case (row, i) =>
      checkTable(s"total_zeros chromaDC tc=${i + 1}", row.toSeq,
        allowFreeAllZeros = false)
    }
  }

  test("run_before rows are prefix-free and complete") {
    H264Cavlc.RunBefore.take(6).zipWithIndex.foreach { case (row, i) =>
      checkTable(s"run_before zl=${i + 1}", row.toSeq, allowFreeAllZeros = false)
    }
    // zl > 6: the seven 3-bit codes plus the open "000…1" extension must
    // stay prefix-consistent
    val row7 = H264Cavlc.RunBefore(6).toSeq
    val ext = (7 to 14).map(r => "0" * (r - 4) + "1")
    checkTable("run_before zl>6", row7 ++ ext, allowFreeAllZeros = true)
  }

  // ---- residual block round-trip ---------------------------------------

  private def roundTrip(levels: Array[Int], nC: Int): Array[Int] = {
    val w = new H264.BitWriter
    H264Cavlc.encodeResidualBlock(w, levels, nC)
    w.trailing()
    val r = new H264.BitReader(w.toArray)
    H264Cavlc.decodeResidualBlock(r, nC, levels.length).levels
  }

  test("randomized residual blocks round-trip in every context") {
    val rnd = new Random(20260816L)
    val contexts = Seq(0, 1, 2, 3, 4, 7, 8, 16)
    for (_ <- 1 to 400; nC <- contexts) {
      val size = Seq(16, 15)(rnd.nextInt(2))
      val n = rnd.nextInt(size + 1)
      val levels = new Array[Int](size)
      val positions = rnd.shuffle((0 until size).toList).take(n)
      positions.foreach { p =>
        var v = 0
        while (v == 0) v = rnd.nextInt(41) - 20
        levels(p) = v
      }
      assert(roundTrip(levels, nC).toSeq == levels.toSeq,
        s"nC=$nC levels=${levels.mkString(",")}")
    }
  }

  test("chroma DC blocks (nC = -1) round-trip") {
    val rnd = new Random(7L)
    for (_ <- 1 to 300) {
      val levels = new Array[Int](4)
      val n = rnd.nextInt(5)
      rnd.shuffle((0 until 4).toList).take(n).foreach { p =>
        var v = 0
        while (v == 0) v = rnd.nextInt(13) - 6
        levels(p) = v
      }
      assert(roundTrip(levels, -1).toSeq == levels.toSeq, levels.mkString(","))
    }
  }

  test("level escape range round-trips (prefix >= 15, wide suffixes)") {
    for (v <- Seq(8, 16, 100, 2048, 2064, 4000, 30000, -8, -500, -33000)) {
      val levels = new Array[Int](16)
      levels(0) = v
      assert(roundTrip(levels, 0).toSeq == levels.toSeq, s"level $v")
      levels(5) = -3 // force a second, suffixLength-adapted level
      assert(roundTrip(levels, 0).toSeq == levels.toSeq, s"level $v + tail")
    }
  }

  test("run_before > 6 extension round-trips (sparse high-position coeffs)") {
    val levels = new Array[Int](16)
    levels(15) = 5; levels(2) = -4 // run of 12 zeros between coefficients
    assert(roundTrip(levels, 0).toSeq == levels.toSeq)
    val l2 = new Array[Int](16)
    l2(14) = 1; l2(0) = 1 // run 13 with trailing ones
    assert(roundTrip(l2, 0).toSeq == l2.toSeq)
  }

  // ---- end-to-end DC chain ---------------------------------------------

  test("Intra_16x16 DC-only at QP 28 reconstructs the constant plane 128 + L") {
    for (lvl <- Seq(-7, -3, -1, 0, 2, 7)) {
      val mbW = 2; val mbH = 1
      val zeroChromaDc = Array.fill(2)(new Array[Int](4))
      val zeroChromaAc = Array.fill(2, 4)(new Array[Int](16))
      def mb(dcLevel: Int) = H264Intra.I16Choice(
        predMode = 2, cbpLumaAc = false, cbpChroma = 0, qpDelta = 0,
        lumaDc = { val a = new Array[Int](16); a(0) = dcLevel; a },
        lumaAc = Array.fill(16)(new Array[Int](16)),
        chromaDc = zeroChromaDc, chromaAc = zeroChromaAc)
      // first MB carries the level; the second predicts from it with a
      // zero residual, so the whole plane must equal 128 + L
      val nal = H264.encodeIdrCavlcNal(mbW, mbH, initQp = 26, sliceQpDelta = 2,
        Seq(mb(lvl), mb(0)))
      val sps = H264.parseSps(H264.encodeSpsNal(32, 16))
      val f = H264.decodeIdr(nal, sps, initQp = 26)
      val expected = H264Intra.clip255(128 + lvl)
      assert(f.y.forall(b => (b & 0xff) == expected),
        s"level $lvl: got ${f.y.take(8).map(_ & 0xff).mkString(",")}")
      assert(f.cb.forall(b => (b & 0xff) == 128) && f.cr.forall(b => (b & 0xff) == 128))
    }
  }
}
