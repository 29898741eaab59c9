package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import scala.util.{Failure, Success, Try}

/** Untrusted-bytes hardening for the P-slice path (the
  * H264CavlcHardeningSpec discipline applied to the inter decoder's
  * new parse surfaces: mb_skip_run, sub_mb_types, mvd pairs, the inter
  * CBP, motion-compensated reads): every single-byte mutation and
  * every truncation of a valid P NAL must either decode to a
  * well-formed frame (bit flips can land on another legal stream) or
  * die as a clean IllegalArgumentException — never an
  * array/negative-size error, never a runaway allocation, never a
  * hang. Arbitrary mvds are legal bitstream (clamped edge extension
  * makes any vector a valid read), so the walls here are the skip-run
  * bound, the sub_mb_type range, the CBP range, CAVLC structure, and
  * the trailing-bits check. */
class H264InterHardeningSpec extends AnyFunSuite {

  /** The p_8x8 fixture: IDR + P NALs covering every inter parse path. */
  private lazy val fixture: (Seq[Array[Byte]], H264.Sps) = {
    val in = getClass.getResourceAsStream("/h264_p_fixtures.txt")
    assert(in != null)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val line = try src.getLines().find(_.startsWith("p_8x8 ")).get
    finally src.close()
    val p = line.split(" ")
    val nals = p(3).split(',').toSeq.map(
      _.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    (nals, H264.parseSps(H264.encodeSpsNal(p(1).toInt * 16, p(2).toInt * 16, numRefFrames = 1)))
  }

  private def decodeSeq(nals: Seq[Array[Byte]]): Seq[H264.Frame] =
    H264.decodeNals(Seq(H264.encodeSpsNal(fixture._2.mbWidth * 16,
      fixture._2.mbHeight * 16, numRefFrames = 1), H264.encodePpsNal()) ++ nals)

  private def outcomeOk(r: Try[Seq[H264.Frame]], what: String): Unit = r match {
    case Success(fs) =>
      fs.foreach(f => assert(f.width > 0 && f.height > 0 &&
        f.y.length == f.width * f.height, what))
    case Failure(_: IllegalArgumentException) => () // the clean wall
    case Failure(e) => fail(s"$what: unexpected ${e.getClass.getName}: ${e.getMessage}")
  }

  test("every single-byte mutation of a valid P NAL fails cleanly or decodes") {
    val (nals, _) = fixture
    val pNal = nals(1) // the first P picture
    var decoded = 0
    for (i <- 1 until pNal.length; bit <- Seq(0x55, 0x01)) {
      val m = pNal.clone()
      m(i) = (m(i) ^ bit).toByte
      val r = Try(decodeSeq(Seq(nals.head, m)))
      outcomeOk(r, s"mutation at byte $i (^$bit)")
      if (r.isSuccess) decoded += 1
    }
    assert(decoded < pNal.length, s"$decoded of ${2 * pNal.length} mutations decoded")
  }

  test("every truncation of a valid P NAL fails cleanly") {
    val (nals, _) = fixture
    val pNal = nals(1)
    for (len <- 2 until pNal.length) {
      outcomeOk(Try(decodeSeq(Seq(nals.head, java.util.Arrays.copyOf(pNal, len)))),
        s"truncation to $len bytes")
    }
  }

  test("random bytes through the P MB path fail cleanly (500 trials)") {
    val (nals, _) = fixture
    val rnd = new scala.util.Random(1515L)
    var decoded = 0
    for (_ <- 1 to 500) {
      val body = new Array[Byte](8 + rnd.nextInt(120))
      rnd.nextBytes(body)
      val nal = Array((2 << 5 | H264.NalNonIdr).toByte) ++ body
      val r = Try(decodeSeq(Seq(nals.head, nal)))
      outcomeOk(r, "random P NAL")
      if (r.isSuccess) decoded += 1
    }
    assert(decoded <= 1, s"$decoded random P NALs decoded")
  }
}
