package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import scala.util.{Failure, Success, Try}

/** Untrusted-bytes hardening for the B-slice path (the
  * H264InterHardeningSpec discipline applied to the bi-prediction
  * decoder's new parse surfaces: the direct flag, per-list override /
  * reordering flags, B mb_types, per-list mvd pairs, the inter CBP
  * over direct MBs): every single-byte mutation and every truncation
  * of a valid B NAL must either decode to a well-formed frame or die
  * as a clean IllegalArgumentException — never an array/negative-size
  * error, never a runaway allocation, never a hang. */
class H264BInterHardeningSpec extends AnyFunSuite {

  /** The b_mixed fixture: IDR + P + B NALs covering every B parse path. */
  private lazy val fixture: (Seq[Array[Byte]], Int, Int) = {
    val in = getClass.getResourceAsStream("/h264_b_fixtures.txt")
    assert(in != null)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val line = try src.getLines().find(_.startsWith("b_mixed ")).get
    finally src.close()
    val p = line.split(" ")
    val nals = p(3).split(',').toSeq.map(
      _.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    (nals, p(1).toInt * 16, p(2).toInt * 16)
  }

  private def decodeSeq(nals: Seq[Array[Byte]]): Seq[H264.Frame] =
    H264.decodeNals(Seq(H264.encodeSpsNal(fixture._2, fixture._3,
      numRefFrames = 2), H264.encodePpsNal()) ++ nals)

  private def outcomeOk(r: Try[Seq[H264.Frame]], what: String): Unit = r match {
    case Success(fs) =>
      fs.foreach(f => assert(f.width > 0 && f.height > 0 &&
        f.y.length == f.width * f.height, what))
    case Failure(_: IllegalArgumentException) => () // the clean wall
    case Failure(e) => fail(s"$what: unexpected ${e.getClass.getName}: ${e.getMessage}")
  }

  test("every single-byte mutation of a valid B NAL fails cleanly or decodes") {
    val (nals, _, _) = fixture
    val prefix = nals.take(2) // IDR + P (the two references)
    val bNal = nals(2)        // the first B picture
    var decoded = 0
    for (i <- 1 until bNal.length; bit <- Seq(0x55, 0x01)) {
      val m = bNal.clone()
      m(i) = (m(i) ^ bit).toByte
      val r = Try(decodeSeq(prefix :+ m))
      outcomeOk(r, s"mutation at byte $i (^$bit)")
      if (r.isSuccess) decoded += 1
    }
    assert(decoded < bNal.length, s"$decoded of ${2 * bNal.length} mutations decoded")
  }

  test("every truncation of a valid B NAL fails cleanly") {
    val (nals, _, _) = fixture
    val prefix = nals.take(2)
    val bNal = nals(2)
    for (len <- 2 until bNal.length) {
      outcomeOk(Try(decodeSeq(prefix :+ java.util.Arrays.copyOf(bNal, len))),
        s"truncation to $len bytes")
    }
  }

  test("random bytes through the B MB path fail cleanly (500 trials)") {
    val (nals, _, _) = fixture
    val prefix = nals.take(2)
    val rnd = new scala.util.Random(1616L)
    var decoded = 0
    for (_ <- 1 to 500) {
      val body = new Array[Byte](8 + rnd.nextInt(120))
      rnd.nextBytes(body)
      // nal_ref_idc 0 (a non-reference slice NAL, the B wrapper shape)
      val nal = Array(H264.NalNonIdr.toByte) ++ body
      val r = Try(decodeSeq(prefix :+ nal))
      outcomeOk(r, "random B NAL")
      if (r.isSuccess) decoded += 1
    }
    assert(decoded <= 1, s"$decoded random B NALs decoded")
  }
}
