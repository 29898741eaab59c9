package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import scala.util.{Failure, Success, Try}

/** Untrusted-bytes hardening for the CAVLC intra path (the
  * Mp4HardeningSpec discipline applied to the entropy decoder): every
  * single-byte mutation and every truncation of a valid CAVLC slice
  * must either decode to a well-formed frame (bit flips can land on
  * another legal stream — that is fine) or die as a clean
  * IllegalArgumentException — never an array/negative-size/class-cast
  * error, never a runaway allocation, never a hang. The decoder's
  * requires (RBSP underrun, codeword mismatch, scan-position bounds,
  * trailing-bits check) are the wall. */
class H264CavlcHardeningSpec extends AnyFunSuite {

  private lazy val fixture: (Array[Byte], H264.Sps) = {
    val in = getClass.getResourceAsStream("/h264_cavlc_fixtures.txt")
    assert(in != null)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val line = try src.getLines().find(_.startsWith("i4_rich ")).get
    finally src.close()
    val p = line.split(" ")
    val nal = p(4).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    (nal, H264.parseSps(H264.encodeSpsNal(p(1).toInt * 16, p(2).toInt * 16)))
  }

  private def outcomeOk(r: Try[H264.Frame], what: String): Unit = r match {
    case Success(f) =>
      // a mutated stream that still parses must still be a sane frame
      assert(f.width > 0 && f.height > 0 && f.y.length == f.width * f.height, what)
    case Failure(_: IllegalArgumentException) => () // the clean wall
    case Failure(e) => fail(s"$what: unexpected ${e.getClass.getName}: ${e.getMessage}")
  }

  test("every single-byte mutation of a valid CAVLC slice fails cleanly or decodes") {
    val (nal, sps) = fixture
    var decoded = 0
    for (i <- 1 until nal.length) { // byte 0 is the NAL header
      val m = nal.clone()
      m(i) = (m(i) ^ 0x55).toByte
      val r = Try(H264.decodeIdr(m, sps, initQp = 26))
      outcomeOk(r, s"mutation at byte $i")
      if (r.isSuccess) decoded += 1
    }
    // sanity: the wall actually rejects most mutations (a decoder that
    // silently accepted everything would pass the loop vacuously)
    assert(decoded < nal.length / 2, s"$decoded of ${nal.length} mutations decoded")
  }

  test("every truncation of a valid CAVLC slice fails cleanly") {
    val (nal, sps) = fixture
    for (len <- 2 until nal.length) {
      val r = Try(H264.decodeIdr(java.util.Arrays.copyOf(nal, len), sps, initQp = 26))
      outcomeOk(r, s"truncation to $len bytes")
    }
  }

  test("random bytes through the CAVLC MB path fail cleanly (500 trials)") {
    val (_, sps) = fixture
    val rnd = new scala.util.Random(1414L)
    var decoded = 0
    for (_ <- 1 to 500) {
      val body = new Array[Byte](8 + rnd.nextInt(120))
      rnd.nextBytes(body)
      val nal = Array((3 << 5 | H264.NalIdr).toByte) ++ body
      val r = Try(H264.decodeIdr(nal, sps, initQp = 26))
      outcomeOk(r, "random NAL")
      if (r.isSuccess) decoded += 1
    }
    // the trailing-bits + structure checks should reject essentially all
    assert(decoded <= 1, s"$decoded random NALs decoded")
  }
}
