package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[SyntheticMedia]] headers must round-trip through the REAL
  * sniff→parse path: the m2 oracle's arithmetic is only a valid oracle
  * if parseMeta recovers exactly these fields from the bytes. */
class SyntheticMediaSpec extends AnyFunSuite {

  test("every format round-trips: parseMeta(bytes(id)) recovers the formulas") {
    (0L until 64L).foreach { id =>
      val m = Multimodal.parseMeta(SyntheticMedia.bytes(id))
      (id % 4) match {
        case 0 => assert(m.mediaType == "image/png")
        case 1 => assert(m.mediaType == "image/gif")
        case 2 => assert(m.mediaType == "image/bmp")
        case _ => assert(m.mediaType == "audio/wav")
      }
      if (id % 4 < 3) {
        assert(m.width == SyntheticMedia.width(id), s"id=$id width")
        assert(m.height == SyntheticMedia.height(id), s"id=$id height")
      } else {
        assert(m.channels == SyntheticMedia.channels(id), s"id=$id channels")
        assert(m.sampleRate == SyntheticMedia.sampleRate(id), s"id=$id rate")
        val byteRate = SyntheticMedia.sampleRate(id) * SyntheticMedia.channels(id) * 2
        assert(m.durationMs ==
          SyntheticMedia.dataSize(id).toLong * 1000 / byteRate, s"id=$id durMs")
      }
    }
  }

  test("dims exercise the full formula range, incl. multi-byte widths") {
    // width crosses 255 so the second little/big-endian byte is live
    val wide = 400L // id % 4 == 0 → PNG, width 401
    val m = Multimodal.parseMeta(SyntheticMedia.bytes(wide))
    assert(m.width == 1 + wide % 1000 && m.width > 255)
    val gif = 401L // GIF, width 402
    assert(Multimodal.parseMeta(SyntheticMedia.bytes(gif)).width > 255)
  }

  test("headers satisfy the parser's length floors") {
    (0L until 4L).foreach { id =>
      val b = SyntheticMedia.bytes(id)
      assert(b.length >= 12, "sniff floor")
      (id % 4) match {
        case 0 => assert(b.length >= 24)
        case 1 => assert(b.length >= 10)
        case 2 => assert(b.length >= 26)
        case _ => assert(b.length >= 44)
      }
    }
  }
}
