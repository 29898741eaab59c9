package graft.multimodal

/** Deterministic synthetic media headers — the oracle-able face of the
  * binary-column plumbing: each id maps to a VALID container header
  * (PNG / GIF / BMP / WAV, cycling on id % 4) whose metadata fields are
  * pure arithmetic on the id, so a DuckDB oracle can state what
  * [[Multimodal.parseMeta]] must recover from the bytes without being
  * able to parse them itself. This closes the loop the binary fixtures
  * in the specs open: the sniff → parse path runs distributed, under
  * the correctness gate, on bytes built row-side (map-only — binary
  * columns never shuffle for metadata extraction).
  *
  * Headers are minimal but REAL: the same offsets/endianness production
  * files carry (PNG IHDR big-endian dims at 16/20; GIF89a logical
  * screen little-endian at 6/8; BITMAPINFOHEADER little-endian at
  * 18/22; canonical 44-byte WAV fmt/data layout), padded with a few
  * content bytes so length floors hold. */
object SyntheticMedia {

  /** The metadata formulas, shared by bytes() and the m2 oracle:
    * images get w = 1 + id % 1000, h = 1 + id % 97; WAV gets
    * channels = 1 + id % 2, sampleRate = 8000 + (id % 8) · 1000,
    * 16-bit samples, dataSize = 4000 + id % 512. */
  def width(id: Long): Int = (1 + id % 1000).toInt
  def height(id: Long): Int = (1 + id % 97).toInt
  def channels(id: Long): Int = (1 + id % 2).toInt
  def sampleRate(id: Long): Int = (8000 + (id % 8) * 1000).toInt
  def dataSize(id: Long): Int = (4000 + id % 512).toInt

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** A valid header for id (format cycles on id % 4). */
  def bytes(id: Long): Array[Byte] = (id % 4) match {
    case 0 => // PNG: signature + IHDR length/type + BE dims at 16/20
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        be32(13) ++ "IHDR".getBytes("US-ASCII") ++
        be32(width(id)) ++ be32(height(id)) ++
        Array[Byte](8, 2, 0, 0, 0) // bit depth, color type, ...
    case 1 => // GIF89a: LE uint16 logical-screen dims at 6/8
      "GIF89a".getBytes("US-ASCII") ++
        le16(width(id)) ++ le16(height(id)) ++ Array[Byte](0, 0, 0, 0x3b)
    case 2 => // BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, LE dims at 18/22
      "BM".getBytes("US-ASCII") ++ le32(54) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(width(id)) ++ le32(height(id)) ++
        le16(1) ++ le16(24) ++ le32(0)
    case _ => // WAV: canonical 44-byte RIFF/fmt/data layout
      val ch = channels(id); val sr = sampleRate(id); val ds = dataSize(id)
      val byteRate = sr * ch * 2
      "RIFF".getBytes("US-ASCII") ++ le32(36 + ds) ++
        "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++
        le16(1) ++ le16(ch) ++ le32(sr) ++ le32(byteRate) ++
        le16(ch * 2) ++ le16(16) ++
        "data".getBytes("US-ASCII") ++ le32(ds)
  }
}
