package graft.kafka

import org.scalatest.funsuite.AnyFunSuite

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.util.concurrent.{ArrayBlockingQueue, TimeUnit}

import Wire.WireRecord

/** Cross-implementation wire check. `scripts/kafka_fixture_gen.py` is a
  * SECOND, independent encoding of the public Kafka protocol (v0 apis,
  * MessageSet v1, murmur2) sharing no code with [[Wire]] — its committed
  * byte fixtures are replayed here in both directions:
  *
  *  - broker side: the Python-encoded request bytes go down a real TCP
  *    socket to a fresh [[MiniBroker]], and every response must be
  *    byte-exact equal to the Python-computed expectation (the metadata
  *    response compares around a 4-byte hole for the ephemeral port);
  *  - client side: [[MiniKafkaClient]] talks to a scripted socket server
  *    that asserts the client's produce/fetch requests are byte-exact
  *    equal to the Python encoding and answers with Python-built
  *    responses the client must parse (CRCs included).
  *
  * This closes the "both ends are this repo's code" loop as far as an
  * offline environment allows: a framing/width/CRC bug that cancels out
  * between the repo's encoder and decoder cannot cancel against an
  * implementation in another language built from the spec text. */
class KafkaFixtureInteropSpec extends AnyFunSuite {

  private lazy val fx: Map[String, Array[Byte]] = {
    val in = getClass.getResourceAsStream("/kafka_wire_fixtures.txt")
    assert(in != null, "kafka_wire_fixtures.txt missing — run scripts/kafka_fixture_gen.py")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { l =>
      val Array(name, hex) = l.trim.split(" ", 2)
      name -> hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }.toMap
    finally src.close()
  }

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private val records = Seq(
    WireRecord(0L, 1000L, "k1".getBytes("UTF-8"), "v1".getBytes("UTF-8")),
    WireRecord(0L, 1001L, null, "v2".getBytes("UTF-8")),
    WireRecord(0L, 1002L, "k3".getBytes("UTF-8"), null))

  test("broker answers an independently-encoded session byte-exactly") {
    val broker = new MiniBroker(numPartitions = 2)
    try {
      val sock = new Socket("localhost", broker.port)
      sock.setTcpNoDelay(true)
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      def roundTrip(reqName: String, respName: String): Array[Byte] = {
        out.write(fx(reqName)); out.flush() // raw Python bytes, prefix included
        val size = in.readInt()
        val resp = new Array[Byte](size)
        in.readFully(resp)
        val want = fx(respName)
        if (respName == "metadata_resp") {
          val hole = be32(fx("metadata_resp_port_hole"), 0)
          assert(resp.length == want.length, s"$respName length")
          for (i <- resp.indices if i < hole || i >= hole + 4)
            assert(resp(i) == want(i), s"$respName byte $i")
        } else
          assert(java.util.Arrays.equals(resp, want),
            s"$respName differs from the spec-derived bytes")
        resp
      }
      roundTrip("apiversions_req", "apiversions_resp")
      val meta = roundTrip("metadata_req", "metadata_resp")
      // the hole really is the live port
      val hole = be32(fx("metadata_resp_port_hole"), 0)
      assert(be32(meta, hole) == broker.port)
      roundTrip("produce_req", "produce_resp")
      roundTrip("fetch_req", "fetch_resp")
      roundTrip("listoffsets_req", "listoffsets_resp")
      // a compression.type=gzip producer batch (Python-gzipped wrapper,
      // KIP-31 relative offsets): broker unwraps, appends at base 3, and
      // a fetch from 3 returns the records PLAIN with producer timestamps
      roundTrip("produce_gzip_req", "produce_gzip_resp")
      roundTrip("fetch_gzip_req", "fetch_gzip_resp")
      // a pre-0.10 magic-0 batch (no timestamp field): accepted, stored
      // with ts = −1, fetched back up-converted to magic 1
      roundTrip("produce_v0_req", "produce_v0_resp")
      roundTrip("fetch_v0_req", "fetch_v0_resp")
      // a compression.type=snappy batch (Python xerial framing with real
      // copy-2 elements) and a compression.type=lz4 batch (Python frame
      // format with real matches): broker unwraps both via the from-spec
      // BlockCodecs decoders and stores plain
      roundTrip("produce_snappy_req", "produce_snappy_resp")
      roundTrip("fetch_snappy_req", "fetch_snappy_resp")
      roundTrip("produce_lz4_req", "produce_lz4_resp")
      roundTrip("fetch_lz4_req", "fetch_lz4_resp")
      sock.close()
    } finally broker.close()
  }

  test("snappy and lz4 produce via the Scala client round-trip end-to-end") {
    val broker = new MiniBroker(numPartitions = 2)
    val client = new MiniKafkaClient("localhost", broker.port)
    try {
      assert(client.produce("sn", 0, records, codec = 2) == 0L)
      val sn = client.fetch("sn", 0, 0L)
      assert(sn.map(r => (r.offset, r.timestamp)) == Seq((0L, 1000L), (1L, 1001L), (2L, 1002L)))
      assert(new String(sn(1).value, "UTF-8") == "v2" && sn(2).value == null)
      assert(client.produce("lz", 0, records, codec = 3) == 0L)
      val lz = client.fetch("lz", 0, 0L)
      assert(lz.map(_.offset) == Seq(0L, 1L, 2L))
      assert(new String(lz(0).key, "UTF-8") == "k1")
    } finally { client.close(); broker.close() }
  }

  test("v2 record batches (magic 2) decode across every codec, byte-built in Python") {
    // the shared recipe, restated from the generator
    val want = Seq(
      WireRecord(0L, 5000L, "vk1".getBytes("UTF-8"), "vv1".getBytes("UTF-8")),
      WireRecord(1L, 5001L, null, "vv2".getBytes("UTF-8")),
      WireRecord(2L, 5002L, "vk3".getBytes("UTF-8"), null))
    def eq(a: Seq[WireRecord], b: Seq[WireRecord], what: String): Unit = {
      assert(a.size == b.size, what)
      a.zip(b).foreach { case (x, y) =>
        assert(x.offset == y.offset && x.timestamp == y.timestamp &&
          java.util.Arrays.equals(x.key, y.key) &&
          java.util.Arrays.equals(x.value, y.value), s"$what: $x vs $y")
      }
    }
    Seq("v2_plain", "v2_gzip", "v2_snappy", "v2_lz4", "v2_headers").foreach { f =>
      eq(Wire.decodeMessageSet(fx(f)), want, f)
    }
    // control batches (transaction markers) are skipped wholesale
    assert(Wire.decodeMessageSet(fx("v2_control")).isEmpty)
    // a broker-log-shaped buffer interleaving v1, v2 and v0 entries
    val mixed = Wire.decodeMessageSet(fx("v2_interleaved"))
    assert(mixed.map(_.offset) == Seq(0L, 1L, 2L, 3L), mixed.map(_.offset))
    assert(new String(mixed(1).key, "UTF-8") == "vk1" && mixed(2).key == null)
    // the Scala encoder reproduces the Python bytes for the codecs with
    // deterministic shared encoders (gzip deflate bytes are
    // library-specific, so gzip is held to decode-identity instead)
    assert(java.util.Arrays.equals(RecordBatchV2.encode(want, codec = 0), fx("v2_plain")))
    assert(java.util.Arrays.equals(RecordBatchV2.encode(want, codec = 2), fx("v2_snappy")))
    assert(java.util.Arrays.equals(RecordBatchV2.encode(want, codec = 3), fx("v2_lz4")))
    eq(Wire.decodeMessageSet(RecordBatchV2.encode(want, codec = 1)), want, "gzip self")
    // CRC32C corruption is rejected loudly
    val bad = fx("v2_plain").clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x55).toByte
    val e = intercept[IllegalArgumentException](Wire.decodeMessageSet(bad))
    assert(e.getMessage.contains("CRC32C"))
  }

  test("a v2 producer batch goes through the broker end-to-end") {
    val broker = new MiniBroker(numPartitions = 1)
    try {
      val sock = new Socket("localhost", broker.port)
      sock.setTcpNoDelay(true)
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      // Produce v0 whose partition data is a Python-built v2 batch — the
      // modern producer's record format arriving at the v0-era api
      val body = new Wire.Buf
      body.int16(1); body.int32(10000)
      body.int32(1).string("v2t")
      body.int32(1).int32(0)
      body.bytes(fx("v2_snappy"))
      val payload = new Wire.Buf
      payload.int16(Wire.ApiProduce); payload.int16(0); payload.int32(1)
      payload.string("graft"); payload.raw(body.toArray)
      Wire.writeFrame(out, payload.toArray)
      val resp = Wire.readFrame(in).get
      val r = new Wire.Reader(java.nio.ByteBuffer.wrap(resp))
      r.int32() // correlation id
      r.int32(); r.string(); r.int32(); r.int32()
      assert(r.int16() == Wire.ErrNone, "produce error")
      assert(r.int64() == 0L, "base offset")
      sock.close()
      val client = new MiniKafkaClient("localhost", broker.port)
      try {
        val got = client.fetch("v2t", 0, 0L)
        assert(got.map(r0 => (r0.offset, r0.timestamp)) ==
          Seq((0L, 5000L), (1L, 5001L), (2L, 5002L)))
        assert(new String(got(0).key, "UTF-8") == "vk1" && got(2).value == null)
      } finally client.close()
    } finally broker.close()
  }

  test("BlockCodecs decode the independent Python snappy/lz4 streams byte-exactly") {
    val plain = fx("codec_plain")
    // raw block and xerial framing, both with REAL copy elements
    assert(java.util.Arrays.equals(
      BlockCodecs.snappyRawDecompress(fx("snappy_raw_fx"), Wire.MaxFrame), plain))
    assert(java.util.Arrays.equals(
      BlockCodecs.snappyDecompress(fx("snappy_xerial_fx"), Wire.MaxFrame), plain))
    // lz4 frame with spec header checksum AND the KAFKA-3160 legacy one
    assert(java.util.Arrays.equals(
      BlockCodecs.lz4FrameDecompress(fx("lz4_frame_fx"), Wire.MaxFrame), plain))
    assert(java.util.Arrays.equals(
      BlockCodecs.lz4FrameDecompress(fx("lz4_frame_legacy_fx"), Wire.MaxFrame), plain))
    // the Scala encoders' output is decoded by the same from-spec
    // decoders (identity), and corruption dies loudly, not quietly
    assert(java.util.Arrays.equals(
      BlockCodecs.snappyDecompress(BlockCodecs.snappyCompress(plain), Wire.MaxFrame), plain))
    assert(java.util.Arrays.equals(
      BlockCodecs.lz4FrameDecompress(BlockCodecs.lz4FrameCompress(plain), Wire.MaxFrame), plain))
    val bad = fx("lz4_frame_fx").clone(); bad(6) = (bad(6) ^ 0x55).toByte // header checksum byte
    val e = intercept[IllegalArgumentException](
      BlockCodecs.lz4FrameDecompress(bad, Wire.MaxFrame))
    assert(e.getMessage.contains("checksum"))
    val badSn = fx("snappy_raw_fx").clone()
    badSn(badSn.length - 1) = (badSn(badSn.length - 1) ^ 0x55).toByte
    intercept[IllegalArgumentException](
      BlockCodecs.snappyRawDecompress(java.util.Arrays.copyOf(badSn, badSn.length - 2),
        Wire.MaxFrame))
  }

  test("gzip produce via the Scala client round-trips end-to-end") {
    val broker = new MiniBroker(numPartitions = 2)
    val client = new MiniKafkaClient("localhost", broker.port)
    try {
      assert(client.produce("gz", 0, records, gzip = true) == 0L)
      val fetched = client.fetch("gz", 0, 0L)
      assert(fetched.map(_.offset) == Seq(0L, 1L, 2L))
      assert(fetched.map(_.timestamp) == Seq(1000L, 1001L, 1002L))
      assert(new String(fetched.head.value, "UTF-8") == "v1")
      assert(fetched(1).key == null)
      assert(fetched(2).value == null)
    } finally { client.close(); broker.close() }
  }

  test("gzip wrapper encode/decode is an identity on records") {
    val rs = Seq(
      WireRecord(0L, 5L, "a".getBytes("UTF-8"), Array.fill(3000)('x'.toByte)),
      WireRecord(1L, 9L, null, "b".getBytes("UTF-8")))
    val decoded = Wire.decodeMessageSet(Wire.encodeMessageSetGzip(rs))
    assert(decoded.map(_.offset) == Seq(0L, 1L))
    assert(decoded.map(_.timestamp) == Seq(5L, 9L))
    assert(java.util.Arrays.equals(decoded.head.value, rs.head.value))
    assert(decoded(1).key == null)
    // broker-log convention: wrapper offset = absolute last inner offset
    val relog = Wire.encodeMessageSetGzip(rs).clone()
    // rewrite the wrapper offset INT64 from 1 (= n−1) to 41 (as if the
    // batch sat at absolute offsets 40..41 in a log segment)
    java.util.Arrays.fill(relog, 0, 8, 0.toByte); relog(7) = 41
    assert(Wire.decodeMessageSet(relog).map(_.offset) == Seq(40L, 41L))
  }

  test("a corrupt gzip payload and an unknown codec are rejected loudly") {
    val wrapper = Wire.encodeMessageSetGzip(records)
    // locate the gzip value: wrapper layout is offset(8) size(4) crc(4)
    // magic(1) attrs(1) ts(8) keylen(4=-1) vallen(4) value...
    val valueOff = 8 + 4 + 4 + 1 + 1 + 8 + 4 + 4
    val corrupt = wrapper.clone()
    corrupt(valueOff + 12) = (corrupt(valueOff + 12) ^ 0x5a).toByte
    // restore the wrapper CRC so the failure exercises the GZIP path,
    // not the CRC path: recompute over the message body
    locally {
      val body = java.util.Arrays.copyOfRange(corrupt, 16, corrupt.length)
      val crc = new java.util.zip.CRC32
      crc.update(body)
      val c = crc.getValue.toInt
      corrupt(12) = (c >>> 24).toByte; corrupt(13) = (c >>> 16).toByte
      corrupt(14) = (c >>> 8).toByte; corrupt(15) = c.toByte
    }
    val e1 = intercept[IllegalArgumentException](Wire.decodeMessageSet(corrupt))
    assert(e1.getMessage.contains("gzip"))
    // a gzip payload relabeled snappy (codec 2) is not valid snappy —
    // the from-spec decoder must refuse it loudly, never misread it
    val snappy = wrapper.clone()
    snappy(17) = 2 // attributes byte (offset 8 + size 4 + crc 4 + magic 1)
    locally {
      val body = java.util.Arrays.copyOfRange(snappy, 16, snappy.length)
      val crc = new java.util.zip.CRC32
      crc.update(body)
      val c = crc.getValue.toInt
      snappy(12) = (c >>> 24).toByte; snappy(13) = (c >>> 16).toByte
      snappy(14) = (c >>> 8).toByte; snappy(15) = c.toByte
    }
    val e2 = intercept[IllegalArgumentException](Wire.decodeMessageSet(snappy))
    assert(e2.getMessage.contains("snappy"))
    // zstd (codec 4) belongs to record-batch v2 — still refused as
    // unsupported in the v0/v1 codec, never misread
    val zstd = wrapper.clone()
    zstd(17) = 4
    locally {
      val body = java.util.Arrays.copyOfRange(zstd, 16, zstd.length)
      val crc = new java.util.zip.CRC32
      crc.update(body)
      val c = crc.getValue.toInt
      zstd(12) = (c >>> 24).toByte; zstd(13) = (c >>> 16).toByte
      zstd(14) = (c >>> 8).toByte; zstd(15) = c.toByte
    }
    val e3 = intercept[IllegalArgumentException](Wire.decodeMessageSet(zstd))
    assert(e3.getMessage.contains("unsupported compression codec 4"))
  }

  test("nested compressed wrappers are rejected (stack-depth guard)") {
    // gzip(gzip(records)): each legal-looking level would recurse — the
    // spec forbids nesting and the decoder must refuse at depth 2
    val level1 = Wire.encodeMessageSetGzip(records)
    // build a wrapper whose inner SET is itself the level-1 wrapper set
    val nested = {
      val inner = level1 // already a complete MessageSet (one wrapper msg)
      val gz = {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(inner); g.close(); bos.toByteArray
      }
      val msg = new Wire.Buf
      msg.int8(1); msg.int8(1) // magic 1, gzip
      msg.int64(1L)
      msg.bytes(null)
      msg.bytes(gz)
      val body = msg.toArray
      val crc = new java.util.zip.CRC32
      crc.update(body)
      val out = new Wire.Buf
      out.int64(0L).int32(4 + body.length).int32(crc.getValue.toInt).raw(body)
      out.toArray
    }
    val e = intercept[IllegalArgumentException](Wire.decodeMessageSet(nested))
    assert(e.getMessage.contains("nested compressed wrapper"))
  }

  test("client emits spec-exact bytes and parses spec-built responses") {
    val server = new ServerSocket(0)
    val failures = new ArrayBlockingQueue[String](8)
    val script = new Thread(() => {
      try {
        val sock = server.accept()
        val in = new DataInputStream(sock.getInputStream)
        val out = new DataOutputStream(sock.getOutputStream)
        def step(reqName: String, respName: String): Unit = {
          val size = in.readInt()
          val got = new Array[Byte](size)
          in.readFully(got)
          val want = fx(reqName)
          // fixture requests carry the size prefix; compare payloads
          if (!java.util.Arrays.equals(got, want.drop(4)))
            failures.add(s"$reqName: client bytes differ from the spec encoding")
          val resp = fx(respName)
          out.writeInt(resp.length); out.write(resp); out.flush()
        }
        step("client_produce_req", "client_produce_resp")
        step("client_fetch_req", "client_fetch_resp")
        sock.close()
      } catch { case e: Throwable => failures.add(s"script server died: $e") }
    }, "fixture-script-server")
    script.setDaemon(true)
    script.start()
    val client = new MiniKafkaClient("localhost", server.getLocalPort)
    try {
      assert(client.produce("fx", 0, records) == 0L)
      val fetched = client.fetch("fx", 0, 0L)
      assert(fetched.map(_.offset) == Seq(0L, 1L, 2L))
      assert(fetched.map(_.timestamp) == Seq(1000L, 1001L, 1002L))
      assert(new String(fetched.head.key, "UTF-8") == "k1")
      assert(fetched(1).key == null)
      assert(fetched(2).value == null)
      assert(new String(fetched(1).value, "UTF-8") == "v2")
      script.join(10000)
      val firstFailure = failures.poll(1, TimeUnit.MILLISECONDS)
      assert(firstFailure == null, s"script server reported: $firstFailure")
    } finally { client.close(); server.close() }
  }

  test("a corrupted fixture produce is CRC-rejected with ErrCorruptMessage") {
    val broker = new MiniBroker(numPartitions = 2)
    try {
      val sock = new Socket("localhost", broker.port)
      sock.setTcpNoDelay(true)
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      // flip the last payload byte (inside the message set body): the
      // stored CRC no longer matches, and the broker must answer
      // error 2 / base -1 instead of appending garbage
      val corrupted = fx("produce_req").clone()
      corrupted(corrupted.length - 1) = (corrupted(corrupted.length - 1) ^ 0x01).toByte
      out.write(corrupted); out.flush()
      val size = in.readInt()
      val resp = new Array[Byte](size)
      in.readFully(resp)
      // expected = the Python produce_resp with err := 2, base := -1
      val want = fx("produce_resp").clone()
      val errOff = want.length - 10 // ... partition(4) err(2) base(8)
      want(errOff) = 0; want(errOff + 1) = 2
      java.util.Arrays.fill(want, errOff + 2, want.length, 0xff.toByte)
      assert(java.util.Arrays.equals(resp, want),
        "corrupted produce must answer ErrCorruptMessage/-1 byte-exactly")
      // and the log stayed empty: nothing half-appended
      assert(broker.logEnd("fx", 0) == 0L)
      sock.close()
    } finally broker.close()
  }

  test("murmur2 and partition placement match the independent implementation") {
    for (key <- Seq("k1", "k3", "user-42", "a", "abcd", "abcde", "")) {
      val f = fx(s"murmur2_${if (key.isEmpty) "empty" else key}")
      val wantHash = be32(f, 0)
      val wantPart = be32(f, 4)
      val data = key.getBytes("UTF-8")
      assert(Wire.murmur2(data) == wantHash, s"murmur2($key)")
      assert(Wire.partitionFor(data, 2) == wantPart, s"partitionFor($key)")
    }
  }

  test("the repo encoder's message set is byte-identical to the Python one") {
    // produce_req tail: the Python message set for the same 3 records —
    // locate it structurally (last INT32-length BYTES field of the body)
    val enc = Wire.encodeMessageSet(records)
    val req = fx("produce_req")
    val tail = req.takeRight(enc.length)
    assert(java.util.Arrays.equals(tail, enc),
      "encodeMessageSet differs from the spec-derived MessageSet v1 bytes")
    // and the prefix length field agrees
    val lenOff = req.length - enc.length - 4
    assert(be32(req, lenOff) == enc.length)
  }
}
