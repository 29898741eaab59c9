package graft.kafka

import org.scalatest.funsuite.AnyFunSuite
import Wire._

/** [[MiniBroker]] ⇄ [[MiniKafkaClient]] over a real TCP socket: framing,
  * CRC-checked v1 message sets, offset assignment, metadata auto-create,
  * maxBytes-bounded fetch, and Kafka's murmur2 partitioner placement. */
class MiniBrokerSpec extends AnyFunSuite {

  private def withBroker(f: (MiniBroker, MiniKafkaClient) => Unit): Unit = {
    val broker = new MiniBroker(numPartitions = 2)
    val client = new MiniKafkaClient("localhost", broker.port)
    try f(broker, client)
    finally { client.close(); broker.close() }
  }

  test("message set codec round-trips with CRC validation") {
    val recs = Seq(
      WireRecord(0L, 1700000000123L, "k1".getBytes, "v1".getBytes),
      WireRecord(1L, 1700000000456L, null, "tombstone-key-null".getBytes),
      WireRecord(2L, 1700000000789L, "k3".getBytes, null))
    val decoded = decodeMessageSet(encodeMessageSet(recs))
    assert(decoded.map(_.offset) == Seq(0L, 1L, 2L))
    assert(decoded.map(_.timestamp) == recs.map(_.timestamp))
    assert(new String(decoded.head.key) == "k1")
    assert(decoded(1).key == null && decoded(2).value == null)
  }

  test("corrupted bytes fail the CRC check instead of decoding garbage") {
    val set = encodeMessageSet(Seq(WireRecord(0L, 1L, "k".getBytes, "v".getBytes)))
    set(set.length - 1) = (set(set.length - 1) ^ 0x5a).toByte
    val e = intercept[IllegalArgumentException](decodeMessageSet(set))
    assert(e.getMessage.contains("CRC"))
  }

  test("produce assigns sequential offsets; fetch returns the same bytes") {
    withBroker { (broker, client) =>
      val base1 = client.produce("t", 0, Seq(
        WireRecord(0L, 100L, "a".getBytes, "x".getBytes),
        WireRecord(0L, 101L, "b".getBytes, "y".getBytes)))
      val base2 = client.produce("t", 0, Seq(
        WireRecord(0L, 102L, "c".getBytes, "z".getBytes)))
      assert(base1 == 0L && base2 == 2L)
      assert(broker.logEnd("t", 0) == 3L)

      val got = client.fetchAll("t", 0)
      assert(got.map(_.offset) == Seq(0L, 1L, 2L))
      assert(got.map(r => new String(r.value)) == Seq("x", "y", "z"))
      assert(got.map(_.timestamp) == Seq(100L, 101L, 102L))
      // offset-addressed re-read (replay from the middle)
      assert(client.fetchAll("t", 0, from = 2L).map(r => new String(r.value)) == Seq("z"))
    }
  }

  test("metadata auto-creates topics and reports partitions; list offsets") {
    withBroker { (_, client) =>
      assert(client.partitionsFor("fresh_topic") == 2)
      assert(client.offsetFor("fresh_topic", 0, latest = true) == 0L)
      client.produce("fresh_topic", 1, Seq(WireRecord(0L, 1L, null, "v".getBytes)))
      assert(client.offsetFor("fresh_topic", 1, latest = true) == 1L)
      assert(client.offsetFor("fresh_topic", 1, latest = false) == 0L)
    }
  }

  test("fetch honors maxBytes but never starves (at least one message)") {
    withBroker { (_, client) =>
      val big = Array.fill[Byte](1000)('a')
      client.produce("big", 0, (1 to 5).map(i => WireRecord(0L, i.toLong, null, big)))
      val one = client.fetch("big", 0, 0L, maxBytes = 10) // smaller than any message
      assert(one.size == 1 && one.head.offset == 0L)
      val two = client.fetch("big", 0, 0L, maxBytes = 2100)
      assert(two.map(_.offset) == Seq(0L, 1L))
    }
  }

  test("malformed message sizes and out-of-range fetch offsets fail clean") {
    // size below the v1 floor must be a clear error, not a negative
    // array allocation
    val buf = new Buf
    buf.int64(0L).int32(3).raw(Array[Byte](1, 2, 3))
    val e = intercept[IllegalArgumentException](decodeMessageSet(buf.toArray))
    assert(e.getMessage.contains("v0 minimum"))
    withBroker { (_, client) =>
      client.produce("rng", 0, Seq(WireRecord(0L, 1L, null, "v".getBytes)))
      // negative and past-end offsets both answer OFFSET_OUT_OF_RANGE
      Seq(-1L, 5L).foreach { off =>
        val err = intercept[IllegalArgumentException](client.fetch("rng", 0, off))
        assert(err.getMessage.contains("fetch error 1"), err.getMessage)
      }
    }
  }

  test("ApiVersions handshake advertises the four data apis at version 0") {
    withBroker { (_, client) =>
      val vs = client.apiVersions()
      Seq(ApiProduce, ApiFetch, ApiListOffsets, ApiMetadata).foreach { k =>
        assert(vs.get(k).contains(0.toShort), s"api $k missing/else: $vs")
      }
    }
  }

  test("murmur2 matches Kafka's published test vectors") {
    // vectors from the public Apache Kafka client test suite
    // (org.apache.kafka.common.utils.UtilsTest#testMurmur2)
    assert(murmur2("21".getBytes) == -973932308)
    assert(murmur2("foobar".getBytes) == -790332482)
    assert(murmur2("a-little-bit-long-string".getBytes) == -985981536)
    assert(murmur2("a-little-bit-longer-string".getBytes) == -1486304829)
    assert(murmur2("lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8".getBytes) == -58897971)
    assert(murmur2(Array[Byte]('a', 'b', 'c')) == 479470107)
  }

  test("concurrent producers on separate connections interleave safely") {
    withBroker { (broker, _) =>
      val threads = (0 until 4).map { t =>
        new Thread(() => {
          val c = new MiniKafkaClient("localhost", broker.port)
          try (0 until 50).foreach { i =>
            c.produce("conc", 0, Seq(WireRecord(0L, i.toLong, null, s"$t:$i".getBytes)))
          } finally c.close()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val c = new MiniKafkaClient("localhost", broker.port)
      try {
        val all = c.fetchAll("conc", 0)
        assert(all.size == 200)
        assert(all.map(_.offset) == (0L until 200L))
        // per-producer order is preserved (single connection each)
        (0 until 4).foreach { t =>
          val mine = all.map(r => new String(r.value))
            .filter(_.startsWith(s"$t:")).map(_.split(':')(1).toInt)
          assert(mine == (0 until 50))
        }
      } finally c.close()
    }
  }

  test("maxBytes fetch with mixed record sizes returns a contiguous prefix") {
    withBroker { (_, client) =>
      // small, BIG, small: the big middle record must stop the scan —
      // a response of {0, 2} would make the consumer (which advances to
      // last.offset + 1) silently lose offset 1
      client.produce("mix", 0, Seq(
        WireRecord(0L, 1L, null, Array.fill[Byte](10)('a')),
        WireRecord(0L, 2L, null, Array.fill[Byte](1000)('b')),
        WireRecord(0L, 3L, null, Array.fill[Byte](10)('c'))))
      val got = client.fetch("mix", 0, 0L, maxBytes = 100)
      assert(got.map(_.offset) == Seq(0L))
      // the skipped-over big record is still reachable from offset 1
      val rest = client.fetchAll("mix", 0, from = 1L)
      assert(rest.map(_.offset) == Seq(1L, 2L))
      assert(rest.map(_.value.length) == Seq(1000, 10))
    }
  }

  test("truncated message set: legal on fetch decode, corruption on produce") {
    val full = encodeMessageSet(Seq(
      WireRecord(0L, 1L, null, "aaaa".getBytes),
      WireRecord(1L, 2L, null, "bbbb".getBytes)))
    val cut = full.take(full.length - 3)
    // fetch path: a truncated tail is a legal max_bytes cut point
    assert(decodeMessageSet(cut, allowTruncatedTail = true).map(_.offset) == Seq(0L))
    // produce path: the same bytes are corruption, never half-accepted
    val e = intercept[IllegalArgumentException](
      decodeMessageSet(cut, allowTruncatedTail = false))
    assert(e.getMessage.contains("truncated"))
    // sub-header tail (< 12 bytes left) is the same truncation case
    val e2 = intercept[IllegalArgumentException](
      decodeMessageSet(full.take(full.length - 40), allowTruncatedTail = false))
    assert(e2.getMessage.nonEmpty)
  }

  test("broker rejects a truncated produce message set with CORRUPT_MESSAGE") {
    withBroker { (broker, _) =>
      val sock = new java.net.Socket("localhost", broker.port)
      try {
        val in = new java.io.DataInputStream(sock.getInputStream)
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val full = encodeMessageSet(Seq(WireRecord(0L, 1L, null, "vvvv".getBytes)))
        val req = new Buf
        req.int16(ApiProduce).int16(0).int32(7).string("raw")
        req.int16(1).int32(10000)           // acks, timeout
        req.int32(1).string("trunc")        // 1 topic
        req.int32(1).int32(0)               // 1 partition, p0
        req.bytes(full.take(full.length - 2)) // truncated set
        writeFrame(out, req.toArray)
        val r = new Reader(java.nio.ByteBuffer.wrap(readFrame(in).get))
        assert(r.int32() == 7) // correlation
        r.int32(); r.string(); r.int32() // topics, name, partitions
        r.int32() // partition id
        assert(r.int16() == ErrCorruptMessage)
        assert(broker.logEnd("trunc", 0) == 0L) // nothing half-accepted
      } finally sock.close()
    }
  }

  test("long-poll fetch parks until produce arrives, times out when none does") {
    withBroker { (broker, client) =>
      client.produce("lp", 0, Seq(WireRecord(0L, 1L, null, "seed".getBytes)))
      // caught-up fetch with a wait: a producer on another connection
      // lands a record mid-wait and the parked fetch returns it EARLY
      val t0 = System.nanoTime()
      val late = new Thread(() => {
        Thread.sleep(150)
        val c2 = new MiniKafkaClient("localhost", broker.port)
        try c2.produce("lp", 0, Seq(WireRecord(0L, 2L, null, "wake".getBytes)))
        finally c2.close()
      })
      late.start()
      val got = client.fetch("lp", 0, 1L, maxWaitMs = 5000, minBytes = 1)
      val waitedMs = (System.nanoTime() - t0) / 1000000L
      late.join()
      assert(got.map(r => new String(r.value)) == Seq("wake"))
      assert(waitedMs >= 100 && waitedMs < 4000,
        s"should wake on produce, not the deadline (waited ${waitedMs}ms)")

      // no producer: the wait expires and returns empty
      val t1 = System.nanoTime()
      val none = client.fetch("lp", 0, 2L, maxWaitMs = 200, minBytes = 1)
      val expiredMs = (System.nanoTime() - t1) / 1000000L
      assert(none.isEmpty)
      assert(expiredMs >= 180, s"should hold ~max_wait (held ${expiredMs}ms)")

      // error conditions answer immediately, never park: out-of-range
      val t2 = System.nanoTime()
      val err = intercept[IllegalArgumentException](
        client.fetch("lp", 0, 99L, maxWaitMs = 5000, minBytes = 1))
      assert(err.getMessage.contains("fetch error 1"))
      assert((System.nanoTime() - t2) / 1000000L < 1000, "error must not park")
    }
  }

  test("fuzz: random and mutated frames never wedge the broker") {
    // a network-facing parser must fail CLEAN on arbitrary bytes: each
    // garbage frame may tear its own connection, but the broker must
    // keep serving fresh, well-formed connections afterwards
    val rng = new scala.util.Random(1234)
    withBroker { (broker, client) =>
      client.produce("fz", 0, Seq(WireRecord(0L, 1L, null, "base".getBytes)))
      (0 until 60).foreach { i =>
        val sock = new java.net.Socket("localhost", broker.port)
        try {
          sock.setSoTimeout(500)
          val out = new java.io.DataOutputStream(sock.getOutputStream)
          val payload: Array[Byte] =
            if (i % 3 == 0) { // pure noise
              val b = new Array[Byte](rng.nextInt(64)); rng.nextBytes(b); b
            } else { // a valid api header with a corrupted body
              val req = new Buf
              req.int16(Seq(ApiProduce, ApiFetch, ApiListOffsets,
                ApiMetadata)(rng.nextInt(4))).int16(0).int32(i).string("fz")
              val junk = new Array[Byte](rng.nextInt(48)); rng.nextBytes(junk)
              req.raw(junk)
              req.toArray
            }
          try {
            writeFrame(out, payload)
            readFrame(new java.io.DataInputStream(sock.getInputStream))
          } catch { case _: java.io.IOException => } // torn connection is fine
        } finally sock.close()
      }
      // the broker survived: a fresh well-formed round-trip still works
      val c2 = new MiniKafkaClient("localhost", broker.port)
      try {
        c2.produce("fz", 0, Seq(WireRecord(0L, 2L, null, "after".getBytes)))
        assert(c2.fetchAll("fz", 0).map(r => new String(r.value)) ==
          Seq("base", "after"))
      } finally c2.close()
    }
  }

  test("a declared length past the frame end is a parse error, not an allocation") {
    // a CRC-valid message whose KEY length claims 2 GB: the reader must
    // raise its bounds require, never allocate attacker-chosen memory
    val body = new Buf
    body.int8(1).int8(0).int64(1L) // magic, attrs, ts
    body.int32(Int.MaxValue)       // key length: 2 GB lie
    body.raw(Array.fill[Byte](8)(0x55)) // padding so size clears the v1 floor
    val bodyBytes = body.toArray
    val crc = new java.util.zip.CRC32
    crc.update(bodyBytes)
    val set = new Buf
    set.int64(0L).int32(4 + bodyBytes.length).int32(crc.getValue.toInt)
    set.raw(bodyBytes)
    val e = intercept[IllegalArgumentException](decodeMessageSet(set.toArray))
    assert(e.getMessage.contains("exceeds remaining"), e.getMessage)
  }

  test("broker close releases a parked long-poll fetch promptly") {
    val broker = new MiniBroker(numPartitions = 1)
    val client = new MiniKafkaClient("localhost", broker.port)
    try {
      client.produce("cl", 0, Seq(WireRecord(0L, 1L, null, "v".getBytes)))
      val closer = new Thread(() => { Thread.sleep(150); broker.close() })
      closer.start()
      val t0 = System.nanoTime()
      // caught-up fetch with a long wait: close must wake it, not let it
      // hold the full deadline
      try client.fetch("cl", 0, 1L, maxWaitMs = 10000, minBytes = 1)
      catch { case _: Exception => } // a torn connection is also a prompt exit
      val heldMs = (System.nanoTime() - t0) / 1000000L
      closer.join()
      assert(heldMs < 5000, s"close must release the parked fetch (held ${heldMs}ms)")
    } finally {
      client.close()
      broker.close()
    }
  }

  test("fetch and listOffsets reject partitions outside the advertised range") {
    withBroker { (_, client) =>
      client.produce("pv", 0, Seq(WireRecord(0L, 1L, null, "v".getBytes)))
      // numPartitions = 2, so partition 7 was never advertised; it must
      // answer UNKNOWN_TOPIC_OR_PARTITION, not auto-create a phantom log
      val fe = intercept[IllegalArgumentException](client.fetch("pv", 7, 0L))
      assert(fe.getMessage.contains("fetch error 3"), fe.getMessage)
      val le = intercept[IllegalArgumentException](
        client.offsetFor("pv", 7, latest = true))
      assert(le.getMessage.contains("listOffsets error 3"), le.getMessage)
      val ne = intercept[IllegalArgumentException](client.fetch("pv", -1, 0L))
      assert(ne.getMessage.contains("fetch error 3"), ne.getMessage)
      // the valid range still works after the rejects
      assert(client.fetchAll("pv", 0).size == 1)
    }
  }
}
