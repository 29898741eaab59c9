package graft.kafka

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.util.concurrent.atomic.AtomicInteger

import Wire._

/** Blocking Kafka-wire-protocol client (Metadata/Produce/Fetch/
  * ListOffsets v0 over one TCP connection) — the transport under the
  * DSv2 edge. One instance per Spark task/driver call site; requests on
  * a connection are serialized (`call` synchronizes), which is also the
  * protocol's per-connection ordering contract. */
final class MiniKafkaClient(host: String, port: Int) extends AutoCloseable {

  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(socket.getInputStream)
  private val out = new DataOutputStream(socket.getOutputStream)
  private val correlation = new AtomicInteger(0)

  override def close(): Unit = socket.close()

  private def call(apiKey: Short, body: Buf): Reader = synchronized {
    val corr = correlation.incrementAndGet()
    val req = new Buf
    req.int16(apiKey).int16(0).int32(corr).string("graft")
    req.raw(body.toArray)
    writeFrame(out, req.toArray)
    val frame = readFrame(in).getOrElse(
      throw new java.io.EOFException("broker closed connection"))
    val r = new Reader(ByteBuffer.wrap(frame))
    val got = r.int32()
    require(got == corr, s"correlation mismatch: sent $corr, got $got")
    r
  }

  /** The protocol handshake: (api_key → max supported version). */
  def apiVersions(): Map[Short, Short] = {
    val r = call(Wire.ApiVersions, new Buf)
    val err = r.int16()
    require(err == ErrNone, s"apiVersions error $err")
    val n = r.int32()
    (0 until n).map { _ =>
      val k = r.int16(); r.int16(); k -> r.int16()
    }.toMap
  }

  /** Topic → partition count (auto-creates on the mini broker). */
  def partitionsFor(topic: String): Int = {
    val body = new Buf
    body.int32(1).string(topic)
    val r = call(ApiMetadata, body)
    val nBrokers = r.int32()
    (0 until nBrokers).foreach { _ => r.int32(); r.string(); r.int32() }
    val nTopics = r.int32()
    var count = -1
    (0 until nTopics).foreach { _ =>
      val err = r.int16()
      val t = r.string()
      val np = r.int32()
      (0 until np).foreach { _ =>
        r.int16(); r.int32(); r.int32()
        val nr = r.int32(); (0 until nr).foreach(_ => r.int32())
        val ni = r.int32(); (0 until ni).foreach(_ => r.int32())
      }
      if (t == topic) { require(err == ErrNone, s"metadata error $err"); count = np }
    }
    require(count > 0, s"topic $topic not in metadata response")
    count
  }

  /** Produce one batch to one partition; returns the assigned base
    * offset. `gzip = true` ships the batch as one gzip-wrapped v1
    * message (the `compression.type=gzip` wire shape) — the broker
    * stores it decompressed, so fetches are unaffected. */
  def produce(topic: String, partition: Int,
              records: Seq[WireRecord], gzip: Boolean = false): Long =
    produce(topic, partition, records, if (gzip) 1 else 0)

  /** Codec-general produce: 0 none, 1 gzip, 2 snappy, 3 lz4, 4 zstd —
    * the `compression.type` wire shapes a stock producer emits. Codecs
    * 1–3 ship as v1 compressed wrappers; zstd exists only in the v2
    * RecordBatch format (KIP-110: magic-1 wrappers have no codec 4), so
    * codec 4 produces a magic-2 batch, exactly as a real 2.1+ producer
    * must. */
  def produce(topic: String, partition: Int,
              records: Seq[WireRecord], codec: Int): Long = {
    val body = new Buf
    body.int16(1) // acks=1
    body.int32(10000)
    body.int32(1).string(topic)
    body.int32(1).int32(partition)
    body.bytes(
      if (codec == 0) encodeMessageSet(records)
      else if (codec == 4) RecordBatchV2.encode(records, codec = 4)
      else encodeMessageSetCompressed(records, codec))
    val r = call(ApiProduce, body)
    val nt = r.int32()
    var base = -1L
    (0 until nt).foreach { _ =>
      r.string()
      val np = r.int32()
      (0 until np).foreach { _ =>
        r.int32()
        val err = r.int16()
        val off = r.int64()
        require(err == ErrNone, s"produce error $err")
        base = off
      }
    }
    base
  }

  /** Convenience: produce string key/values with Kafka's default
    * partitioner placement (murmur2 on key; partition 0 for null keys). */
  def produceStrings(topic: String, rows: Seq[(String, String, Long)]): Unit = {
    val n = partitionsFor(topic)
    rows.groupBy { case (k, _, _) =>
      if (k == null) 0 else partitionFor(k.getBytes("UTF-8"), n)
    }.foreach { case (p, rs) =>
      produce(topic, p, rs.map { case (k, v, ts) =>
        WireRecord(0L, ts,
          if (k == null) null else k.getBytes("UTF-8"),
          if (v == null) null else v.getBytes("UTF-8"))
      })
    }
  }

  /** Fetch from `offset`; empty when caught up. `maxWaitMs`/`minBytes`
    * opt into the broker's long poll: the response parks until
    * `minBytes` of data are ready or the wait elapses. */
  def fetch(topic: String, partition: Int, offset: Long,
            maxBytes: Int = 4 << 20, maxWaitMs: Int = 0,
            minBytes: Int = 0): Seq[WireRecord] = {
    val body = new Buf
    body.int32(-1) // replica_id: ordinary consumer
    body.int32(maxWaitMs)
    body.int32(minBytes)
    body.int32(1).string(topic)
    body.int32(1).int32(partition).int64(offset).int32(maxBytes)
    val r = call(ApiFetch, body)
    val nt = r.int32()
    var recs: Seq[WireRecord] = Nil
    (0 until nt).foreach { _ =>
      r.string()
      val np = r.int32()
      (0 until np).foreach { _ =>
        r.int32()
        val err = r.int16()
        r.int64() // high watermark
        val set = r.bytes()
        require(err == ErrNone, s"fetch error $err at offset $offset")
        recs = decodeMessageSet(set)
      }
    }
    recs
  }

  /** Drain everything from `from` (exclusive of the log end moving later). */
  def fetchAll(topic: String, partition: Int, from: Long = 0L): Seq[WireRecord] = {
    val all = Seq.newBuilder[WireRecord]
    var off = from
    var done = false
    while (!done) {
      val batch = fetch(topic, partition, off)
      if (batch.isEmpty) done = true
      else { all ++= batch; off = batch.last.offset + 1 }
    }
    all.result()
  }

  /** Log-end (`latest = true`) or log-start offset via ListOffsets v0. */
  def offsetFor(topic: String, partition: Int, latest: Boolean): Long = {
    val body = new Buf
    body.int32(-1)
    body.int32(1).string(topic)
    body.int32(1).int32(partition).int64(if (latest) -1L else -2L).int32(1)
    val r = call(ApiListOffsets, body)
    val nt = r.int32()
    var off = 0L
    (0 until nt).foreach { _ =>
      r.string()
      val np = r.int32()
      (0 until np).foreach { _ =>
        r.int32()
        val err = r.int16()
        require(err == ErrNone, s"listOffsets error $err")
        val n = r.int32()
        (0 until n).foreach(i => if (i == 0) off = r.int64() else r.int64())
      }
    }
    off
  }
}
