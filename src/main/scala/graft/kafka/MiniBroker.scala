package graft.kafka

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket, SocketException}
import java.nio.ByteBuffer
import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import Wire._

/** Single-node in-JVM Kafka-wire-protocol broker: a real TCP listener
  * speaking Metadata/Produce/Fetch/ListOffsets v0 with v1 message sets
  * ([[Wire]]), backed by in-memory per-(topic, partition) logs.
  *
  * Purpose: give the Kafka edge (S1/S3) a REAL socket to cross in an
  * environment with no broker install and no connector jar — produce and
  * fetch are exercised over genuine framed, CRC-checked protocol bytes,
  * not an in-process shortcut. The broker is deliberately minimal (one
  * node, no replication, no consumer groups — the DSv2 source tracks its
  * own offsets the way Structured Streaming always does) but is honest
  * where it counts: offsets are log positions, fetches honor maxBytes
  * with Kafka's at-least-one-message rule, topics auto-create with a
  * fixed partition count, and every response round-trips through the
  * same codec a remote client would parse.
  *
  * Threading: one accept loop, one thread per connection (connection
  * counts here are Spark task counts — tiny). Log appends synchronize on
  * the per-partition buffer; fetches copy under the same lock.
  */
final class MiniBroker(val numPartitions: Int = 2) extends AutoCloseable {

  private val server = new ServerSocket(0) // ephemeral port
  private val running = new AtomicBoolean(true)
  private val logs = TrieMap.empty[(String, Int), ArrayBuffer[WireRecord]]
  private val topics = TrieMap.empty[String, Int] // topic -> partitions

  def port: Int = server.getLocalPort
  def bootstrapServers: String = s"localhost:$port"

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val sock = server.accept()
        val t = new Thread(() => serve(sock), s"mini-broker-conn-${sock.getPort}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => // closed
      }
    }
  }, "mini-broker-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  /** Long-poll fetches park here; produce (and close) wake them. */
  private val dataMonitor = new Object

  override def close(): Unit = {
    running.set(false)
    server.close()
    dataMonitor.synchronized(dataMonitor.notifyAll())
  }

  /** Log-end offset (next offset to be assigned). */
  def logEnd(topic: String, partition: Int): Long =
    logs.get((topic, partition)).map(b => b.synchronized(b.length.toLong))
      .getOrElse(0L)

  private def log(topic: String, partition: Int): ArrayBuffer[WireRecord] = {
    topics.putIfAbsent(topic, numPartitions)
    logs.getOrElseUpdate((topic, partition), ArrayBuffer.empty)
  }

  private def serve(sock: Socket): Unit = {
    // request/response protocol: without TCP_NODELAY each response waits
    // out Nagle vs delayed-ACK (~40 ms/round-trip — measured 22k rec/s
    // producing in 1k batches; 10× that with the flag)
    sock.setTcpNoDelay(true)
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try {
      var live = true
      while (live && running.get()) {
        readFrame(in) match {
          case None => live = false
          case Some(frame) =>
            val r = new Reader(ByteBuffer.wrap(frame))
            val apiKey = r.int16()
            val apiVersion = r.int16()
            val correlation = r.int32()
            r.string() // client_id
            require(apiVersion == 0,
              s"mini-broker speaks api version 0 only (got $apiVersion for key $apiKey)")
            val body = apiKey match {
              case ApiMetadata => metadata(r)
              case ApiProduce => produce(r)
              case ApiFetch => fetch(r)
              case ApiListOffsets => listOffsets(r)
              case Wire.ApiVersions => apiVersions()
              case other => throw new IllegalArgumentException(s"api key $other unsupported")
            }
            val resp = new Buf
            resp.int32(correlation)
            resp.raw(body.toArray)
            writeFrame(out, resp.toArray)
        }
      }
    } catch {
      case _: SocketException | _: java.io.EOFException => // peer went away
    } finally sock.close()
  }

  /** Metadata v0: request [topics]; empty array = all known topics.
    * Requesting an unknown topic auto-creates it (the classic
    * auto.create.topics.enable=true broker default the reference app
    * relies on when it starts against a fresh cluster). */
  private def metadata(r: Reader): Buf = {
    val n = r.int32()
    val asked = (0 until n).map(_ => r.string())
    asked.foreach(t => topics.putIfAbsent(t, numPartitions))
    val list = if (asked.isEmpty) topics.keys.toSeq.sorted else asked
    val b = new Buf
    b.int32(1) // brokers
    b.int32(0).string("localhost").int32(port)
    b.int32(list.size)
    list.foreach { t =>
      val parts = topics(t)
      b.int16(ErrNone).string(t).int32(parts)
      (0 until parts).foreach { p =>
        b.int16(ErrNone).int32(p).int32(0) // leader = broker 0
        b.int32(1).int32(0) // replicas
        b.int32(1).int32(0) // isr
      }
    }
    b
  }

  /** Produce v0: assign offsets at append, return the base offset. */
  private def produce(r: Reader): Buf = {
    r.int16() // acks — single node, every ack level degenerates to "written"
    r.int32() // timeout
    val nt = r.int32()
    val b = new Buf
    b.int32(nt)
    (0 until nt).foreach { _ =>
      val topic = r.string()
      val np = r.int32()
      b.string(topic)
      b.int32(np)
      (0 until np).foreach { _ =>
        val partition = r.int32()
        val setBytes = r.bytes()
        val (err, base) =
          if (partition < 0 || partition >= numPartitions)
            (ErrUnknownTopicOrPartition, -1L)
          else
            try {
              val records = decodeMessageSet(setBytes, allowTruncatedTail = false)
              val buf = log(topic, partition)
              val b0 = buf.synchronized {
                val b0 = buf.length.toLong
                records.zipWithIndex.foreach { case (rec, i) =>
                  buf += rec.copy(offset = b0 + i)
                }
                b0
              }
              // wake parked long-poll fetches (they re-check readiness)
              dataMonitor.synchronized(dataMonitor.notifyAll())
              (ErrNone, b0)
            } catch {
              // IllegalArgumentException: CRC / size / codec violations;
              // BufferUnderflowException: a length field inside a
              // CRC-valid body lying about the bytes that follow — both
              // are the same "reject the batch, keep the connection" case
              case _: IllegalArgumentException => (ErrCorruptMessage, -1L)
              case _: java.nio.BufferUnderflowException => (ErrCorruptMessage, -1L)
              // defense in depth: a decoder bounds-check slip on crafted
              // lengths must still read as corruption, never kill the
              // connection thread
              case _: IndexOutOfBoundsException => (ErrCorruptMessage, -1L)
            }
        b.int32(partition).int16(err).int64(base)
      }
    }
    b
  }

  /** Fetch v0: records from fetch_offset, bounded by max_bytes but always
    * at least one message when any exists (Kafka's no-starvation rule).
    *
    * LONG POLL (`max_wait` / `min_bytes`): when the requested partitions
    * hold fewer than `min_bytes` of new data, the response is parked on
    * the produce monitor until either enough data lands or `max_wait`
    * elapses — Kafka's anti-busy-poll contract. Error conditions
    * (unknown partition, out-of-range offset) count as "data": they
    * answer immediately, a blocked error would stall the client's reset
    * logic. The wait runs on the connection's own thread (request/
    * response ordering per connection is preserved by construction). */
  private def fetch(r: Reader): Buf = {
    r.int32() // replica_id
    val maxWait = r.int32()
    val minBytes = r.int32()
    val nt = r.int32()
    case class PartReq(partition: Int, from: Long, maxBytes: Int)
    val reqs: Seq[(String, Seq[PartReq])] = (0 until nt).map { _ =>
      val topic = r.string()
      val np = r.int32()
      topic -> (0 until np).map { _ =>
        PartReq(r.int32(), r.int64(), r.int32())
      }
    }

    def recSize(rec: WireRecord): Int = 26 + 8 +
      (if (rec.key == null) 0 else rec.key.length) +
      (if (rec.value == null) 0 else rec.value.length)
    // bytes ready across the request, or None when an error condition
    // must answer immediately
    def readyBytes(): Option[Long] = {
      var total = 0L
      var immediate = false
      reqs.foreach { case (topic, parts) =>
        parts.foreach { pr =>
          if (pr.partition < 0 || pr.partition >= numPartitions) immediate = true
          else {
            val buf = log(topic, pr.partition)
            buf.synchronized {
              val hw = buf.length.toLong
              if (pr.from < 0 || pr.from > hw) immediate = true
              else buf.drop(pr.from.toInt).foreach(total += recSize(_))
            }
          }
        }
      }
      if (immediate) None else Some(total)
    }
    if (maxWait > 0 && minBytes > 0) {
      val deadline = System.nanoTime() + maxWait.toLong * 1000000L
      dataMonitor.synchronized {
        var ready = readyBytes()
        while (running.get() && ready.exists(_ < minBytes) &&
            System.nanoTime() < deadline) {
          val leftMs = (deadline - System.nanoTime()) / 1000000L
          if (leftMs > 0) dataMonitor.wait(leftMs)
          ready = readyBytes()
        }
      }
    }

    val b = new Buf
    b.int32(nt)
    reqs.foreach { case (topic, parts) =>
      b.string(topic)
      b.int32(parts.size)
      parts.foreach { pr =>
        val partition = pr.partition
        val from = pr.from
        val maxBytes = pr.maxBytes
        if (partition < 0 || partition >= numPartitions) {
          // validate BEFORE touching the log map — log() auto-creates
          // entries, and a bad client would otherwise mint phantom
          // partitions never advertised in metadata
          b.int32(partition).int16(ErrUnknownTopicOrPartition).int64(-1L)
          b.bytes(Array.emptyByteArray)
        } else {
          val buf = log(topic, partition)
          val (records, hw) = buf.synchronized {
            (buf.drop(from.toInt).toVector, buf.length.toLong)
          }
          if (from < 0 || from > hw) {
            b.int32(partition).int16(ErrOffsetOutOfRange).int64(hw)
            b.bytes(Array.emptyByteArray)
          } else {
            // size-bounded CONTIGUOUS prefix, ≥ 1 message if any are
            // pending (Kafka's no-starvation rule). Must stop at the
            // first record that doesn't fit: clients advance their
            // position to last.offset + 1, so a response with a gap
            // would silently lose the skipped records.
            var taken = Vector.empty[WireRecord]
            var bytes = 0
            var full = false
            records.foreach { rec =>
              val sz = 26 + 8 +
                (if (rec.key == null) 0 else rec.key.length) +
                (if (rec.value == null) 0 else rec.value.length)
              if (!full && (taken.isEmpty || bytes + sz <= maxBytes)) {
                taken :+= rec; bytes += sz
              } else full = true
            }
            b.int32(partition).int16(ErrNone).int64(hw)
            b.bytes(encodeMessageSet(taken))
          }
        }
      }
    }
    b
  }

  /** ApiVersions v0 — the protocol's handshake: a client opens with this
    * to learn which (api, version) pairs the broker speaks. Answering it
    * honestly (version 0 of the four data apis) is what lets a
    * spec-conforming client negotiate down instead of dying on its first
    * data request. */
  private def apiVersions(): Buf = {
    val b = new Buf
    b.int16(ErrNone)
    val apis = Seq(ApiProduce, ApiFetch, ApiListOffsets, ApiMetadata, Wire.ApiVersions)
    b.int32(apis.size)
    apis.foreach(k => b.int16(k).int16(0).int16(0)) // api, min, max
    b
  }

  /** ListOffsets v0: timestamp −1 = latest (log end), −2 = earliest. */
  private def listOffsets(r: Reader): Buf = {
    r.int32() // replica_id
    val nt = r.int32()
    val b = new Buf
    b.int32(nt)
    (0 until nt).foreach { _ =>
      val topic = r.string()
      val np = r.int32()
      b.string(topic)
      b.int32(np)
      (0 until np).foreach { _ =>
        val partition = r.int32()
        val ts = r.int64()
        r.int32() // max_num_offsets
        if (partition < 0 || partition >= numPartitions) {
          b.int32(partition).int16(ErrUnknownTopicOrPartition).int32(0)
        } else {
          val end = logEnd(topic, partition)
          val off = if (ts == -2L) 0L else end
          b.int32(partition).int16(ErrNone)
          b.int32(1).int64(off)
        }
      }
    }
    b
  }
}
