package graft.kafka

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import Wire.WireRecord

/** `format("graft-kafka")` — a DataSource V2 streaming source/sink over
  * the [[MiniKafkaClient]] wire transport, schema- and option-compatible
  * with Spark's stock Kafka connector (`kafka.bootstrap.servers`,
  * `subscribe`/`topic`, `startingOffsets`; the 7-column read schema), so
  * [[graft.streaming.KafkaEdges]] runs the SAME topology code against
  * either format string.
  *
  * Scale shape is the standard Kafka-source contract: one Spark input
  * partition per Kafka partition per micro-batch, addressed as an
  * `[from, until)` offset range — executors fetch their slice directly
  * from the broker (no driver relay), progress is the per-partition
  * offset map checkpointed by Structured Streaming, and replay of a
  * committed batch re-fetches the identical offset range (offsets are
  * log positions, so recovery is deterministic). The write path buffers
  * rows per task and produces once per commit with Kafka's murmur2
  * default-partitioner placement — at-least-once, exactly like the
  * stock sink.
  */
class GraftKafkaSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftKafka.ReadSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftKafkaTable(new CaseInsensitiveStringMap(properties))
}

object GraftKafka {
  /** The stock Kafka source's read schema, column for column. */
  val ReadSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private[kafka] def hostPort(options: CaseInsensitiveStringMap): (String, Int) = {
    val bs = Option(options.get("kafka.bootstrap.servers"))
      .orElse(Option(options.get("bootstrap.servers")))
      .getOrElse(throw new IllegalArgumentException(
        "option kafka.bootstrap.servers is required"))
    val Array(h, p) = bs.split(',').head.trim.split(':')
    (h, p.toInt)
  }

  /** `{"topicA":{"0":12,"3":4},"topicB":{"0":7}}` — the stock Kafka
    * source's offset-JSON shape, topic- and partition-sorted so the
    * rendering is canonical (checkpoint files diff cleanly). */
  private[kafka] def renderOffsets(m: Map[(String, Int), Long]): String =
    m.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (t, ps) =>
      val inner = ps.toSeq.map { case ((_, p), o) => p -> o }.sortBy(_._1)
        .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
      s""""${t.replace("\"", "\\\"")}":$inner"""
    }.mkString("{", ",", "}")

  private[kafka] def parseOffsets(json: String): Map[(String, Int), Long] = {
    // topics on this broker are test-named ([^"]); a full JSON parser
    // would be overkill for the canonical rendering above
    val Topic = """"((?:[^"\\]|\\.)+)"\s*:\s*\{([^}]*)\}""".r
    val Entry = """"(\d+)"\s*:\s*(\d+)""".r
    Topic.findAllMatchIn(json).flatMap { tm =>
      val t = tm.group(1).replace("\\\"", "\"")
      Entry.findAllMatchIn(tm.group(2)).map(m =>
        (t, m.group(1).toInt) -> m.group(2).toLong)
    }.toMap
  }

  /** The stock connector's comma-list `subscribe`. */
  private[kafka] def topicsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val raw = Option(options.get("subscribe")).getOrElse(
      throw new IllegalArgumentException("option subscribe is required"))
    val ts = raw.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    require(ts.nonEmpty, "subscribe needs at least one topic")
    ts
  }
}

private[kafka] case class GraftKafkaOffset(partitionOffsets: Map[(String, Int), Long])
    extends Offset {
  override def json(): String = GraftKafka.renderOffsets(partitionOffsets)
}

private[kafka] class GraftKafkaTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "graft-kafka"
  override def schema(): StructType = GraftKafka.ReadSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = GraftKafka.ReadSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new GraftKafkaMicroBatchStream(opts)
        // the stock connector's bounded mode (`spark.read` backfills):
        // the topic's [earliest, latest] range at planning time, one
        // input partition per Kafka partition
        override def toBatch: org.apache.spark.sql.connector.read.Batch =
          new org.apache.spark.sql.connector.read.Batch {
            private val (host, port) = GraftKafka.hostPort(opts)
            private val topics = GraftKafka.topicsOf(opts)
            override def planInputPartitions(): Array[InputPartition] = {
              val c = new MiniKafkaClient(host, port)
              try topics.flatMap { t =>
                (0 until c.partitionsFor(t)).map { p =>
                  GraftKafkaInputPartition(host, port, t, p,
                    c.offsetFor(t, p, latest = false),
                    c.offsetFor(t, p, latest = true))
                }
              }.filter(ip => ip.until > ip.from).toArray[InputPartition]
              finally c.close()
            }
            override def createReaderFactory(): PartitionReaderFactory =
              new PartitionReaderFactory {
                override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
                  new GraftKafkaPartitionReader(partition.asInstanceOf[GraftKafkaInputPartition])
              }
          }
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    // SupportsStreamingUpdateAsAppend: update-mode rows are just appended
    // records on the topic (last-write-wins per key) — the exact marker
    // the stock Kafka sink declares for its changelog contract
    new WriteBuilder
        with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite =
          new GraftKafkaStreamingWrite(options, info.schema())
      }
    }
}

/** Micro-batch read: each planning round asks the broker for log-end
  * offsets; a batch is the `[start, end)` range per partition. With
  * `maxOffsetsPerTrigger` set, batches are admission-controlled — the
  * per-trigger budget splits across topic-partitions proportionally to
  * their lag (the stock source's backpressure contract), so a restart
  * against a deep backlog drains in bounded, checkpointable steps
  * instead of one giant batch. */
private[kafka] class GraftKafkaMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows}

  private val maxPerTrigger: Option[Long] =
    Option(options.get("maxOffsetsPerTrigger")).map(_.trim.toLong)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val ends = latestOffset().asInstanceOf[GraftKafkaOffset].partitionOffsets
    limit match {
      case rl: ReadMaxRows =>
        val s = start.asInstanceOf[GraftKafkaOffset].partitionOffsets
        val lags = ends.toSeq.sortBy(_._1).map { case (tp, end) =>
          (tp, s.getOrElse(tp, 0L), end, math.max(0L, end - s.getOrElse(tp, 0L)))
        }
        val total = lags.map(_._4).sum
        val budget = rl.maxRows()
        if (total <= budget) GraftKafkaOffset(ends)
        else {
          // proportional floor, then leftover one-by-one in tp order so
          // tiny budgets still make progress on SOME partition
          var used = 0L
          val base = lags.map { case (tp, from, _, lag) =>
            val take = budget * lag / total
            used += take
            (tp, from, lag, take)
          }
          var leftover = budget - used
          GraftKafkaOffset(base.map { case (tp, from, lag, take) =>
            val extra = if (leftover > 0 && take < lag) { leftover -= 1; 1L } else 0L
            tp -> (from + math.min(lag, take + extra))
          }.toMap)
        }
      case _ => GraftKafkaOffset(ends)
    }
  }

  override def reportLatestOffset(): Offset = latestOffset()

  private val (host, port) = GraftKafka.hostPort(options)
  private val topics = GraftKafka.topicsOf(options)
  private val startLatest =
    Option(options.get("startingOffsets")).exists(_.equalsIgnoreCase("latest"))

  // ONE driver-side connection for the stream's lifetime (offset polls
  // happen once per micro-batch; a socket per poll is pure overhead) —
  // lazily opened, closed by stop(). MiniKafkaClient.call synchronizes,
  // so concurrent planner threads serialize safely.
  @transient private lazy val driverClient = new MiniKafkaClient(host, port)
  private def withClient[A](f: MiniKafkaClient => A): A = f(driverClient)

  // topic-partition set is discovered once per stream (static, like the
  // stock source without subscribePattern repartition handling)
  private lazy val topicPartitions: Seq[(String, Int)] = withClient { c =>
    topics.flatMap(t => (0 until c.partitionsFor(t)).map(p => (t, p)))
  }

  override def initialOffset(): Offset = withClient { c =>
    GraftKafkaOffset(topicPartitions.map { case (t, p) =>
      (t, p) -> (if (startLatest) c.offsetFor(t, p, latest = true) else 0L)
    }.toMap)
  }

  override def latestOffset(): Offset = withClient { c =>
    GraftKafkaOffset(topicPartitions.map { case (t, p) =>
      (t, p) -> c.offsetFor(t, p, latest = true)
    }.toMap)
  }

  override def deserializeOffset(json: String): Offset =
    GraftKafkaOffset(GraftKafka.parseOffsets(json))

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint

  override def stop(): Unit =
    try driverClient.close() catch { case _: java.io.IOException => () }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftKafkaOffset].partitionOffsets
    val e = end.asInstanceOf[GraftKafkaOffset].partitionOffsets
    e.toSeq.sortBy(_._1).flatMap { case ((t, p), until) =>
      val from = s.getOrElse((t, p), 0L)
      if (until > from) Some(GraftKafkaInputPartition(host, port, t, p, from, until))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new GraftKafkaPartitionReader(partition.asInstanceOf[GraftKafkaInputPartition])
    }
}

private[kafka] case class GraftKafkaInputPartition(host: String, port: Int,
    topic: String, partition: Int, from: Long, until: Long) extends InputPartition

/** Executor-side reader: fetches its `[from, until)` slice directly from
  * the broker over the wire client. */
private[kafka] class GraftKafkaPartitionReader(p: GraftKafkaInputPartition)
    extends PartitionReader[InternalRow] {

  private val client = new MiniKafkaClient(p.host, p.port)
  private var buffer: Iterator[WireRecord] = Iterator.empty
  private var nextOffset = p.from
  private var current: WireRecord = _

  override def next(): Boolean = {
    if (nextOffset >= p.until) return false
    while (!buffer.hasNext) {
      val batch = client.fetch(p.topic, p.partition, nextOffset)
      if (batch.isEmpty) return false // range truncated under us — stop clean
      buffer = batch.iterator
    }
    current = buffer.next()
    nextOffset = current.offset + 1
    current.offset < p.until
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](
      current.key, current.value, UTF8String.fromString(p.topic),
      p.partition, current.offset, current.timestamp * 1000L /* ms → µs */,
      0 /* CreateTime, like the producer wrote it */))

  override def close(): Unit = client.close()
}

/** Streaming write: rows buffer per task, one produce call per partition
  * at task commit (at-least-once, the stock Kafka sink's contract). */
private[kafka] class GraftKafkaStreamingWrite(options: CaseInsensitiveStringMap,
    schema: StructType) extends StreamingWrite {

  private val (host, port) = GraftKafka.hostPort(options)
  private val topic = Option(options.get("topic")).getOrElse(
    throw new IllegalArgumentException("option topic is required for the sink"))

  private def fieldIdx(name: String): Int = schema.fieldNames.indexOf(name)
  private val keyIdx = fieldIdx("key")
  private val valueIdx = fieldIdx("value")
  require(valueIdx >= 0, s"sink schema needs a value column, got $schema")
  private val keyIsString = keyIdx >= 0 &&
    schema(keyIdx).dataType == StringType
  private val valueIsString = schema(valueIdx).dataType == StringType
  // compression=gzip|snappy|lz4|zstd ships each per-partition batch as
  // one compressed unit (the stock producer's compression.type
  // contract; Wire unwraps on the broker): gzip/snappy/lz4 as a v1
  // compressed wrapper, zstd as a v2 RecordBatch (KIP-110 — codec 4
  // exists only in magic 2). Unknown codecs are refused HERE, at plan
  // time, not per task. Value matched case-insensitively, like the
  // (CaseInsensitiveStringMap) option KEY lookup
  private val codec = Option(options.get("compression"))
      .map(_.toLowerCase(java.util.Locale.ROOT)) match {
    case None | Some("none") | Some("uncompressed") => 0
    case Some("gzip") => 1
    case Some("snappy") => 2
    case Some("lz4") => 3
    case Some("zstd") => 4
    case Some(c) => throw new IllegalArgumentException(
      s"unsupported sink compression '$c' (none|uncompressed|gzip|snappy|lz4|zstd)")
  }

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val (h, pt, tp, ki, vi, ks, vs, cd) =
      (host, port, topic, keyIdx, valueIdx, keyIsString, valueIsString, codec)
    new StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
                                epochId: Long): DataWriter[InternalRow] =
        new GraftKafkaDataWriter(h, pt, tp, ki, vi, ks, vs, cd)
    }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private[kafka] case class GraftKafkaCommit() extends WriterCommitMessage

private[kafka] class GraftKafkaDataWriter(host: String, port: Int, topic: String,
    keyIdx: Int, valueIdx: Int, keyIsString: Boolean, valueIsString: Boolean,
    codec: Int = 0)
    extends DataWriter[InternalRow] {

  private val rows = scala.collection.mutable.ArrayBuffer.empty[(Array[Byte], Array[Byte])]

  private def bytesAt(row: InternalRow, idx: Int, isString: Boolean): Array[Byte] =
    if (idx < 0 || row.isNullAt(idx)) null
    else if (isString) row.getUTF8String(idx).getBytes
    else row.getBinary(idx)

  override def write(row: InternalRow): Unit =
    rows += ((bytesAt(row, keyIdx, keyIsString), bytesAt(row, valueIdx, valueIsString)))

  override def commit(): WriterCommitMessage = {
    if (rows.nonEmpty) {
      val client = new MiniKafkaClient(host, port)
      try {
        val n = client.partitionsFor(topic)
        val now = System.currentTimeMillis()
        // keyed records place by murmur2 (the DefaultPartitioner);
        // null-key records round-robin across partitions per task (the
        // stock producer spreads them too — pinning them all to one
        // partition would hot-spot an unkeyed stream)
        var rr = 0
        rows.map { case (k, v) =>
          val p = if (k == null) { rr += 1; (rr - 1) % n }
                  else Wire.partitionFor(k, n)
          (p, k, v)
        }.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (p, rs) =>
          client.produce(topic, p,
            rs.toSeq.map { case (_, k, v) => WireRecord(0L, now, k, v) },
            codec)
        }
      } finally client.close()
    }
    GraftKafkaCommit()
  }

  override def abort(): Unit = rows.clear()
  override def close(): Unit = ()
}
