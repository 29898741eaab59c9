package graft.kafka

import graft.SparkSpec
import graft.functions.TextAnalysis
import graft.streaming.{KafkaEdges, Rec, StreamDedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The reference WordCount topology END TO END over a real broker socket
  * (`WordCount.java:53-58`: lines → lowercase `\\W+` split → groupBy word
  * → continuous count → output topic): bytes are produced over the Kafka
  * wire protocol into [[MiniBroker]], Spark reads them through
  * `format("graft-kafka")` via [[KafkaEdges.source]], and the updated
  * histogram is written back to a second topic through
  * [[KafkaEdges.sink]] — then fetched and asserted over the same wire.
  * A second leg restarts the query from its checkpoint and proves the
  * offset map resumes (no reprocessing, counts keep accumulating). */
class KafkaEndToEndSpec extends SparkSpec {

  private def latestPerKey(recs: Seq[Wire.WireRecord]): Map[String, Long] =
    recs.filter(_.key != null)
      .map(r => new String(r.key, "UTF-8") -> new String(r.value, "UTF-8").toLong)
      .foldLeft(Map.empty[String, Long])(_ + _)

  test("WordCount: produce → graft-kafka source → count → sink → fetch, with checkpoint resume") {
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    val ckpt = Files.createTempDirectory("graft_kafka_e2e").toString
    try {
      val in = "streams-plaintext-input"
      val outTopic = "streams-wordcount-output"
      producer.produceStrings(in, Seq(
        ("l1", "all streams lead to kafka", 1000L),
        ("l2", "hello kafka streams", 2000L),
        ("l3", "join kafka summit", 3000L)))

      def runOnce(): Unit = {
        val lines: org.apache.spark.sql.Dataset[Rec] =
          KafkaEdges.source(s, broker.bootstrapServers, in, format = "graft-kafka")
        val counts = lines.toDF()
          .select(explode(split(lower(col("value")), "\\W+")).as("word"))
          .filter(length(col("word")) > 0)
          .groupBy("word").agg(count(lit(1)).as("cnt"))
          .select(col("word").as("key"), col("cnt").cast("string").as("value"),
            lit(0L).as("ts"), lit(0L).as("seq"))
          .as[Rec]
        val q = KafkaEdges.sink(counts, broker.bootstrapServers, outTopic,
            ckpt, format = "graft-kafka")
          .outputMode("update")
          .start()
        try q.processAllAvailable() finally q.stop()
      }

      runOnce()
      val round1 = latestPerKey(
        (0 until 2).flatMap(p => producer.fetchAll(outTopic, p)))
      assert(round1 == Map(
        "all" -> 1L, "streams" -> 2L, "lead" -> 1L, "to" -> 1L,
        "kafka" -> 3L, "hello" -> 1L, "join" -> 1L, "summit" -> 1L))

      // leg 2: more input, RESTART from the same checkpoint — the offset
      // map must resume past the three consumed records (counts
      // accumulate; a re-read from zero would double them)
      producer.produceStrings(in, Seq(("l4", "kafka streams again", 4000L)))
      runOnce()
      val round2 = latestPerKey(
        (0 until 2).flatMap(p => producer.fetchAll(outTopic, p)))
      assert(round2 == round1 ++ Map(
        "kafka" -> 4L, "streams" -> 3L, "again" -> 1L))
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("document ingest over the wire: dedup + quality gate, state resumes across restart") {
    // the LLM-ingest capstone over REAL bytes: documents produced to a
    // raw topic, streamed through the exact-dedup gate
    // (StreamDedup.firstPerFingerprint — whitespace-normalized md5) plus
    // a quality floor, kept docs written to a second topic, fetched and
    // asserted over the same wire. Leg 2 restarts from the checkpoint
    // and REDELIVERS a leg-1 text — the fingerprint state must survive
    // the restart and drop it, while a genuinely new doc passes.
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    val ckpt = Files.createTempDirectory("graft_ingest_e2e").toString
    val goodA = "the cat sat on the mat and the dog sat too"
    val goodB = "a stream of words is the essence of the corpus"
    val goodC = "all the words in this line are of a good shape"
    val junk = "$$$ !!! ### %%% ^^^ &&& *** ((( ))) @@@"
    try {
      def runOnce(): Unit = {
        val in = KafkaEdges.source(s, broker.bootstrapServers,
          "docs-raw", format = "graft-kafka")
        val kept = StreamDedup.firstPerFingerprint(
            in.toDF().withColumn("ets", timestamp_millis(col("ts"))),
            "value", "ets", "10 minutes")
          .filter(TextAnalysis.qualityScore(col("value")) >= lit(0.3))
          .select(col("key"), col("value"), col("ts"), col("seq")).as[Rec]
        val q = KafkaEdges.sink(kept, broker.bootstrapServers,
            "docs-kept", ckpt, format = "graft-kafka")
          .outputMode("append")
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      def keptTexts(): Seq[String] =
        (0 until 2).flatMap(p => producer.fetchAll("docs-kept", p))
          .map(r => new String(r.value, "UTF-8"))

      // leg 1: two good docs, one duplicate (same text, different id,
      // extra whitespace — the normalized fingerprint must collapse it),
      // one junk doc the quality floor drops
      producer.produceStrings("docs-raw", Seq(
        ("d1", goodA, 1000L), ("d2", goodB, 2000L),
        ("d3", "  " + goodA + "  ", 3000L), ("d4", junk, 4000L)))
      runOnce()
      val leg1 = keptTexts()
      assert(leg1.map(_.trim).sorted == Seq(goodA, goodB).sorted, leg1)

      // leg 2: a redelivered leg-1 text (must stay dropped ACROSS the
      // restart) and one new doc (must pass)
      producer.produceStrings("docs-raw", Seq(
        ("d5", goodB, 5000L), ("d6", goodC, 6000L)))
      runOnce()
      val leg2 = keptTexts()
      assert(leg2.map(_.trim).sorted == Seq(goodA, goodB, goodC).sorted, leg2)
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("live index over the wire: produce docs → incremental index → HTTP term stats") {
    // the retrieval capstone: documents produced over broker sockets,
    // folded into the incrementally-maintained inverted index, and the
    // per-term statistics served over the reference's IQ REST face —
    // a second produce must show up in the SAME http store after the
    // next micro-batch, with no re-index step anywhere
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    val ckpt = Files.createTempDirectory("graft_iidx_wire").toString
    val table = Files.createTempDirectory("graft_iidx_wire_tbl").toString + "/index"
    val http = new graft.state.StateHttpServer(s)
      .registerView("index",
        () => graft.streaming.IncrementalIndex.index(s, table).toDF(), "term")
    val port = http.start()
    def get(path: String): (Int, String) = {
      val conn = new java.net.URI(s"http://127.0.0.1:$port$path").toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      val code = conn.getResponseCode
      val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
      val body = scala.io.Source.fromInputStream(is, "UTF-8").mkString
      conn.disconnect()
      (code, body)
    }
    try {
      producer.produceStrings("docs", Seq(
        ("d1", "spark streams spark", 1000L),
        ("d2", "kafka streams", 2000L)))
      val in = KafkaEdges.source(s, broker.bootstrapServers, "docs",
        format = "graft-kafka")
      val q = graft.streaming.IncrementalIndex.start(
        graft.streaming.KTableStream.changes(in), table, ckpt)
      try {
        q.processAllAvailable()
        val (c1, b1) = get("/state/keyvalue/index/spark")
        assert(c1 == 200 && b1.contains("\"df\":1") && b1.contains("\"total_tf\":2"), b1)
        val (c2, b2) = get("/state/keyvalue/index/streams")
        assert(c2 == 200 && b2.contains("\"df\":2"), b2)

        // leg 2: rewrite d1 over the wire — the OLD text's terms must
        // retract; the http face reads the updated table in place
        producer.produceStrings("docs", Seq(("d1", "spark joins", 3000L)))
        q.processAllAvailable()
        val (_, b3) = get("/state/keyvalue/index/spark")
        assert(b3.contains("\"total_tf\":1"), b3)
        val (_, b4) = get("/state/keyvalue/index/streams")
        assert(b4.contains("\"df\":1"), b4)
        val (_, b5) = get("/state/keyvalue/index/joins")
        assert(b5.contains("\"df\":1"), b5)
      } finally q.stop()
    } finally {
      http.stop()
      producer.close()
      broker.close()
    }
  }

  test("Pipe: records pass through unchanged over the wire") {
    // the simplest reference app (`Pipe.java:44`:
    // `builder.stream(in).to(out)`) — identity over the wire: keys,
    // values, and per-partition order must survive both hops
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    val ckpt = Files.createTempDirectory("graft_pipe_e2e").toString
    try {
      producer.produceStrings("streams-plaintext-input", Seq(
        ("k1", "all streams lead to kafka", 1000L),
        ("k2", "hello kafka streams", 2000L),
        ("k1", "join kafka summit", 3000L)))
      val in = KafkaEdges.source(s, broker.bootstrapServers,
        "streams-plaintext-input", format = "graft-kafka")
      val q = KafkaEdges.sink(in, broker.bootstrapServers,
          "streams-pipe-output", ckpt, format = "graft-kafka")
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
      val out = (0 until 2).flatMap(p =>
        producer.fetchAll("streams-pipe-output", p))
        .map(r => (new String(r.key, "UTF-8"), new String(r.value, "UTF-8")))
      assert(out.toSet == Set(
        ("k1", "all streams lead to kafka"),
        ("k2", "hello kafka streams"),
        ("k1", "join kafka summit")))
      // per-key order survives (same key → same partition both hops)
      assert(out.filter(_._1 == "k1").map(_._2) ==
        Seq("all streams lead to kafka", "join kafka summit"))
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("LineSplit: flatMapValues word explosion over the wire") {
    // `LineSplit.java:47-49`: stream → flatMapValues(split \W+) → out.
    // Kafka Streams' flatMapValues KEEPS the record key on every emitted
    // word — the key column must ride through the explosion unchanged
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    val ckpt = Files.createTempDirectory("graft_linesplit_e2e").toString
    try {
      producer.produceStrings("streams-plaintext-input", Seq(
        ("k1", "all streams lead", 1000L),
        ("k2", "hello kafka", 2000L)))
      val in = KafkaEdges.source(s, broker.bootstrapServers,
        "streams-plaintext-input", format = "graft-kafka")
      val words = in.toDF()
        .select(col("key"), col("ts"), col("seq"),
          explode(split(col("value"), "\\W+")).as("value"))
        .filter(length(col("value")) > 0)
        .select(col("key"), col("value"), col("ts"), col("seq")).as[Rec]
      val q = KafkaEdges.sink(words, broker.bootstrapServers,
          "streams-linesplit-output", ckpt, format = "graft-kafka")
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
      val out = (0 until 2).flatMap(p =>
        producer.fetchAll("streams-linesplit-output", p))
        .map(r => (new String(r.key, "UTF-8"), new String(r.value, "UTF-8")))
      assert(out.toSet == Set(
        ("k1", "all"), ("k1", "streams"), ("k1", "lead"),
        ("k2", "hello"), ("k2", "kafka")))
      assert(out.filter(_._1 == "k1").map(_._2) == Seq("all", "streams", "lead"))
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("WindowedGrouping: event-time tumbling counts over the wire") {
    // the second reference app (`apps/WindowedGrouping.scala:39-48`):
    // keyed stream → 10 s tumbling window count → selectKey
    // "$key-$windowStart" → output topic. Event time is the
    // producer-assigned record timestamp riding the v1 message format.
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    val ckpt = Files.createTempDirectory("graft_kafka_wg").toString
    val base = 1700000000000L // epoch ms, window-aligned
    try {
      producer.produceStrings("input", Seq(
        ("hmida", "1", base), ("hmida", "1", base + 1000),
        ("hmida", "1", base + 12000), ("lambda", "1", base + 3000)))
      val src = KafkaEdges.source(s, broker.bootstrapServers, "input",
        format = "graft-kafka")
      val counts = graft.streaming.WindowedStreams.tumblingCounts(
          src.toDF().withColumn("ets", timestamp_millis(col("ts"))),
          "ets", "10 seconds", "1 hour", col("key"))
        .select(
          concat(col("key"), lit("-"),
            col("window.start").cast("long")).as("key"),
          col("count").cast("string").as("value"),
          lit(0L).as("ts"), lit(0L).as("seq"))
        .as[Rec]
      val q = KafkaEdges.sink(counts, broker.bootstrapServers, "output",
          ckpt, format = "graft-kafka")
        .outputMode("update")
        .start()
      try q.processAllAvailable() finally q.stop()

      val got = latestPerKey((0 until 2).flatMap(p => producer.fetchAll("output", p)))
      val w0 = base / 1000
      assert(got == Map(
        s"hmida-$w0" -> 2L, s"hmida-${w0 + 10}" -> 1L, s"lambda-$w0" -> 1L))
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("multi-topic subscribe: one stream over a comma list, topic column intact") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    try {
      producer.produceStrings("clicks", Seq(("u1", "c1", 10L)))
      producer.produceStrings("views", Seq(("u1", "v1", 20L), ("u2", "v2", 30L)))
      val df = s.readStream.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "clicks, views")
        .option("startingOffsets", "earliest")
        .load()
        .selectExpr("topic", "CAST(value AS STRING) AS v")
      val q = df.writeStream.format("memory").queryName("multi_out")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // resume semantics hold across topics: add to one topic only
        producer.produceStrings("clicks", Seq(("u3", "c2", 40L)))
        q.processAllAvailable()
      } finally q.stop()
      val got = s.table("multi_out").as[(String, String)].collect().toSet
      assert(got == Set(("clicks", "c1"), ("clicks", "c2"),
        ("views", "v1"), ("views", "v2")))
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("maxOffsetsPerTrigger bounds every micro-batch and still drains the log") {
    val s = spark
    implicit val sql = s.sqlContext
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    try {
      // 7 records on p0, 3 on p1 — uneven lag exercises the
      // proportional split and the leftover distribution
      producer.produce("throttled", 0, (1 to 7).map(i =>
        Wire.WireRecord(0L, i.toLong, null, s"a$i".getBytes)))
      producer.produce("throttled", 1, (1 to 3).map(i =>
        Wire.WireRecord(0L, i.toLong, null, s"b$i".getBytes)))
      val df = s.readStream.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "throttled")
        .option("maxOffsetsPerTrigger", "4")
        .load()
      val q = df.writeStream.format("memory").queryName("throttled_out")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(s.table("throttled_out").count() == 10) // fully drained
        val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
        assert(sizes.forall(_ <= 4), s"a batch exceeded the budget: $sizes")
        assert(sizes.length >= 3, s"backlog drained in too few batches: $sizes")
      } finally q.stop()
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("batch read: spark.read over the topic returns the full log with pushed projection") {
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    try {
      producer.produceStrings("backfill", Seq(
        ("k1", "v1", 10L), ("k2", "v2", 20L), ("k3", "v3", 30L)))
      val df = s.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "backfill")
        .load()
      val got = df.selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)")
        .as[(String, String)].collect().sortBy(_._1).toSeq
      assert(got == Seq(("k1", "v1"), ("k2", "v2"), ("k3", "v3")))
      // the read parallelism is the topic's partitioning
      assert(df.select("partition").distinct().count() >= 1)
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("gzip-compressed produce reads back identically through the DSv2 source") {
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    try {
      // the compression.type=gzip producer shape: one wrapper message,
      // relative inner offsets — the engine's read path must see exactly
      // the records a plain producer would have sent
      producer.produce("gzt", 0, Seq(
        Wire.WireRecord(0L, 100L, "a".getBytes("UTF-8"), "va".getBytes("UTF-8")),
        Wire.WireRecord(0L, 200L, "b".getBytes("UTF-8"), "vb".getBytes("UTF-8"))),
        gzip = true)
      producer.produce("gzt", 1, Seq(
        Wire.WireRecord(0L, 300L, "c".getBytes("UTF-8"), "vc".getBytes("UTF-8"))),
        gzip = false) // mixed: one plain partition alongside
      val df = s.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "gzt")
        .load()
      val got = df.selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)",
          "timestamp")
        .as[(String, String, java.sql.Timestamp)].collect()
        .map(t => (t._1, t._2, t._3.getTime)).sortBy(_._1).toSeq
      assert(got == Seq(("a", "va", 100L), ("b", "vb", 200L), ("c", "vc", 300L)))
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("sink compression=gzip: the written topic reads back identically") {
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    try {
      producer.produceStrings("gzin", Seq(
        ("a", "va", 10L), ("b", "vb", 20L), ("c", "vc", 30L)))
      val src = s.readStream.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "gzin").load()
      val q = src.selectExpr("key", "value")
        .writeStream.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("topic", "gzout")
        .option("compression", "gzip")
        .option("checkpointLocation",
          Files.createTempDirectory("gzsink").toString)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
      val out = s.read.format("graft-kafka")
        .option("kafka.bootstrap.servers", broker.bootstrapServers)
        .option("subscribe", "gzout").load()
        .selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)")
        .as[(String, String)].collect().sortBy(_._1).toSeq
      assert(out == Seq(("a", "va"), ("b", "vb"), ("c", "vc")))
      // snappy, lz4 and zstd are first-class sink codecs (zstd ships
      // as a v2 RecordBatch — KIP-110): each written topic must read
      // back identically through the unwrapping broker
      Seq("snappy" -> "snout", "lz4" -> "lzout",
          "zstd" -> "zsout").foreach { case (codec, topic) =>
        val qc = src.selectExpr("key", "value")
          .writeStream.format("graft-kafka")
          .option("kafka.bootstrap.servers", broker.bootstrapServers)
          .option("topic", topic).option("compression", codec)
          .option("checkpointLocation",
            Files.createTempDirectory(s"${codec}sink").toString)
          .outputMode("append").start()
        qc.processAllAvailable(); qc.stop()
        val got = s.read.format("graft-kafka")
          .option("kafka.bootstrap.servers", broker.bootstrapServers)
          .option("subscribe", topic).load()
          .selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)")
          .as[(String, String)].collect().sortBy(_._1).toSeq
        assert(got == Seq(("a", "va"), ("b", "vb"), ("c", "vc")), codec)
      }
      // unknown codecs refuse when the writer is built, not per task
      val e = intercept[Exception] {
        val bad = src.selectExpr("key", "value")
          .writeStream.format("graft-kafka")
          .option("kafka.bootstrap.servers", broker.bootstrapServers)
          .option("topic", "bad").option("compression", "brotli")
          .option("checkpointLocation",
            Files.createTempDirectory("badsink").toString)
          .outputMode("append").start()
        try bad.processAllAvailable() finally bad.stop()
      }
      assert(e.getMessage != null)
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("startingOffsets=latest skips records produced before the stream started") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    try {
      producer.produceStrings("late_topic", Seq(("old", "pre-existing", 1L)))
      val recs = KafkaEdges.source(s, broker.bootstrapServers, "late_topic",
        startingOffsets = "latest", format = "graft-kafka")
      val q = recs.writeStream.format("memory").queryName("latest_out")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        assert(s.table("latest_out").count() == 0) // old record skipped
        producer.produceStrings("late_topic", Seq(("new", "fresh", 2L)))
        q.processAllAvailable()
        val got = s.table("latest_out").as[Rec].collect().toSeq
        assert(got.map(r => (r.key, r.value)) == Seq(("new", "fresh")))
      } finally q.stop()
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("WindowedJoin: two topics band-joined over the wire into a third") {
    // the reference's third app (`apps/WindowedJoin.scala:41-53`):
    // input1 ⋈ input2 within a ±10 s window, joiner = left + right
    // concat, result to topic "join" — here with every byte crossing
    // the broker socket on all three edges.
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    val ckpt = Files.createTempDirectory("graft_kafka_wj").toString
    val base = 1700000000000L
    try {
      producer.produceStrings("input1", Seq(
        ("hmida", "L1", base), ("lambda", "L2", base + 1000),
        ("hmida", "L3", base + 60000))) // 60 s later — joins nothing
      producer.produceStrings("input2", Seq(
        ("hmida", "R1", base + 5000),   // within 10 s of L1
        ("lambda", "R2", base + 30000), // 29 s from L2 — outside the band
        ("hmida", "R3", base + 55000))) // within 10 s of L3
      def side(topic: String) =
        KafkaEdges.source(s, broker.bootstrapServers, topic, format = "graft-kafka")
          .toDF().select(col("key"), col("value"), timestamp_millis(col("ts")).as("ts"))
      val joined = graft.streaming.StreamJoins.bandJoin(
          side("input1"), side("input2"), bandSeconds = 10L, grace = "0 seconds")
        .select(col("l_key").as("key"),
          concat(col("l_value"), col("r_value")).as("value"),
          lit(0L).as("ts"), lit(0L).as("seq"))
        .as[Rec]
      val q = KafkaEdges.sink(joined, broker.bootstrapServers, "join",
          ckpt, format = "graft-kafka")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = (0 until 2).flatMap(p => producer.fetchAll("join", p))
        .map(r => (new String(r.key, "UTF-8"), new String(r.value, "UTF-8"))).toSet
      assert(got == Set(("hmida", "L1R1"), ("hmida", "L3R3")))
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("WindowedGroupAtClose: emit-on-close windows over the wire") {
    // the reference's fourth app (`apps/WindowedGroupAtClose.scala:29-38`):
    // 10 s tumbling counts with emitStrategy(onWindowClose), key
    // "$key-$windowStartMs", to topic "output". Append mode emits a
    // window exactly once, when the watermark closes it — so the
    // advancer's own (still-open) window must NOT appear.
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    val ckpt = Files.createTempDirectory("graft_kafka_close").toString
    val base = 1700000000000L
    try {
      producer.produceStrings("input", Seq(
        ("hmida", "1", base), ("hmida", "1", base + 1000),
        ("lambda", "1", base + 2000), ("hmida", "1", base + 12000)))
      val src = KafkaEdges.source(s, broker.bootstrapServers, "input",
        format = "graft-kafka")
      val counts = graft.streaming.WindowedStreams.tumblingCounts(
          src.toDF().withColumn("ets", timestamp_millis(col("ts"))),
          "ets", "10 seconds", "0 seconds", col("key"))
        .select(
          concat(col("key"), lit("-"),
            (col("window.start").cast("long") * 1000).cast("string")).as("key"),
          col("count").cast("string").as("value"),
          lit(0L).as("ts"), lit(0L).as("seq"))
        .as[Rec]
      val q = KafkaEdges.sink(counts, broker.bootstrapServers, "output",
          ckpt, format = "graft-kafka")
        .outputMode("append") // append = emit once, at close
        .start()
      try {
        q.processAllAvailable()
        // the +12 s event put stream time past w0's end, so w0 is closed
        // and emitted; w1 (holding that event) is still open — exactly
        // the reference's no-grace close rule
        val mid = (0 until 2).flatMap(p => producer.fetchAll("output", p))
          .map(r => new String(r.key, "UTF-8")).toSet
        assert(mid == Set(s"hmida-$base", s"lambda-$base"), mid)
        // the advancer pushes the watermark past w1 as well
        producer.produceStrings("input", Seq(("zz", "1", base + 30000)))
        q.processAllAvailable()
      } finally q.stop()
      val got = (0 until 2).flatMap(p => producer.fetchAll("output", p))
        .map(r => (new String(r.key, "UTF-8"), new String(r.value, "UTF-8").toLong))
        .toSet
      assert(got == Set(
        (s"hmida-$base", 2L), (s"lambda-$base", 1L),
        (s"hmida-${base + 10000}", 1L)), got)
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("ForeignJoin: FK left join between two changelog topics over the wire") {
    // the reference's FK-join app (`apps/ForeignJoin.scala:24-44`):
    // left-topic rows carry their foreign key in the value, right-topic
    // is the FK-keyed table, output = foreignValue keyed by left key
    // (null when the FK dangles — on the wire that IS a null-value
    // record, exactly like the reference's Integer null).
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    val ckpt = Files.createTempDirectory("graft_kafka_fk").toString
    val fkOf: String => String = v => {
      val fk = v.substring(0, v.indexOf('|'))
      if (fk.isEmpty) null else fk
    }
    try {
      def feed(topic: String, rows: (String, String)*): Unit = {
        producer.produceStrings(topic, rows.map { case (k, v) => (k, v, 0L) })
      }
      val left = KafkaEdges.source(s, broker.bootstrapServers, "left-topic",
        format = "graft-kafka")
      val right = KafkaEdges.source(s, broker.bootstrapServers, "right-topic",
        format = "graft-kafka")
      val out = graft.streaming.FkJoinStream.join(left, right, fkOf, how = "left")
        .select(col("leftKey").as("key"),
          when(col("deleted"), lit(null: String))
            .otherwise(col("rightValue")).as("value"),
          lit(0L).as("ts"), col("seq"))
        .as[Rec]
      val q = KafkaEdges.sink(out, broker.bootstrapServers, "output-join",
          ckpt, format = "graft-kafka")
        .outputMode("append").start()
      try {
        feed("right-topic", ("adidas", "3"), ("puma", "4"))
        q.processAllAvailable()
        feed("left-topic", ("3 bands", "adidas|3 bands"),
          ("suede", "puma|suede"), ("classic", "nike|classic"))
        q.processAllAvailable()
        feed("right-topic", ("adidas", "5"))  // FK-side update re-joins
        q.processAllAvailable()
        feed("left-topic", ("suede", null))   // left delete → tombstone
        q.processAllAvailable()
      } finally q.stop()

      val byKey = (0 until 2).flatMap(p => producer.fetchAll("output-join", p))
        .sortBy(_.offset)
        .groupBy(r => new String(r.key, "UTF-8"))
        .view.mapValues(_.map(r =>
          Option(r.value).map(new String(_, "UTF-8"))).toList).toMap
      assert(byKey("3 bands") == List(Some("3"), Some("5")))
      assert(byKey("suede") == List(Some("4"), None))
      assert(byKey("classic") == List(None)) // dangling FK = null pad
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("IQ REST over the wire topology: the counts-store answers HTTP point reads") {
    // the reference runs its REST proxy NEXT TO the topology
    // (`utils/IQService.scala:11-17`, `WordCount.java:56` names the
    // store): same pairing here — WordCount fed over the broker socket,
    // then the checkpoint's aggregation state served over live HTTP.
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    val ckpt = Files.createTempDirectory("graft_kafka_iq").toString
    try {
      producer.produceStrings("lines", Seq(("l1", "all streams lead to kafka", 1000L),
        ("l2", "hello kafka streams", 2000L)))
      val counts = KafkaEdges.source(s, broker.bootstrapServers, "lines",
          format = "graft-kafka")
        .toDF()
        .select(explode(split(lower(col("value")), "\\W+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      val q = counts.writeStream.format("memory").queryName("iq_counts")
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try q.processAllAvailable() finally q.stop()

      val srv = new graft.state.StateHttpServer(s)
        .registerView("counts-store", () =>
          graft.state.StateQueries.flattened(s, ckpt)
            // the state buffer keeps the physical agg name ("count"),
            // not the query alias
            .select(col("key_word").as("word"), col("value_count").as("cnt")),
          keyCol = "word")
      val port = srv.start()
      try {
        val conn = new java.net.URI(
            s"http://127.0.0.1:$port/state/keyvalue/counts-store/kafka")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body = scala.io.Source.fromInputStream(is, "UTF-8").mkString
        conn.disconnect()
        assert(code == 200 && body == """[{"word":"kafka","cnt":2}]""",
          s"$code: $body")
      } finally srv.stop()
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("IQ RING over the wire topology: two instances, key-routed point reads") {
    // the reference's full multi-instance deployment shape
    // (`MetadataService.java:30-68`, `IQueriesService.java:104-109`):
    // one topology fed over the broker socket, TWO REST instances each
    // owning the partitioner's key slice, clients free to ask either.
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    val ckpt = Files.createTempDirectory("graft_kafka_iqring").toString
    try {
      producer.produceStrings("ringlines",
        Seq(("l1", "all streams lead to kafka", 1000L),
          ("l2", "hello kafka streams", 2000L)))
      val counts = KafkaEdges.source(s, broker.bootstrapServers, "ringlines",
          format = "graft-kafka")
        .toDF()
        .select(explode(split(lower(col("value")), "\\W+")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      val q = counts.writeStream.format("memory").queryName("iqring_counts")
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try q.processAllAvailable() finally q.stop()

      // each instance serves ITS slice of the same checkpoint — the
      // partitioner assignment the reference's source topic induces
      def slice(idx: Int) = () =>
        graft.state.StateQueries.flattened(s, ckpt)
          .select(col("key_word").as("word"), col("value_count").as("cnt"))
          .as[(String, Long)]
          .filter(r => Wire.partitionFor(r._1.getBytes("UTF-8"), 2) == idx)
          .toDF("word", "cnt")
      val srv0 = new graft.state.StateHttpServer(s)
        .registerView("counts-store", slice(0), keyCol = "word")
      val srv1 = new graft.state.StateHttpServer(s)
        .registerView("counts-store", slice(1), keyCol = "word")
      val p0 = srv0.start()
      val p1 = srv1.start()
      try {
        val ring = Seq(("127.0.0.1", p0), ("127.0.0.1", p1))
        srv0.enableRouting(ring, 0)
        srv1.enableRouting(ring, 1)
        def get(port: Int, path: String): (Int, String) = {
          val conn = new java.net.URI(s"http://127.0.0.1:$port$path")
            .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
          val code = conn.getResponseCode
          val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
          val body = scala.io.Source.fromInputStream(is, "UTF-8").mkString
          conn.disconnect()
          (code, body)
        }
        // every word answers identically from either instance, local or
        // one forwarded hop — including a word from each slice
        val expect = Map("kafka" -> 2L, "streams" -> 2L, "hello" -> 1L,
          "lead" -> 1L)
        expect.foreach { case (w, c) =>
          val want = s"""[{"word":"$w","cnt":$c}]"""
          assert(get(p0, s"/state/keyvalue/counts-store/$w") == ((200, want)), s"$w via p0")
          assert(get(p1, s"/state/keyvalue/counts-store/$w") == ((200, want)), s"$w via p1")
        }
        // at least one word lives on each slice (else the ring is vacuous)
        val owners = expect.keySet.map(w => Wire.partitionFor(w.getBytes("UTF-8"), 2))
        assert(owners == Set(0, 1), s"test words all on one slice: $owners")
        // owner metadata agrees with the placement from either instance
        expect.keySet.foreach { w =>
          val wantPort = if (Wire.partitionFor(w.getBytes("UTF-8"), 2) == 0) p0 else p1
          val (c, b) = get(p0, s"/state/instance/counts-store/$w")
          assert(c == 200 && b.contains(s""""port":$wantPort"""), s"$w: $b")
        }
      } finally { srv0.stop(); srv1.stop() }
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("tombstones survive the wire: null values produce null-value records") {
    // the S3 changelog contract (reference `.to(topic)` on a compacted
    // topic): a deleted key ships as key + NULL value. The v1 message
    // format encodes that as BYTES(-1); the sink, broker log, and fetch
    // must all preserve it.
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val broker = new MiniBroker(numPartitions = 2)
    val consumer = new MiniKafkaClient("localhost", broker.port)
    val ckpt = Files.createTempDirectory("graft_kafka_tomb").toString
    try {
      val in = MemoryStream[Rec]
      val q = KafkaEdges.sink(in.toDS(), broker.bootstrapServers, "changelog",
          ckpt, format = "graft-kafka")
        .outputMode("append").start()
      try {
        in.addData(Rec("k1", "v1", 1L, 0L), Rec("k1", null, 2L, 1L),
          Rec("k2", "v2", 3L, 2L))
        q.processAllAvailable()
      } finally q.stop()
      val recs = (0 until 2).flatMap(p => consumer.fetchAll("changelog", p))
        .map(r => (new String(r.key, "UTF-8"),
          Option(r.value).map(new String(_, "UTF-8"))))
      assert(recs.toSet == Set(("k1", Some("v1")), ("k1", None), ("k2", Some("v2"))))
      // last-write-wins compaction view: k1 reads as deleted
      val latest = recs.foldLeft(Map.empty[String, Option[String]])(_ + _)
      assert(latest == Map("k1" -> None, "k2" -> Some("v2")))
    } finally {
      consumer.close()
      broker.close()
    }
  }

  test("SCD2 over the wire: produce → graft-kafka source → StreamScd2 table, resumes across restart") {
    val s = spark
    import s.implicits._
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    val ckpt = Files.createTempDirectory("graft_scd2_wire_ck").toString
    val table = Files.createTempDirectory("graft_scd2_wire").toString + "/scd2"
    try {
      val topic = "attr-updates"
      // per-key distinct, increasing timestamps (the CDC delivery order)
      val leg1 = Seq(("u1", "a", 1000L), ("u1", "a", 2000L), ("u1", "b", 3000L),
        ("u2", "x", 1500L))
      producer.produceStrings(topic, leg1)

      def runOnce(): Unit = {
        val q = graft.streaming.StreamScd2.start(
          KafkaEdges.source(s, broker.bootstrapServers, topic,
            format = "graft-kafka"), table, ckpt)
        try q.processAllAvailable() finally q.stop()
      }
      def replayOf(recs: Seq[(String, String, Long)]) = {
        import org.apache.spark.sql.functions.col
        graft.operators.Changelog.scd2(
            recs.zipWithIndex.map { case ((k, v, t), i) => (k, v, t, i.toLong) }
              .toDF("key", "value", "ts", "seq"),
            Seq("key"), col("value"), col("ts"), Seq(col("ts"), col("seq")))
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
            if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
      }
      def tableNow() = graft.streaming.StreamScd2.table(s, table)
        .collect().map(i => (i.key, i.value, i.valid_from,
          i.valid_to.getOrElse(-1L), i.is_current)).toSet

      runOnce()
      assert(tableNow() == replayOf(leg1))
      assert(tableNow() == Set(
        ("u1", "a", 1000L, 3000L, false), ("u1", "b", 3000L, -1L, true),
        ("u2", "x", 1500L, -1L, true)))

      // leg 2: more updates over the wire, restart from the checkpoint —
      // offsets resume (no re-fold) and intervals keep chaining
      val leg2 = Seq(("u1", "b", 4000L), ("u2", "y", 5000L))
      producer.produceStrings(topic, leg2)
      runOnce()
      assert(tableNow() == replayOf(leg1 ++ leg2))
      assert(tableNow().count(_._5) == 2, "one open interval per key")
    } finally {
      producer.close()
      broker.close()
    }
  }

  test("record timestamps and offsets survive the wire into the source schema") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val broker = new MiniBroker(numPartitions = 2)
    val producer = new MiniKafkaClient("localhost", broker.port)
    try {
      // fixed partitions so per-partition offset order is deterministic
      producer.produce("meta", 1, Seq(
        Wire.WireRecord(0L, 1111L, "a".getBytes, "va".getBytes),
        Wire.WireRecord(0L, 2222L, "b".getBytes, "vb".getBytes)))
      val recs = KafkaEdges.source(s, broker.bootstrapServers, "meta",
        format = "graft-kafka")
      val q = recs.writeStream.format("memory").queryName("meta_out")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = s.table("meta_out").as[Rec].collect().sortBy(_.seq)
      // Rec projection: ts = producer-assigned epoch millis, seq = offset
      assert(got.toSeq == Seq(
        Rec("a", "va", 1111L, 0L), Rec("b", "vb", 2222L, 1L)))
    } finally {
      producer.close()
      broker.close()
    }
  }
}
