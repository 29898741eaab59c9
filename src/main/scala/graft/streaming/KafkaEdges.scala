package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Kafka edge wiring — the reference's only connector surface
  * (`builder.stream(topic, Consumed.with(...))` at reference
  * `apps/WindowedGrouping.scala:42`, `Pipe.java:44`; sinks
  * `.to(topic, Produced.with(...))` at `apps/WindowedGrouping.scala:48`,
  * `WordCount.java:58`; SURVEY.md §2.1 S1/S3).
  *
  * Split in two layers so the logic is testable without a broker:
  *  - [[project]] / [[toKafkaColumns]] are pure column mappings between
  *    Kafka's wire schema (`key`/`value` binary, `timestamp`, `offset`)
  *    and the engine's [[Rec]] record model — unit-tested on static
  *    DataFrames carrying the same schema;
  *  - [[source]] / [[sink]] bolt those mappings onto
  *    `format("kafka")` streams. They compile against stock Spark (the
  *    format is resolved at runtime), so environments without the
  *    `spark-sql-kafka` connector jar can still build and test everything
  *    above this line.
  *
  * Serde stance (reference `serdes/JsonSerde.scala:10-36`): keys/values
  * travel as UTF-8 strings; structured payloads ride as JSON in `value`
  * and are opened with `from_json` downstream — schema is declared at the
  * edge, exactly where the reference plugs its serdes.
  */
object KafkaEdges {

  /** Kafka source record projection → [[Rec]]:
    * key/value bytes cast to UTF-8 strings (null key stays null, null
    * value is a tombstone), event time = the record timestamp in epoch
    * millis (producer-assigned, reference `Producer.scala:41-45`), and
    * `seq` = the per-partition offset — Kafka's order guarantee carried
    * into the engine's per-source total order. */
  def project(raw: DataFrame): Dataset[Rec] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"),
      unix_millis(col("timestamp")).as("ts"),
      col("offset").cast("long").as("seq"))
      .as[Rec]
  }

  /** Inverse mapping for the sink side: `Rec` → Kafka's writer schema
    * (`key`, `value` strings; the connector serializes to bytes). A null
    * value row becomes a Kafka tombstone on a compacted topic — the
    * changelog contract. */
  def toKafkaColumns(recs: Dataset[Rec]): DataFrame =
    recs.select(col("key").cast("string").as("key"),
      col("value").cast("string").as("value"))

  /** Subscribe `topic` as an append stream of [[Rec]]
    * (reference S1: `builder.stream(topic, ...)`). `format` picks the
    * transport: `"kafka"` (stock connector, when its jar ships) or
    * `"graft-kafka"` ([[graft.kafka.GraftKafkaSourceProvider]], the
    * wire-protocol DSv2 edge this repo carries) — both expose the same
    * options and read schema, so topology code is transport-agnostic. */
  def source(spark: SparkSession, bootstrapServers: String, topic: String,
             startingOffsets: String = "earliest",
             format: String = "kafka"): Dataset[Rec] =
    project(
      spark.readStream.format(format)
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load())

  /** Produce a changelog/stream to `topic`
    * (reference S3: `.to(topic, Produced.with(...))`). Caller starts the
    * returned writer with its own trigger/output-mode choices. */
  def sink(recs: Dataset[Rec], bootstrapServers: String, topic: String,
           checkpointLocation: String,
           format: String = "kafka"): DataStreamWriter[Row] =
    toKafkaColumns(recs).writeStream
      .format(format)
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)

  /** True when the Kafka connector jar is on the classpath — specs gate
    * live-broker paths on this so builds without the jar stay green. */
  def connectorAvailable: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }
}
