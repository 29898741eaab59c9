package graft.streaming

import graft.SparkSpec
import graft.functions.{DedupOps, TextAnalysis}
import graft.operators.EventTime
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.sql.Timestamp

case class CDoc(doc_id: Long, text: String, source: String, ts: Timestamp)

/** Capstone: the c1/c2 curation composition as ONE streaming pipeline —
  * exact dedup within the watermark horizon → benchmark decontamination
  * (broadcast digest probe as a pure expression) → quality gate →
  * per-source tumbling counts in append mode. The batch twin runs the
  * same stages on the same rows; closed windows must agree exactly.
  * This is the online ingest shape of the batch curation pipelines:
  * every stage is stateless or watermark-bounded, so the composition
  * holds at firehose scale. */
class StreamingCurationSpec extends SparkSpec {

  private val base = 1700000000L
  private def ts(off: Long) = new Timestamp((base + off) * 1000)

  test("stream dedup → decontaminate → quality gate → windowed counts ≡ batch") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext

    val bench = Seq((100L, "leaked benchmark question about cheese wheels"))
      .toDF("id", "text")
    // the d9 broadcast-probe discipline, collapsed to a literal array so
    // the contamination test is a pure expression (usable mid-stream
    // with no extra join state)
    val benchDigests = DedupOps
      .shingleRows(bench, "id", "text", 3)
      .select(md5(col("sh")).as("h")).distinct().as[String].collect().sorted
    val benchLit = array(benchDigests.map(lit): _*)

    def gates(df: DataFrame): DataFrame = df
      .withColumn("shh",
        transform(DedupOps.shingles(TextAnalysis.tokens(col("text")), 3),
          sh => md5(sh)))
      .filter(!arrays_overlap(col("shh"), benchLit))
      .filter(size(TextAnalysis.tokens(col("text"))) >= 3)

    def windowed(df: DataFrame): DataFrame = df
      .groupBy(window(col("ts"), "1 minute"), col("source"))
      .agg(count(lit(1)).as("n"))
      .select(col("source"), EventTime.startSec(col("window")).as("w"), col("n"))

    val docs = Seq(
      // the dup pair shares source AND window: dropDuplicatesWithinWatermark
      // guarantees ONE survivor, not WHICH, so the windowed counts must be
      // survivor-independent for the equivalence to be a guaranteed law
      CDoc(1, "alpha beta gamma delta", "a", ts(0)),
      CDoc(2, "alpha beta gamma delta", "a", ts(5)),   // exact dup → one survives
      CDoc(3, "epsilon zeta eta theta", "a", ts(10)),
      CDoc(4, "leaked benchmark question about cheese wheels", "a", ts(20)), // contaminated
      CDoc(5, "xx yy", "b", ts(30)),                   // fails the ≥3-token gate
      CDoc(6, "iota kappa lambda mu", "b", ts(70)),
      CDoc(7, "nu xi omicron pi", "a", ts(1300)))      // advances the watermark

    val in = MemoryStream[CDoc]
    val q = windowed(gates(
        StreamDedup.firstPerFingerprint(in.toDF(), "text", "ts", "1 minute")))
      .writeStream.format("memory").queryName("scur").outputMode("append")
      .start()
    val streamed = try {
      in.addData(docs: _*)   // arrival order = ts order, so first-arrival = min ts
      q.processAllAvailable()
      s.table("scur").as[(String, Long, Long)].collect().toSet
    } finally q.stop()

    // batch twin: keep the min-(ts, doc_id) row per fingerprint, then the
    // same gates and windows; compare the windows the stream has CLOSED
    val firstPerFp = Window.partitionBy("fp").orderBy(col("ts"), col("doc_id"))
    val batch = windowed(gates(
      docs.toDF()
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
        .withColumn("rn", row_number().over(firstPerFp)).filter(col("rn") === 1)))
      .as[(String, Long, Long)].collect().toSet
      .filter(_._2 < base + 1200)

    assert(streamed == batch, s"streamed $streamed != batch $batch")
    // tumbling windows align to epoch minutes (base % 60 = 20): the
    // first window opens 20 s before base and catches t ∈ [0, 40)
    assert(streamed == Set(("a", base - 20, 2L), ("b", base + 40, 1L)), streamed)
  }
}
