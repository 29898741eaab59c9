package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Streaming percolation — the live face of `Retrieval.percolate`:
  * standing term-set queries matched against every ARRIVING document,
  * emitting (query_id, doc key, ts) alert rows the moment a document
  * containing all of a query's terms lands. The routing/alerting
  * primitive: documents flow, queries stand still.
  *
  * Stateless by design: each match depends only on the arriving row and
  * the broadcast query table, so the operator is a per-batch projection
  * — no state store, no watermark, append mode, and restart semantics
  * are exactly the source's replay semantics. The standing set rides a
  * literal table under the same ≤64-term bound as the batch side; the
  * batch percolator's rarest-term anchoring is a corpus-side
  * optimization and deliberately absent here (a micro-batch IS the
  * candidate set).
  *
  * Scale: matching cost is |batch| × |queries| array-containment
  * checks, all inside whole-stage codegen; alert volume, not corpus
  * volume, crosses the sink. */
object StreamPercolate {

  /** One alert: `query_id` matched the document carried as (key, ts). */
  case class Alert(query_id: String, key: String, ts: Long)

  /** Match a [[Rec]] document stream (value = text) against standing
    * queries; emits one alert per (query, matching document). */
  def alerts(docs: Dataset[Rec],
             queries: Seq[(String, Seq[String])]): Dataset[Alert] = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "every standing query needs at least one term")
    require(queries.map(_._1).distinct.size == queries.size,
      "standing query ids must be unique")
    require(queries.flatMap(_._2).distinct.size <= 64,
      "standing term set must be small (bounded broadcast)")
    val spark = docs.sparkSession
    import spark.implicits._
    val qDf = queries.toDF("query_id", "qterms")
    docs.toDF()
      .filter(col("value").isNotNull)
      .select(col("key"), col("ts"),
        TextAnalysis.tokens(col("value")).as("tk"))
      .join(broadcast(qDf),
        expr("forall(qterms, t -> array_contains(tk, t))"))
      .select(col("query_id"), col("key"), col("ts")).as[Alert]
  }

  /** The batch replay of [[alerts]] over a static (key, value, ts)
    * frame — the spec's equivalence target. */
  def alertsBatch(docs: DataFrame,
                  queries: Seq[(String, Seq[String])]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qDf = queries.toDF("query_id", "qterms")
    docs.filter(col("value").isNotNull)
      .select(col("key"), col("ts"), TextAnalysis.tokens(col("value")).as("tk"))
      .join(broadcast(qDf),
        expr("forall(qterms, t -> array_contains(tk, t))"))
      .select(col("query_id"), col("key"), col("ts"))
  }
}
