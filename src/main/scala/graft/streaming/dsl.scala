package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Kafka-Streams-flavored facade over the graft operators, so a topology
  * from the reference ports nearly verbatim:
  *
  * {{{
  * import graft.streaming.dsl._
  * source.mapValues(v => (v.toInt * v.toInt).toString)   // TopologiesTest.scala:43
  *   .selectKey((k, v) => s"$k!")
  *   .toTable                                            // builder.table
  * left.fkLeftJoin(right, fkOf)                          // ForeignJoin.scala:37-42
  * }}}
  *
  * Everything delegates to the Dataset/DataFrame combinators — the facade
  * adds zero execution machinery, so Catalyst sees exactly the plans the
  * raw API produces. (The capability contract is SURVEY.md §2; this layer
  * is ergonomics for reference users.)
  */
object dsl {

  implicit class KStreamOps(private val stream: Dataset[Rec]) {

    /** 1→1 value transform (reference ValueMapper). */
    def mapValues(f: String => String): Dataset[Rec] = {
      val spark = stream.sparkSession
      import spark.implicits._
      stream.map(r => r.copy(value = if (r.value == null) null else f(r.value)))
    }

    /** 1→N value transform (reference flatMapValues / LineSplit). */
    def flatMapValues(f: String => Seq[String]): Dataset[Rec] = {
      val spark = stream.sparkSession
      import spark.implicits._
      stream.flatMap(r =>
        if (r.value == null) Seq(r)
        else f(r.value).map(v => r.copy(value = v)))
    }

    /** Re-key (reference selectKey). Nulls allowed; drop with
      * [[filterNotNullKeys]] before stateful ops, as the reference does. */
    def selectKey(f: (String, String) => String): Dataset[Rec] = {
      val spark = stream.sparkSession
      import spark.implicits._
      stream.map(r => r.copy(key = f(r.key, r.value)))
    }

    def filterRecords(p: Rec => Boolean): Dataset[Rec] = stream.filter(p)

    def filterNotNullKeys: Dataset[Rec] = KTableStream.dropNullKeys(stream)

    /** Changelog view of the stream (reference `builder.table` /
      * `toTable`): emits [[Change]] rows; materialize with
      * [[graft.operators.Changelog.latestByKey]]. */
    def toTable: Dataset[Change] = KTableStream.changes(stream)

    /** Windowed stream-stream join (reference KStream.join with
      * JoinWindows). */
    def bandJoin(other: Dataset[Rec], bandSeconds: Long, grace: String,
                 how: String = "inner"): DataFrame =
      StreamJoins.bandJoin(recsAsKvt(stream), recsAsKvt(other), bandSeconds, grace, how)

    /** Stream enriched against a table's current value (reference
      * KStream⋈KTable). */
    def joinTable(table: Dataset[Rec], how: String = "inner"): Dataset[JoinChange] =
      StreamTableJoin.enrich(stream, table, how)
  }

  /** Table-side verbs, on the raw changelog stream (the table IS its
    * changelog, exactly as in Kafka Streams). */
  implicit class KTableOps(private val table: Dataset[Rec]) {

    /** Primary-key table-table join (reference KTable.join/leftJoin). */
    def pkJoin(other: Dataset[Rec], how: String = "inner"): Dataset[JoinChange] =
      PkJoinStream.join(table, other, how)

    /** Foreign-key table-table join (reference KTable FK join). */
    def fkJoin(other: Dataset[Rec], fkOf: String => String,
               how: String = "left"): Dataset[FkJoinChange] =
      FkJoinStream.join(table, other, fkOf, how)
  }

  /** Adapt `Rec` (seq-ordered, epoch-seconds `ts`) to the (key, value,
    * ts:timestamp) shape the windowed joins take. */
  private def recsAsKvt(ds: Dataset[Rec]): DataFrame =
    ds.select(col("key"), col("value"), timestamp_seconds(col("ts")).as("ts"))
}
