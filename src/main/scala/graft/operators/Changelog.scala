package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KTable emulation — changelog/upsert views over an append stream.
  *
  * The reference models a topic as a table of latest-values-per-key with
  * null-value tombstones (`builder.table`, reference
  * `src/main/scala/com/ayoubom/kafka/apps/ForeignJoin.scala:28-34`;
  * tombstones driven at `src/test/scala/com/ayoubom/kafka/TopologiesTest.scala:234-235`).
  * Spark has no first-class changelog relation; this object provides the
  * batch materialization. The streaming counterpart lives in
  * [[graft.streaming.KTable]].
  */
object Changelog {

  /** Latest row per key, by a total ordering (e.g. event time + a unique
    * sequence column as tie-break — ALWAYS include one; `max_by` over a
    * non-total order is nondeterministic).
    *
    * Implementation: single hash aggregation `max_by(struct(*), struct(ord))`
    * rather than a `row_number()` window. Both shuffle once on the key, but
    * the aggregate form gets a map-side partial (each task keeps one row per
    * key) and never sorts — at 100 TB that is the difference between a
    * shuffle of |keys| rows and a full-data sort-shuffle.
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val all = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(all, struct(orderCols: _*)).as("__latest"))
      .select(col("__latest.*"))
  }

  /** Changelog materialization with tombstones: keep each key's latest row,
    * then drop keys whose latest row is a delete marker. (Kafka Streams'
    * null-value tombstone, generalized to a predicate since our harness rows
    * are non-null structs.) */
  def upsertView(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
                 isTombstone: Column): DataFrame =
    latestByKey(df, keyCols, orderCols).filter(!isTombstone)

  /** `row_number()`-based variant, kept for when the caller additionally
    * needs "previous value" semantics (rank > 1 rows). Prefer
    * [[latestByKey]] otherwise — this one sort-shuffles the full input. */
  def latestByKeyWindowed(df: DataFrame, keyCols: Seq[String], orderDesc: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderDesc.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
