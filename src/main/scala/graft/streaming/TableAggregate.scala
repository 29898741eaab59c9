package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Table re-aggregation — Kafka Streams' `KGroupedTable.aggregate /
  * reduce(adder, subtractor)` (the KTable grouping surface next to the
  * reference's stream-side groupBy, SURVEY.md §2.3): maintain an
  * aggregate per DERIVED group over the latest value of every table key,
  * kept correct under upserts, deletes, and keys migrating between
  * groups.
  *
  * Construction: each [[Change]] becomes at most two delta events — the
  * subtractor's −contribution(old) against the group the replaced value
  * belonged to, and the adder's +contribution(new) to the new value's
  * group. The running per-group total is then a plain streaming
  * aggregation over the deltas (map-side partials, update-mode
  * changelog) — a key that moves groups retracts from its former group
  * and adds to its new one in the same batch, which is exactly the
  * adder/subtractor contract.
  *
  * Works unchanged on a batch `Dataset[Change]` (the spec replays one)
  * and on the live [[KTableStream.changes]] output. Scale: the only
  * exchange is the group-keyed aggregation; state is O(|groups|).
  *
  * Use amounts with an exact representation (integral cents, counts):
  * the retraction arithmetic is exact there, while accumulated float
  * rounding would drift from a from-scratch recompute. */
object TableAggregate {

  /** Per-group running sum of `amountOf(latest value)`, grouped by
    * `groupOf(latest value)`. Null-valued changes (tombstones) only
    * retract. Output columns: (grp, total, n_keys). */
  def sumByGroup(changes: Dataset[Change], groupOf: String => String,
                 amountOf: String => Long): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes.flatMap { c =>
      val sub = Option(c.old).map(v => (groupOf(v), -amountOf(v), -1L))
      val add = Option(c.value).map(v => (groupOf(v), amountOf(v), 1L))
      sub.toSeq ++ add.toSeq
    }.toDF("grp", "delta", "dkey")
      .groupBy("grp")
      .agg(sum("delta").as("total"), sum("dkey").as("n_keys"))
  }
}
