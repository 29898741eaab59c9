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

  /** Type-2 slowly-changing dimension from an attribute-update
    * changelog: one validity interval per (key, run of equal tracked
    * values). A row OPENS an interval when it is the key's first event
    * or its tracked value differs from the previous event's
    * (null-safe — a null run is one run); the NEXT change closes it
    * (`valid_to` = the next interval's `valid_from`; half-open
    * [from, to), so equal-timestamp changes yield zero-length
    * intervals rather than overlaps). Each key's last interval stays
    * open: `valid_to` null, `is_current` true. This is the warehouse
    * dimension-history shape, derived from the same changelog the
    * KTable surface consumes — [[latestByKey]] is exactly its
    * `is_current` slice.
    *
    * `orderCols` must totally order each key's events (include a
    * unique tie-break — same contract as [[latestByKey]]);
    * `validFrom` is the column stamped into the interval bounds
    * (typically epoch seconds for the cross-engine oracles).
    *
    * Scale shape: ONE hash(key) sort-shuffle feeds everything — the
    * change-detect lag, and (ordering preserved through the filter)
    * the interval-closing lead reuses the same sort with no second
    * exchange. Output size is the number of VALUE CHANGES, not events;
    * per-key window state is a row, not a history. */
  def scd2(df: DataFrame, keyCols: Seq[String], valueCol: Column,
           validFrom: Column, orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    val changes = df
      .withColumn("__v", valueCol)
      .withColumn("__from", validFrom)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col("__v"), 1).over(w))
      // null-safe change test: row 1 always opens (a first NULL value
      // is a run too — `prev IS DISTINCT FROM v` alone would drop it)
      .filter(col("__rn") === 1 || !(col("__prev") <=> col("__v")))
    changes
      .withColumn("valid_to", lead(col("__from"), 1).over(w))
      .select(keyCols.map(col) ++ Seq(col("__v").as("value"),
        col("__from").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current")): _*)
  }

  /** Merkle-style bucket reconciliation between two table versions: one
    * row per HASH BUCKET whose (row count, order-independent XOR of
    * row digests) disagree — the replication/backup verification shape
    * at 100 TB, where a row-level [[snapshotDiff]] (a full-outer join of
    * BOTH tables) is the expensive second step you only run on the
    * buckets this op flags. Each side costs one scan + one
    * buckets-sized aggregate (map-side partials: a count and a running
    * XOR per bucket per task); the comparison join touches `buckets`
    * rows however large the tables are. XOR is order- and
    * partitioning-independent, and a single changed row flips its
    * bucket's checksum with probability 1 − 2⁻⁶⁰ (md5-60 digests);
    * multi-row collisions within one bucket are the standard Merkle
    * caveat — pick `buckets` so expected rows/bucket keeps the paranoia
    * acceptable, or re-digest flagged buckets at a finer grain.
    *
    * `rowDigest` must stringify IDENTICALLY across engines for the
    * oracle gate (BIGINT/string columns only — float formatting forks;
    * move doubles to exact micro-units first). */
  def merkleDiff(old: DataFrame, neu: DataFrame, keyCol: Column,
                 rowDigest: Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    def side(df: DataFrame, pre: String) =
      df.select(graft.functions.Sampling.hashBucket(keyCol, buckets).as("bucket"),
          rowDigest.as("h"))
        .groupBy("bucket")
        .agg(count(lit(1)).as(s"${pre}_rows"),
          expr("bit_xor(h)").as(s"${pre}_checksum"))
    side(old, "old").join(side(neu, "new"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("old_rows"), lit(0L)).as("old_rows"),
        coalesce(col("new_rows"), lit(0L)).as("new_rows"),
        col("old_checksum"), col("new_checksum"))
      .filter(!(col("old_rows") <=> col("new_rows")) ||
        !(col("old_checksum") <=> col("new_checksum")))
  }

  /** Corpus snapshot diff — the CDC audit between two corpus versions:
    * one row per key that was `added`, `removed`, or `changed` (content
    * digest over `payloadCols` differs); unchanged keys produce nothing.
    * This is what an incremental ingest publishes instead of the full
    * table, and what a rebuild is validated against.
    *
    * NULL payload cells are digested as an out-of-band marker (\\u0000,
    * cells joined on \\u0001) so NULL ≠ '' and cell boundaries can't
    * alias (plain `concat_ws` would silently skip NULLs).
    *
    * Scale shape: digests are map-side; the single shuffle is the
    * full-outer hash join on the key. Snapshots written by
    * [[graft.sources.Bucketing]] on the key co-locate that join into a
    * zero-exchange merge (the j12 layout contract). */
  def snapshotDiff(old: DataFrame, neu: DataFrame, keyCol: String,
                   payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "need at least one payload column")
    def digest(df: DataFrame) = df.select(
      col(keyCol).as("k"),
      md5(concat_ws("\u0001",
        payloadCols.map(c => coalesce(col(c).cast("string"),
          lit("\u0000"))): _*)).as("d"))
    digest(old).withColumnRenamed("d", "da")
      .join(digest(neu).withColumnRenamed("d", "db")
        .withColumnRenamed("k", "kb"),
        col("k") === col("kb"), "full_outer")
      .select(coalesce(col("k"), col("kb")).as(keyCol),
        when(col("da").isNull, lit("added"))
          .when(col("db").isNull, lit("removed"))
          .when(col("da") =!= col("db"), lit("changed")).as("change"))
      .filter(col("change").isNotNull)
  }
}
