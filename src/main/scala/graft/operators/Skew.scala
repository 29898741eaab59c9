package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew treatments for the cases AQE's runtime skew-join split
  * does not cover (broadcast-infeasible dimension with a hot key;
  * non-algebraic aggregates like exact distinct where a single reducer
  * key melts).
  *
  * AQE (enabled in [[graft.GraftSession]]) already splits skewed
  * sort-merge join partitions at runtime; use these when the skew is in
  * the *data semantics* — one key carrying a double-digit percentage of
  * the table — so no partition split can help.
  */
object Skew {

  /** Salted two-phase exact distinct count per key. Phase 1 dedups
    * (key, value) pairs sharded by a salt derived from the VALUE (each
    * shard sees a disjoint value set), phase 2 sums shard counts. A hot
    * key's dedup work spreads over `buckets` reducers instead of one. */
  def saltedDistinctCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                          buckets: Int, outCol: String): DataFrame = {
    val keys = keyCols.map(col)
    df.select(keys :+ col(valueCol): _*)
      .withColumn("__salt", pmod(hash(col(valueCol)), lit(buckets)))
      .distinct() // shuffles on (keys, value-salted) — skew spread
      .groupBy(keys :+ col("__salt"): _*)
      // count(col) skips NULL values — exactly count(DISTINCT v) semantics,
      // including a 0 row for a group whose values are all NULL (which a
      // row-level null pre-filter would silently drop from the output)
      .agg(count(col(valueCol)).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum("__partial").as(outCol))
  }

  /** Salted join for a skewed left against a modest right: the left gets a
    * random-ish salt in [0, buckets), the right is replicated `buckets`
    * times, and the join key becomes (key, salt). Replication factors the
    * hot key's probe work across `buckets` tasks at the cost of
    * |right| × buckets build rows — use when right fits that expansion
    * but not a broadcast. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
                 rightKey: String, buckets: Int,
                 how: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(buckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight,
        saltedLeft(leftKey) === replicatedRight(rightKey) &&
          saltedLeft("__salt") === replicatedRight("__salt"), how)
      .drop("__salt")
  }
}
