package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact ranking primitives — the x53-class caveat
  * (per-group ordered windows bound parallelism by group cardinality)
  * solved once as a LIBRARY shape instead of per query:
  * [[Selection.perplexityBucketsParallel]] (x90) and the x91 equi-depth
  * rewrite are both this operator. */
object Ranks {

  /** Exact per-group SQL `ntile(k)` at (group, bin) parallelism — the
    * classic distributed-ranking rewrite. `binOf` must be a MONOTONE
    * coarse function of the order VALUE alone (equal values share a
    * bin; bin order = value order), e.g. `floor(value * 8)`: the exact
    * global rank is then the per-(group, bin) `row_number` (ordered by
    * (value, tie)) plus the group's running count of earlier bins, and
    * SQL-ntile's uneven-bucket rule (the first n mod k buckets carry
    * one extra row) is a closed form of (rank, n). No per-group window
    * ever sees data-sized rows: the offset/total window runs over the
    * (group, bin) COUNT table, dimension-sized at any input size.
    *
    * Returns the input columns plus `ntile` (1..k). Output is
    * row-for-row identical to `ntile(k) OVER (PARTITION BY group ORDER
    * BY value, tie)` — x90/x91 pin that against the ntile-window
    * oracles cross-engine. Reserved working names are collision-checked. */
  def rangeParallelNtile(df: DataFrame, groupCol: String, valueCol: String,
                         tieCol: String, k: Int, binOf: Column): DataFrame = {
    require(k >= 1, s"k >= 1, got $k")
    val reserved = Seq("__bin", "__c", "__off", "__n", "__rn", "__rank", "ntile")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"columns reserved by rangeParallelNtile: " +
      s"${clash.mkString(", ")} — alias them first")
    val binned = df.withColumn("__bin", binOf)
    val cnt = binned.groupBy(col(groupCol), col("__bin"))
      .agg(count(lit(1)).as("__c"))
    val off = cnt
      .withColumn("__off", coalesce(sum("__c").over(
        Window.partitionBy(groupCol).orderBy("__bin")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum("__c").over(Window.partitionBy(groupCol)))
      .select(col(groupCol), col("__bin"), col("__off"), col("__n"))
    binned
      .withColumn("__rn", row_number().over(
        Window.partitionBy(groupCol, "__bin")
          .orderBy(col(valueCol), col(tieCol))))
      .join(off, Seq(groupCol, "__bin"))
      .withColumn("__rank", col("__off") + col("__rn"))
      .withColumn("ntile",
        when(expr(s"__n div $k") === 0, col("__rank"))
          .when(col("__rank") <= (col("__n") % k) * (expr(s"__n div $k") + 1),
            expr(s"(__rank - 1) div ((__n div $k) + 1) + 1"))
          .otherwise(expr(s"(__n % $k) + " +
            s"(__rank - (__n % $k) * ((__n div $k) + 1) - 1) div (__n div $k) + 1"))
          .cast("int"))
      .drop("__bin", "__off", "__n", "__rn", "__rank")
  }
}
