package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style date-partitioned parquet layout — the first-order scan
  * eliminator on a 100 TB fact table: a `dt=YYYY-MM-DD/` directory per
  * event day, so a day-ranged query plans `PartitionFilters` and never
  * LISTS (let alone reads) the other days' files, and a join against a
  * date-filtered dimension prunes partitions at RUNTIME via Spark's
  * dynamic partition pruning (the star-schema mechanism: the dim side's
  * qualifying keys become a subquery filter on the fact scan).
  *
  * This complements the other physical layouts in this package:
  * [[Bucketing]] pre-pays the JOIN shuffle, [[ZOrder]] tightens
  * row-group stats WITHIN files for multi-column range predicates, and
  * the date partitioning here cuts whole directories for time
  * predicates — production tables use all three at once (partition by
  * day, bucket by join key, z-order within).
  *
  * Partition-count discipline at scale: one directory per day keeps the
  * partition count linear in retention (thousands, not millions) —
  * partitioning by a high-cardinality key (user, doc) is the classic
  * small-files failure, which is what bucketing is for instead. */
object PartitionedLayout {

  /** Write `df` partitioned by the calendar day of `tsCol` (UTC — the
    * session timezone GraftSession pins). */
  def writeDaily(df: DataFrame, tsCol: Column, path: String): Unit =
    df.withColumn("dt", date_format(tsCol, "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("dt").parquet(path)

  /** Read the layout back; `dt` is a partition column, so equality /
    * range / IN filters on it become PartitionFilters (directory
    * pruning), and joins on it are dynamic-pruning candidates. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
