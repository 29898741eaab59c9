package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness parquet tables (`TESTDATA.md`).
  *
  * All loads are plain `spark.read.parquet` so Catalyst keeps full pushdown
  * freedom (column pruning + predicate pushdown reach the scan). Nothing is
  * cached here — at 100 TB these are scans, not materializations.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** `events` with usable event-time columns.
    *
    * The harness has shipped `ts` in two physical shapes across rounds —
    * parquet TIMESTAMP(NANOS), which `nanosAsLong=true` surfaces as epoch
    * **nanoseconds** in a long, and plain timestamp[us], which Spark reads
    * as TIMESTAMP_NTZ — so the loader dispatches on the arriving type
    * instead of assuming one. Either way we expose:
    *  - `ts`     — TimestampType (session-TZ = UTC, so NTZ wall time IS the
    *               instant, matching DuckDB's naive-timestamp `epoch()`).
    *               Used for `window()` / `session_window()`.
    *  - `ts_sec` — epoch seconds (long), FLOORED (long cast of a timestamp
    *               floor-divides micros; `div 1e9` truncates identically for
    *               the positive epochs here; DuckDB side is
    *               `floor(epoch(ts))`). All cross-engine outputs use this:
    *               second-granularity integers are representation-exact in
    *               both engines, where raw ns-vs-us timestamps are not.
    * Truncation (not rounding) never moves an event across a whole-second
    * or whole-window boundary, so window assignment is unaffected.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_sec", expr("ts div 1000000000"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_sec", col("ts").cast("long"))
    }
  }
}
