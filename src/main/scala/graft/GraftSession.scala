package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so every entry point (Verify, Bench, tests,
  * user code) runs with identical, scale-aware settings.
  *
  * Settings rationale (targets a 1000-executor cluster; tested on local[N]):
  *  - AQE on: runtime shuffle-partition coalescing + skew-join splitting are
  *    the main levers that keep a fixed plan healthy at 100 TB.
  *  - `spark.sql.legacy.parquet.nanosAsLong=true`: the harness parquet
  *    (`events.ts`) is TIMESTAMP(NANOS), which Spark cannot represent
  *    natively; we read it as a long and convert explicitly (see
  *    [[Tables.events]]).
  *  - UTC session timezone: event-time semantics must not depend on the
  *    cluster's locale.
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Keep the codegen stage id OUT of generated class names: under AQE
      // the id reflects runtime stage ordering, so structurally identical
      // plan fragments (every round of an iterative algorithm, every
      // re-run of a query) would get fresh class names and miss the
      // compiled-class cache — measured ~12 needless Janino compiles per
      // connected-components round. The id stays in the explain output.
      .config("spark.sql.codegen.useIdInClassName", "false")
      // The compiled-class cache defaults to 100 entries; a session running
      // many distinct queries (or an iterative loop with several stages per
      // round) cycles past that and recompiles on every revisit. Classes
      // are small; 1000 entries is a few MB of metaspace. (Static conf —
      // must be set before the session exists.)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")

  /** Local session sized like the driver harness (local[N], N shuffle
    * partitions — not the 200 default, which just fragments tiny inputs). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Apply the graft configs to an externally-created session's conf where
    * possible (runtime-settable ones only). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark
  }
}
