package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream windowed joins (reference `apps/WindowedJoin.scala:46-53`,
  * SURVEY.md §2.5 J1/J2).
  *
  * Both sides carry a watermark; the join condition is the key equality
  * plus the time band |tsL − tsR| ≤ window. Spark holds both sides' state
  * until the global watermark passes the band, then:
  *  - inner: matched rows emitted as they meet;
  *  - leftOuter: unmatched left rows emit (left, null) once the watermark
  *    proves no match can arrive — the reference's "left value emitted
  *    after window expires" (`TopologiesTest.scala:492-510`).
  *
  * Null keys never join; the reference drops them at the source
  * (`TopologiesTest.scala:288`) and we filter them identically.
  */
object StreamJoins {

  /** Band join of two keyed streams. `input`s need columns
    * (key, value, ts:timestamp). Column names are prefixed l_/r_ in the
    * output. */
  def bandJoin(left: DataFrame, right: DataFrame, bandSeconds: Long,
               grace: String, how: String = "inner"): DataFrame = {
    val l = left.filter(col("key").isNotNull)
      .select(col("key").as("l_key"), col("value").as("l_value"), col("ts").as("l_ts"))
      .withWatermark("l_ts", grace)
    val r = right.filter(col("key").isNotNull)
      .select(col("key").as("r_key"), col("value").as("r_value"), col("ts").as("r_ts"))
      .withWatermark("r_ts", grace)
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $bandSeconds SECONDS") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $bandSeconds SECONDS"),
      how)
  }
}
