package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics on hand-built timelines: strict vs non-strict
  * time bounds, no-predecessor null padding, and same-timestamp
  * tie-breaking (winner = max_by(time, tieBreak) among visible events). */
class AsOfJoinSpec extends SparkSpec {

  private def run(strict: Boolean) = {
    val s = spark
    import s.implicits._
    // prices: key p at t=10 → 100, t=20 → 200 (and a same-time duplicate
    // at t=20 with tb=1 → 250 that must win the tie-break)
    val right = Seq(("p", 10L, 0L, 100L), ("p", 20L, 0L, 200L), ("p", 20L, 1L, 250L),
      ("q", 50L, 0L, 900L)).toDF("k", "t", "tb", "price")
    // probes at t=5 (before any), t=10 (equal), t=25 (after both)
    val left = Seq((1L, "p", 5L), (2L, "p", 10L), (3L, "p", 25L), (4L, "q", 40L))
      .toDF("id", "k", "t")
    AsOfJoin.asof(left, right, col("k"), col("k"), col("t"), col("t"), "id",
        Seq("price" -> col("price")), col("tb"), strict = strict)
      .as[(Long, Option[Long])].collect().toMap
  }

  test("non-strict: equal-time event is visible; ties resolved by tieBreak") {
    assert(run(strict = false) ==
      Map(1L -> None, 2L -> Some(100L), 3L -> Some(250L), 4L -> None))
  }

  test("strict: equal-time event is NOT visible") {
    assert(run(strict = true) ==
      Map(1L -> None, 2L -> None, 3L -> Some(250L), 4L -> None))
  }

  test("an event with a NULL picked value is the match — not skipped for a stale one") {
    val s = spark
    import s.implicits._
    val right = Seq(("p", 10L, 0L, Some(100L)), ("p", 20L, 0L, None))
      .toDF("k", "t", "tb", "price")
    val left = Seq((1L, "p", 25L)).toDF("id", "k", "t")
    val out = AsOfJoin.asof(left, right, col("k"), col("k"), col("t"), col("t"), "id",
        Seq("price" -> col("price")), col("tb"))
      .as[(Long, Option[Long])].collect().toMap
    // latest event (t=20) carries NULL price: the as-of value IS null,
    // not the superseded 100 from t=10
    assert(out == Map(1L -> None))
  }

  test("NULL keys never match (SQL equality): null-key probe is null-padded") {
    val s = spark
    import s.implicits._
    val right = Seq((Option.empty[String], 1L, 0L, 7L), (Some("p"), 1L, 0L, 9L))
      .toDF("k", "t", "tb", "price")
    val left = Seq((1L, Option.empty[String], 5L), (2L, Some("p"), 5L))
      .toDF("id", "k", "t")
    val out = AsOfJoin.asof(left, right, col("k"), col("k"), col("t"), col("t"), "id",
        Seq("price" -> col("price")), col("tb"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> None, 2L -> Some(9L)))
  }

  test("NULL-time events never match (rightTime <= leftTime is never true for NULL)") {
    val s = spark
    import s.implicits._
    val right = Seq((Some("p"), Option.empty[Long], 0L, 5L), (Some("p"), Some(10L), 0L, 9L))
      .toDF("k", "t", "tb", "price")
    val left = Seq((1L, "p", 100L), (2L, "p", 5L)).toDF("id", "k", "t")
    val out = AsOfJoin.asof(left, right, col("k"), col("k"), col("t"), col("t"), "id",
        Seq("price" -> col("price")), col("tb"))
      .as[(Long, Option[Long])].collect().toMap
    // probe@100 matches the t=10 event; probe@5 precedes every real event
    assert(out == Map(1L -> Some(9L), 2L -> None))
  }

  test("plan: single key-partitioned window, no pair join of left×history") {
    val s = spark
    import s.implicits._
    val right = Seq(("p", 10L, 0L, 100L)).toDF("k", "t", "tb", "price")
    val left = Seq((1L, "p", 5L)).toDF("id", "k", "t")
    val p = AsOfJoin.asof(left, right, col("k"), col("k"), col("t"), col("t"), "id",
      Seq("price" -> col("price")), col("tb")).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p) // merge-scan: union + window, no join at all
    assert(p.contains("Window"), p)
  }
}
