package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Changelog.scd2]] — interval semantics on a crafted changelog:
  * runs collapse, intervals chain half-open, null values form runs,
  * and the is_current slice agrees with [[Changelog.latestByKey]]. */
class Scd2Spec extends SparkSpec {

  import spark.implicits._

  // (key, seq, ts, value): u1 changes a→a→b→b→a (runs a,b,a);
  // u2 is a single event; u3 starts null → null → x (null run first)
  private def log = Seq(
    ("u1", 1L, 10L, Some("a")), ("u1", 2L, 20L, Some("a")),
    ("u1", 3L, 30L, Some("b")), ("u1", 4L, 40L, Some("b")),
    ("u1", 5L, 50L, Some("a")),
    ("u2", 1L, 15L, Some("z")),
    ("u3", 1L, 5L, None), ("u3", 2L, 6L, None), ("u3", 3L, 7L, Some("x"))
  ).toDF("k", "seq", "ts", "v")

  private def intervals = Changelog.scd2(log, Seq("k"), col("v"), col("ts"),
    Seq(col("ts"), col("seq")))

  test("runs of equal values collapse to chained half-open intervals") {
    val got = intervals.orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    val want = Seq(
      ("u1", Some("a"), 10L, 30L, false),
      ("u1", Some("b"), 30L, 50L, false),
      ("u1", Some("a"), 50L, -1L, true),
      ("u2", Some("z"), 15L, -1L, true),
      ("u3", None, 5L, 7L, false),
      ("u3", Some("x"), 7L, -1L, true))
    assert(got.toSeq === want)
  }

  test("each key's intervals tile: valid_to = next valid_from, one open tail") {
    val rows = intervals.collect()
      .map(r => (r.getString(0), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .groupBy(_._1)
    rows.foreach { case (_, iv) =>
      val sorted = iv.sortBy(_._2)
      assert(sorted.count(_._3.isEmpty) === 1, "exactly one open interval per key")
      sorted.sliding(2).foreach {
        case Array((_, _, Some(to)), (_, from, _)) => assert(to === from)
        case _ =>
      }
      assert(sorted.last._3.isEmpty, "the open interval is the last one")
    }
  }

  test("is_current slice ≡ latestByKey on the tracked value") {
    val current = intervals.filter(col("is_current"))
      .select(col("k"), col("value"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    val latest = Changelog.latestByKey(log, Seq("k"), Seq(col("ts"), col("seq")))
      .select(col("k"), col("v"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(current === latest)
  }

  test("as-of filter at a cutoff ≡ latestByKey over the truncated changelog") {
    val cut = 35L
    val asOf = intervals
      .filter(col("valid_from") <= cut &&
        (col("valid_to").isNull || col("valid_to") > cut))
      .select(col("k"), col("value"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    val latest = Changelog.latestByKey(log.filter(col("ts") <= cut),
        Seq("k"), Seq(col("ts"), col("seq")))
      .select(col("k"), col("v"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(asOf === latest)
    assert(asOf === Set(("u1", Some("b")), ("u2", Some("z")), ("u3", Some("x"))))
  }

  test("one sort-shuffle: a single Exchange under both windows") {
    val plan = intervals.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected one key exchange, plan:\n$plan")
  }
}
