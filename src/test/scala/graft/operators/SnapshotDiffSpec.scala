package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot CDC: exact added/removed/changed partition, silence on
  * unchanged keys, and NULL-vs-empty payload discrimination. */
class SnapshotDiffSpec extends SparkSpec {

  test("added / removed / changed / unchanged are classified exactly") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "p1", "p2")
    val neu = Seq((2L, "b", "y"), (3L, "c", "CHANGED"), (4L, "d", "w"))
      .toDF("id", "p1", "p2")
    val got = Changelog.snapshotDiff(old, neu, "id", Seq("p1", "p2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("NULL payload is distinct from empty string and from the marker text") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, Some("")), (2L, Some("x")), (3L, Option.empty[String]))
      .toDF("id", "p")
    val neu = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Some("")))
      .toDF("id", "p")
    val got = Changelog.snapshotDiff(old, neu, "id", Seq("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "" -> NULL and NULL -> "" are both CHANGES; "x" -> "x" is silent
    assert(got === Map(1L -> "changed", 3L -> "changed"))
  }

  test("cell boundaries cannot alias: (ab, c) differs from (a, bc)") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, "ab", "c")).toDF("id", "p1", "p2")
    val neu = Seq((1L, "a", "bc")).toDF("id", "p1", "p2")
    val got = Changelog.snapshotDiff(old, neu, "id", Seq("p1", "p2")).collect()
    assert(got.length === 1 && got.head.getString(1) === "changed")
  }

  test("empty payload column list is rejected") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      Changelog.snapshotDiff(Seq((1L, "a")).toDF("id", "p"),
        Seq((1L, "a")).toDF("id", "p"), "id", Nil)
    }
  }
}
