package graft.operators

import graft.SparkSpec
import graft.functions.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Changelog.merkleDiff]] — identical tables reconcile to nothing, a
  * single changed/added/removed row flags exactly its bucket, and the
  * flagged buckets are a sound prefilter for [[Changelog.snapshotDiff]]. */
class MerkleDiffSpec extends SparkSpec {

  import spark.implicits._

  private val B = 8

  private def dig = Sampling.rawHash(concat_ws("|", col("id"), col("v")))

  private def diff(old: DataFrame, neu: DataFrame) =
    Changelog.merkleDiff(old, neu, col("id"), dig, B)

  private def table(rows: (Long, String)*) = rows.toDF("id", "v")

  private val base = (0L until 40L).map(i => (i, s"v$i"))

  test("identical tables: zero differing buckets") {
    assert(diff(table(base: _*), table(base: _*)).count() === 0)
  }

  test("one changed row flags exactly its bucket; counts equal, checksums differ") {
    val neu = base.map { case (i, v) => (i, if (i == 17L) "CHANGED" else v) }
    val rows = diff(table(base: _*), table(neu: _*)).collect()
    assert(rows.length === 1)
    val r = rows.head
    val expected = table(base: _*)
      .filter(col("id") === 17L)
      .select(Sampling.hashBucket(col("id"), B)).head().getLong(0)
    assert(r.getLong(0) === expected, "the changed row's own bucket")
    assert(r.getLong(1) === r.getLong(2), "row counts agree on a pure change")
    assert(r.getLong(3) !== r.getLong(4), "checksums must disagree")
  }

  test("added and removed rows flag their buckets with count deltas") {
    val neu = base.filterNot(_._1 == 3L) :+ (100L, "new")
    val rows = diff(table(base: _*), table(neu: _*)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val b3 = table(base: _*).filter(col("id") === 3L)
      .select(Sampling.hashBucket(col("id"), B)).head().getLong(0)
    val b100 = table((100L, "new")).select(Sampling.hashBucket(col("id"), B))
      .head().getLong(0)
    assert(rows.keySet === Set(b3, b100).map(identity))
    if (b3 != b100) {
      assert(rows(b3)._1 === rows(b3)._2 + 1, "removed row: old has one more")
      assert(rows(b100)._2 === rows(b100)._1 + 1, "added row: new has one more")
    }
  }

  test("soundness as a prefilter: every snapshotDiff row lives in a flagged bucket") {
    val neu = base.map { case (i, v) => (i, if (i % 13 == 0) v + "!" else v) }
      .filterNot(_._1 == 8L)
    val o = table(base: _*); val n = table(neu: _*)
    val flagged = diff(o, n).select("bucket").as[Long].collect().toSet
    val changedRows = Changelog.snapshotDiff(o, n, "id", Seq("v"))
      .select(Sampling.hashBucket(col("id"), B).as("b")).as[Long].collect()
    assert(changedRows.nonEmpty)
    changedRows.foreach(b => assert(flagged.contains(b),
      s"bucket $b holds a changed row but was not flagged"))
  }
}
