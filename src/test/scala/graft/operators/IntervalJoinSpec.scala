package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[Joins.intervalJoin]] — the bucketized point-in-interval join must be
  * EXACTLY the theta join `start ≤ p ≤ end`, for every relationship
  * between bucket width and interval length (fan-out 1, 2, many), with
  * empty (end < start) intervals matching nothing and each matching pair
  * produced exactly once (no bucket-overlap duplicates). */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pts(ts: Long*): DataFrame =
    ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("pid", "p")

  private def ivs(rows: (Long, Long)*): DataFrame =
    rows.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      .toDF("iid", "s", "e")

  private def naive(p: DataFrame, iv: DataFrame): Set[(Long, Long)] =
    p.join(iv, col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  private def bucketized(p: DataFrame, iv: DataFrame, b: Long): Seq[(Long, Long)] =
    Joins.intervalJoin(p, iv, "p", "s", "e", b)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq

  test("equivalent to the theta join across bucket widths (fan-out 1, 2, many)") {
    val p = pts(0L, 5L, 17L, 63L, 64L, 100L, 999L)
    val iv = ivs((0L, 10L), (10L, 20L), (60L, 70L), (90L, 200L), (500L, 1500L))
    val truth = naive(p, iv)
    for (b <- Seq(1L, 7L, 16L, 64L, 1024L, 100000L)) {
      val got = bucketized(p, iv, b)
      assert(got.toSet == truth, s"bucket=$b: ${got.toSet} != $truth")
      assert(got.size == got.toSet.size, s"bucket=$b produced duplicate pairs")
    }
  }

  test("boundary inclusivity: points exactly at start and end match") {
    val got = bucketized(pts(10L, 20L), ivs((10L, 20L)), 16L).toSet
    assert(got == Set((0L, 0L), (1L, 0L)))
  }

  test("empty intervals (end < start) match nothing instead of erroring") {
    val got = bucketized(pts(5L), ivs((10L, 0L), (0L, 10L)), 4L).toSet
    assert(got == Set((0L, 1L)))
  }

  test("randomized: equals the theta join on arbitrary point/interval sets") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      nP <- Gen.choose(0, 40)
      nI <- Gen.choose(0, 25)
      ps <- Gen.listOfN(nP, Gen.choose(-100L, 100L))
      is <- Gen.listOfN(nI, for {
        st <- Gen.choose(-100L, 100L)
        len <- Gen.choose(-10L, 60L) // negative → empty intervals included
      } yield (st, st + len))
      b <- Gen.oneOf(1L, 3L, 16L, 64L, 1000L)
    } yield (ps, is, b)
    (1 to 12).foreach { seed =>
      val (ps, is, b) = gen(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(fail(s"generator failed for seed $seed"))
      val p = pts(ps: _*)
      val iv = ivs(is: _*)
      val got = bucketized(p, iv, b)
      assert(got.toSet == naive(p, iv), s"seed=$seed bucket=$b")
      assert(got.size == got.toSet.size, s"seed=$seed bucket=$b dup pairs")
    }
  }

  test("shared column names are rejected up front, not silently ambiguous") {
    val p = pts(1L)                                   // (pid, p)
    val iv = ivs((0L, 2L)).withColumnRenamed("iid", "pid") // shares "pid"
    val e = intercept[IllegalArgumentException] {
      Joins.intervalJoin(p, iv, "p", "s", "e", 4L)
    }
    assert(e.getMessage.contains("pid"))
  }

  test("a pre-existing __graft_bkt column is rejected, not clobbered") {
    val p = pts(1L).withColumn("__graft_bkt", lit(99))
    val e = intercept[IllegalArgumentException] {
      Joins.intervalJoin(p, ivs((0L, 2L)), "p", "s", "e", 4L)
    }
    assert(e.getMessage.contains("__graft_bkt"))
  }

  test("plans a hash join on the bucket key, not a nested loop") {
    val plan = Joins.intervalJoin(pts(1L, 2L), ivs((0L, 3L)), "p", "s", "e", 2L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
