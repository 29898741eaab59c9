package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftShims

/** The early-exit ε-ball kernel is pinned to the obvious full-sum
  * reference (the HOF form it replaced) over random vectors, plus the
  * malformed-input conventions (length mismatch / null element →
  * non-neighbor, null array → null). */
class L2SqWithinSpec extends SparkSpec {

  private def withinCol(a: Column, b: Column, e: Long): Column =
    GraftShims.column(L2SqWithin(
      GraftShims.expression(a), GraftShims.expression(b),
      GraftShims.expression(lit(e))))

  test("randomized agreement with the full-sum reference") {
    val rnd = new scala.util.Random(1996)
    val cases = Vector.fill(300) {
      val n = 1 + rnd.nextInt(8)
      (Seq.fill(n)(rnd.nextInt(2001) - 1000L),
        Seq.fill(n)(rnd.nextInt(2001) - 1000L))
    }
    // thresholds straddling typical sums so both verdicts occur often
    for (eps2 <- Seq(0L, 100000L, 2000000L, Long.MaxValue)) {
      val s = spark
      import s.implicits._
      val got = cases.toDF("a", "b")
        .withColumn("w", withinCol(col("a"), col("b"), eps2))
        .collect().map(r => (r.getSeq[Long](0), r.getSeq[Long](1)) -> r.getBoolean(2))
        .toMap
      for ((a, b) <- cases) {
        val full = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
        assert(got((a, b)) == (full <= eps2), s"$a vs $b at eps2=$eps2 (sum=$full)")
      }
    }
  }

  test("malformed inputs: length mismatch and null element are non-neighbors") {
    val s = spark
    graft.GraftExtensions.register(s)
    val r = s.sql(
      "SELECT l2sq_within(array(1L, 2L), array(1L), 9L) AS mismatch, " +
        "l2sq_within(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L), 9L) AS nullel, " +
        "l2sq_within(CAST(NULL AS ARRAY<BIGINT>), array(1L), 9L) AS nullarr, " +
        "l2sq_within(array(1L, 2L), array(2L, 4L), 5L) AS hit, " +
        "l2sq_within(array(1L, 2L), array(2L, 4L), 4L) AS miss").collect()(0)
    assert(!r.getBoolean(0) && !r.getBoolean(1))
    assert(r.isNullAt(2))
    assert(r.getBoolean(3) && !r.getBoolean(4))
  }
}
