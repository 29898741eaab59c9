package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV distinct sketch: exact below k, within the published error bound
  * above k, and invariant to partitioning (the merge path). */
class SketchesSpec extends SparkSpec {

  test("exact when the group has fewer than k distinct values") {
    val s = spark
    import s.implicits._
    val df = (1 to 500).map(i => ("g", i % 40)).toDF("g", "v")
    val Array(row) = Sketches.kmvDistinct(df, Seq("g"), "v", k = 64).collect()
    assert(row.getDouble(1) == 40.0)
  }

  test("estimate within ~4 standard errors of the truth above k") {
    val s = spark
    import s.implicits._
    val distinct = 10000
    val df = (1 to distinct).map(i => ("g", i)).toDF("g", "v")
    val k = 256
    val Array(row) = Sketches.kmvDistinct(df, Seq("g"), "v", k = k).collect()
    val est = row.getDouble(1)
    val se = distinct / math.sqrt(k - 2)
    assert(math.abs(est - distinct) < 4 * se, s"est=$est truth=$distinct se=$se")
  }

  test("partitioning-invariant and duplicate-insensitive (merge path)") {
    val s = spark
    import s.implicits._
    val base = (1 to 3000).map(i => ("g", i % 1000)) // every value 3 times
    val one = Sketches.kmvDistinct(base.toDF("g", "v").coalesce(1),
      Seq("g"), "v", k = 128).collect().head.getDouble(1)
    val many = Sketches.kmvDistinct(base.toDF("g", "v").repartition(17),
      Seq("g"), "v", k = 128).collect().head.getDouble(1)
    assert(one == many)
  }

  test("NULL values are ignored, per count(DISTINCT) convention") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", Some(1)), ("g", Some(2)), ("g", None), ("g", None))
      .toDF("g", "v")
    val Array(row) = Sketches.kmvDistinct(df, Seq("g"), "v", k = 16).collect()
    assert(row.getDouble(1) == 2.0)
  }

  test("k below 3 is rejected") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      Sketches.kmvDistinct(Seq(("g", 1)).toDF("g", "v"), Seq("g"), "v", k = 2)
    }
  }

  // ---- HLL ---------------------------------------------------------------

  test("HLL: small cardinalities hit the linear-counting regime near-exactly") {
    val s = spark
    import s.implicits._
    val df = (1 to 900).map(i => ("g", i % 300)).toDF("g", "v")
    val Array(row) = Sketches.hllDistinct(df, Seq("g"), "v").collect()
    val est = row.getDouble(2)
    // linear counting at n=300, m=1024: relative error well under 10%
    assert(math.abs(est - 300.0) < 30.0, s"est=$est")
  }

  test("HLL: estimate within ~4 standard errors at 50k distinct (b=10)") {
    val s = spark
    import s.implicits._
    val distinct = 50000
    val df = (1 to distinct).map(i => ("g", i)).toDF("g", "v")
    val Array(row) = Sketches.hllDistinct(df, Seq("g"), "v").collect()
    val est = row.getDouble(2)
    val se = 1.04 / math.sqrt(1024.0) * distinct
    assert(math.abs(est - distinct) < 4 * se, s"est=$est truth=$distinct se=$se")
  }

  test("HLL: partitioning-invariant and duplicate-insensitive (register max merges)") {
    val s = spark
    import s.implicits._
    val base = (1 to 15000).map(i => ("g", i % 5000))
    val one = Sketches.hllDistinct(base.toDF("g", "v").coalesce(1),
      Seq("g"), "v").collect().head.getDouble(2)
    val many = Sketches.hllDistinct(base.toDF("g", "v").repartition(17),
      Seq("g"), "v").collect().head.getDouble(2)
    assert(one == many)
  }

  test("HLL: NULLs ignored; per-group registers independent") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some(1)), ("a", Some(2)), ("a", None),
      ("b", Some(7))).toDF("g", "v")
    val got = Sketches.hllDistinct(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // tiny n: linear counting m·ln(m/(m−c)) ≈ c + c²/2m — near-exact
    assert(got("a")._1 === 2L && math.abs(got("a")._2 - 2.0) < 0.01, got)
    assert(got("b")._1 === 1L && math.abs(got("b")._2 - 1.0) < 0.01, got)
  }

  test("HLL: bucket-bit bounds enforced") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(Seq(("g", 1)).toDF("g", "v"), Seq("g"), "v", b = 3)
    }
  }
}
