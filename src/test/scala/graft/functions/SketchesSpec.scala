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
}
