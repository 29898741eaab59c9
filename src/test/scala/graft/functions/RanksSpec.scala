package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[Ranks.rangeParallelNtile]] — randomized differential against
  * Spark's own ntile window across k values, tie groups, and bin
  * coarseness; reserved-name check. */
class RanksSpec extends SparkSpec {

  import spark.implicits._

  test("randomized: ≡ ntile(k) window for k ∈ {2, 3, 7}, ties included") {
    val rng = new scala.util.Random(23)
    val rows = (0 until 500).map { i =>
      (s"g${rng.nextInt(4)}", rng.nextInt(40).toDouble, i.toLong)
    }.toDF("g", "v", "id")
    Seq(2, 3, 7).foreach { k =>
      val got = Ranks.rangeParallelNtile(rows, "g", "v", "id", k,
          floor(col("v") / 5).cast("long"))
        .select("g", "id", "ntile")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      val want = rows.withColumn("t",
          ntile(k).over(Window.partitionBy("g").orderBy(col("v"), col("id"))))
        .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getInt(3)).toMap
      assert(got === want, s"k=$k diverged from the ntile window")
    }
  }

  test("degenerate bins: ONE bin (no range split) and per-value bins both stay exact") {
    val rows = (0 until 50).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val want = rows.withColumn("t",
        ntile(4).over(Window.partitionBy("g").orderBy(col("v"), col("id"))))
      .collect().map(r => r.getLong(2) -> r.getInt(3)).toMap
    Seq(lit(0L), col("v").cast("long")).foreach { binOf =>
      val got = Ranks.rangeParallelNtile(rows, "g", "v", "id", 4, binOf)
        .collect().map(r => r.getLong(2) -> r.getInt(3)).toMap
      assert(got === want)
    }
  }

  test("reserved working names are rejected") {
    val bad = Seq(("g", 1.0, 1L)).toDF("g", "v", "ntile")
    intercept[IllegalArgumentException] {
      Ranks.rangeParallelNtile(bad, "g", "v", "ntile", 3, lit(0L))
    }
  }
}
