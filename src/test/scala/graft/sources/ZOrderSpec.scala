package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order clustering: interleave correctness vs the plain-Scala
  * reference, per-dimension monotonicity, and the actual data-skipping
  * payoff — per-file bounding boxes tighten on the NON-leading
  * dimension versus a lexicographic layout. */
class ZOrderSpec extends SparkSpec {

  test("zValue expression ≡ plain-Scala reference on a grid") {
    import spark.implicits._
    val rows = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(Seq(col("x"), col("y")), 4).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) === ZOrder.zValueRef(Seq(x, y), 4), s"($x,$y)")
    }
    // bijective on the grid
    assert(got.values.toSet.size === rows.size)
  }

  test("z is monotone in each dimension with the other held fixed") {
    for (x <- 0L until 15L; y <- 0L until 15L) {
      assert(ZOrder.zValueRef(Seq(x + 1, y), 4) > ZOrder.zValueRef(Seq(x, y), 4))
      assert(ZOrder.zValueRef(Seq(x, y + 1), 4) > ZOrder.zValueRef(Seq(x, y), 4))
    }
  }

  test("z-ordered files have tight bboxes in BOTH dims; lex sort only in one") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"),
        pmod(col("user_id"), lit(64L)).as("du"),
        pmod(floor(col("value") * 100).cast("long"), lit(64L)).as("dv"))
    def avgSpread(path: String): (Double, Double) = {
      val byFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("du") - min("du")).as("su"), (max("dv") - min("dv")).as("sv"))
        .agg(avg("su"), avg("sv")).head()
      (byFile.getDouble(0), byFile.getDouble(1))
    }
    val zPath = "/tmp/graft_zorder_test/z"
    val lexPath = "/tmp/graft_zorder_test/lex"
    ZOrder.writeZOrdered(ev, zPath, Seq(col("du"), col("dv")), bits = 6, files = 16)
    ev.repartitionByRange(16, col("du"), col("dv"))
      .sortWithinPartitions("du", "dv")
      .write.mode("overwrite").parquet(lexPath)
    val (zu, zv) = avgSpread(zPath)
    val (lu, lv) = avgSpread(lexPath)
    // lexicographic: leading dim tight, trailing dim spans ~the range
    assert(lu < 16, s"lex leading-dim spread $lu")
    assert(lv > 40, s"lex trailing-dim spread unexpectedly tight: $lv")
    // z-order: BOTH dims materially tighter than the trailing lex dim
    assert(zu < 32 && zv < 32, s"z-order bboxes not tight: du=$zu dv=$zv")
  }
}
