package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Date partitioning must actually eliminate scans: a day filter plans
  * PartitionFilters and touches only that day's files, and a join
  * against a date-filtered dim plans dynamic partition pruning. */
class PartitionedLayoutSpec extends SparkSpec {

  private lazy val path = {
    val dir = Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    PartitionedLayout.writeDaily(ev.drop("ts_sec"), col("ts"), dir)
    dir
  }

  test("layout is one directory per day, data round-trips") {
    val back = PartitionedLayout.read(spark, path)
    val days = back.select("dt").distinct().count()
    assert(days > 1, s"need multiple days to prove pruning, got $days")
    assert(back.count() ==
      Tables.events(spark, "/root/testdata/sf0.001").count())
  }

  test("a day filter becomes PartitionFilters and touches ONLY that day's files") {
    val back = PartitionedLayout.read(spark, path)
    // partition-column type inference reads dt back as DATE
    val day = back.select(col("dt").cast("string")).orderBy("dt").limit(1)
      .collect()(0).getString(0)
    val filtered = back.filter(col("dt") === to_date(lit(day)))
    // the filter must reach the scan as a PARTITION filter (directory
    // pruning), not a data filter
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"), plan)
    assert(plan.contains(s"= $day)"), plan)
    // and the pruned read is exactly that directory's contents
    assert(filtered.count() ==
      spark.read.parquet(s"$path/dt=$day").count())
  }

  test("join against a filtered dim plans DYNAMIC partition pruning") {
    val s = spark
    import s.implicits._
    val back = PartitionedLayout.read(spark, path)
    val someDays = back.select(col("dt").cast("string")).distinct()
      .orderBy("dt").limit(2).as[String].collect().toSeq
    // DPP needs a surviving selective predicate on the build side — a
    // literal dim constant-folds its Filter away, so store the dim as a
    // table and read it back (the realistic star-schema shape)
    val dimPath = Files.createTempDirectory("graft_dim").toString
    (someDays.map(_ -> "keep") :+ ("1970-01-01" -> "drop"))
      .toDF("dim_dt", "tag")
      .select(to_date(col("dim_dt")).as("dim_dt"), col("tag"))
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("tag") === "keep")
    val joined = back.join(dim, col("dt") === col("dim_dt"))
      .groupBy("dt").count()
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
    // and the runtime answer is exactly the two dim days
    val got = joined.collect().map(_.getDate(0).toString).toSet
    assert(got == someDays.toSet)
  }
}
