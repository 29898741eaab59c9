package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Selection.perplexityBucketsParallel]] — row-for-row equal to the
  * per-group ntile form on real data, the data-sized window partitioned
  * by (group, bin), and the closed-form ntile correct on uneven group
  * sizes (including the n < 3 degenerate). */
class ParallelNtileSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("≡ perplexityBuckets on the real documents table") {
    val docs = graft.Tables.documents(spark, dir)
    val got = Selection.perplexityBucketsParallel(
        docs, col("text"), col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(4))).toSet
    val want = Selection.perplexityBuckets(
        docs, col("text"), col("doc_id"), col("source"))
      .select(col("doc_id"), col("grp"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("data window partitions by (grp, bin); the ntile itself is closed-form, not a window") {
    val p = Selection.perplexityBucketsParallel(
        graft.Tables.documents(spark, dir),
        col("text"), col("doc_id"), col("source"))
      .queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(grp"), p)
    assert(p.contains("bin"), s"bin missing from the data window partition:\n$p")
    // the OUTPUT column is named ntile; what must be absent is the
    // ntile(...) WINDOW FUNCTION
    assert(!p.contains("ntile("), s"the rewrite must not plan an ntile window:\n$p")
  }

  test("uneven and degenerate group sizes follow SQL ntile exactly") {
    val s = spark
    import s.implicits._
    // group sizes 7 (= 3+2+2), 4 (= 2+1+1), 2 (degenerate: buckets 1, 2),
    // 1 (bucket 1 only); distinct single-token texts force distinct xents
    val docs = (0 until 7).map(i => (i.toLong, s"a$i a$i", "g7")) ++
      (10 until 14).map(i => (i.toLong, s"b$i", "g4")) ++
      (20 until 22).map(i => (i.toLong, s"c$i", "g2")) ++
      Seq((30L, "d30", "g1"))
    val df = docs.toDF("doc_id", "text", "source")
    val got = Selection.perplexityBucketsParallel(
        df, col("text"), col("doc_id"), col("source"))
      .groupBy("grp", "bucket").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("g7", "head")) == 3 && got(("g7", "middle")) == 2 &&
      got(("g7", "tail")) == 2)
    assert(got(("g4", "head")) == 2 && got(("g4", "middle")) == 1 &&
      got(("g4", "tail")) == 1)
    assert(got(("g2", "head")) == 1 && got(("g2", "middle")) == 1 &&
      !got.contains(("g2", "tail")))
    assert(got(("g1", "head")) == 1 && !got.contains(("g1", "middle")))
  }
}
