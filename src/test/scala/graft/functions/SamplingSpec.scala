package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guards for [[Sampling.mixtureSample]]'s exact-ppm rate arithmetic —
  * the batch oracle queries (x19/x20) cover the happy paths; this spec
  * pins the overflow boundary of `__w · targetRows · ppm`. */
class SamplingSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    (1 to 100).map(i => (i.toLong, if (i % 2 == 0) "web" else "code"))
      .toDF("id", "src")
  }

  test("a weight that would overflow the Long rate product fails loudly") {
    // maxW = Long.MaxValue / (targetRows * ppm) = 9.22e18 / 1e12 ≈ 9.2e6
    val e = intercept[Throwable] {
      Sampling.mixtureSample(corpus, col("id"), col("src"),
          when(col("src") === "web", 10000000L).otherwise(1L),
          targetRows = 1000000L, ppm = 1000000L)
        .count()
    }
    assert(e.getMessage != null && e.getMessage.contains("overflow"),
      s"expected the overflow guard's message, got: ${e.getMessage}")
  }

  test("the largest admissible weight still yields non-negative exact rates") {
    val maxW = Long.MaxValue / (1000000L * 1000000L) // 9223372
    val out = Sampling.mixtureSample(corpus, col("id"), col("src"),
      when(col("src") === "web", maxW).otherwise(1L),
      targetRows = 1000000L, ppm = 1000000L)
    // the heavy source's product sits just under Long.MaxValue: its rate
    // must saturate at ppm (keep ALL 50 web rows), not wrap negative and
    // silently drop the source ("code" is legitimately downweighted to
    // ~0 by the extreme ratio — that part is the mixture working)
    assert(out.filter(col("src") === "web").count() == 50)
  }
}
