package graft.functions

import graft.{SparkEntry, SparkSpec}

/** Lifecycle guard for the dedup family's candidate-pair handling.
  *
  * `ngramJaccard` references its candidate list four times; an earlier
  * revision materialized it with an eager `localCheckpoint` that nothing
  * ever released, so every d3/d7/d10/c-pipeline invocation leaked one
  * snapshot into executor storage for the session's lifetime. The fix
  * leaves the list as a plan and lets exchange/AQE-stage reuse dedupe the
  * references. This spec pins both halves:
  *   1. repeated d3 runs leave executor storage FLAT (the leak is gone);
  *   2. the executed plan actually reuses the candidate exchange instead
  *      of recomputing the LSH chain per reference (the perf premise).
  */
class ReuseReferencesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def persistentRddCount: Int = spark.sparkContext.getPersistentRDDs.size

  /** The session is shared across suites, and several operators release
    * caches with `unpersist(blocking = false)` — a pending async release
    * from a PRIOR suite can land mid-test and read as a count change this
    * spec didn't cause (observed as an order-dependent full-suite flake).
    * Reads therefore wait for the count to hold still first. */
  private def stableRddCount: Int = {
    var prev = -1
    var cur = persistentRddCount
    var tries = 0
    while (cur != prev && tries < 50) {
      prev = cur
      Thread.sleep(100)
      cur = persistentRddCount
      tries += 1
    }
    cur
  }

  test("two consecutive d3 runs leave executor storage flat") {
    val before = stableRddCount
    SparkEntry.queries("d3_ngram_jaccard")(spark, dir).count()
    val afterFirst = stableRddCount
    SparkEntry.queries("d3_ngram_jaccard")(spark, dir).count()
    val afterSecond = stableRddCount
    assert(afterFirst == before,
      s"first d3 run grew persistent-RDD count $before -> $afterFirst")
    assert(afterSecond == before,
      s"second d3 run grew persistent-RDD count $before -> $afterSecond")
  }

  test("d10 fuzzy decontamination leaves executor storage flat") {
    val before = stableRddCount
    SparkEntry.queries("d10_fuzzy_decontaminate")(spark, dir).count()
    val after = stableRddCount
    assert(after == before,
      s"d10 run grew persistent-RDD count $before -> $after")
  }

  test("d3's executed plan reuses the candidate exchange across references") {
    val df = SparkEntry.queries("d3_ngram_jaccard")(spark, dir)
    // collect() (unlike count()) executes THIS dataset's queryExecution,
    // so executedPlan below is the finalized adaptive plan with stages
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no exchange reuse in the final adaptive plan:\n$plan")
  }
}
