package graft

/** Driver-contract guards: every declared query must have its oracle (the
  * driver's compare silently weakens without one), and the whole corpus
  * must execute at the smoke scale factor. */
class BatchQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries with no DuckDB-expressible oracle, each documented at the
    * query site (the driver records a rows-only check for these). Keep
    * this list EXPLICIT so a forgotten oracle can't hide in it.
    * Empty since round 13: t19's readout became the engine-portable
    * distinct-4-gram statistic, so every query is DuckDB-oracled. */
  private val rowsOnlyByDesign = Set.empty[String]

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o -- rowsOnlyByDesign).isEmpty,
      s"queries missing oracle SQL: ${(q -- o -- rowsOnlyByDesign).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracle SQL without query: ${(o -- q).toSeq.sorted}")
    assert((rowsOnlyByDesign -- q).isEmpty && (o & rowsOnlyByDesign).isEmpty,
      "rows-only list out of sync with the query/oracle maps")
  }

  test("flagship entry() returns rows at smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries execute and are non-degenerate at smoke scale") {
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sfDir).count()
    }
    val empty = counts.filter(_._2 == 0L).map(_._1)
    assert(empty.isEmpty, s"queries with 0 rows at sf0.001: $empty")
  }
}
