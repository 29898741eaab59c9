package graft

/** Driver-contract guards: every declared query must have its oracle (the
  * driver's compare silently weakens without one), and the whole corpus
  * must execute at the smoke scale factor. */
class BatchQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing oracle SQL: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracle SQL without query: ${(o -- q).toSeq.sorted}")
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
