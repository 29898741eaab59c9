package graft.functions

import graft.SparkSpec

/** Connected-components label propagation: chains (multi-round
  * convergence), separate components, singletons, and symmetry. */
class ConnectedComponentsSpec extends SparkSpec {

  test("chain, triangle, and singleton all resolve to min-id clusters (both paths)") {
    val s = spark
    import s.implicits._
    // component 1: chain 1-2-3-4 (diameter 3 → needs >1 round)
    // component 2: triangle 10-11-12
    // singleton: 99 (no edges)
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 99L).toDF("doc_id")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L)
    // default budget → driver union-find fast path
    val fast = DedupOps.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(fast == expected)
    // budget 0 → distributed label-propagation loop
    val loop = DedupOps.connectedComponents(nodes, edges, driverEdgeBudget = 0)
      .as[(Long, Long)].collect().toMap
    assert(loop == expected)
  }

  test("long chain converges within the default round budget (loop path)") {
    val s = spark
    import s.implicits._
    // path graph 0-1-2-...-24: min label needs 24 propagation rounds
    val edges = (0L until 24L).map(i => (i, i + 1)).toDF("a", "b")
    val nodes = (0L to 24L).toDF("doc_id")
    val out = DedupOps.connectedComponents(nodes, edges, driverEdgeBudget = 0)
      .as[(Long, Long)].collect().toMap
    assert(out.values.forall(_ == 0L))
  }

  test("hash-to-min budget exhaustion falls back to star contraction, correctly") {
    val s = spark
    import s.implicits._
    val edges = (0L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    val nodes = (0L to 10L).toDF("doc_id")
    val got = DedupOps.connectedComponents(nodes, edges, maxIter = 2, driverEdgeBudget = 0)
      .as[(Long, Long)].collect().toMap
    assert(got == (0L to 10L).map(_ -> 0L).toMap)
  }

  test("contraction non-convergence is an error, never silently-split clusters") {
    val s = spark
    import s.implicits._
    val edges = (0L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    val nodes = (0L to 10L).toDF("doc_id")
    val e = intercept[IllegalStateException] {
      DedupOps.starContraction(nodes, edges, maxRounds = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("empty edge set: every node is its own cluster (both paths)") {
    val s = spark
    import s.implicits._
    val nodes = Seq(5L, 6L).toDF("doc_id")
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val fast = DedupOps.connectedComponents(nodes, empty)
      .as[(Long, Long)].collect().toMap
    assert(fast == Map(5L -> 5L, 6L -> 6L))
    val loop = DedupOps.connectedComponents(nodes, empty, driverEdgeBudget = 0)
      .as[(Long, Long)].collect().toMap
    assert(loop == Map(5L -> 5L, 6L -> 6L))
  }
}
