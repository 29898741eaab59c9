package graft.functions

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property law: on arbitrary random graphs, the distributed
  * label-propagation result equals a driver-side union-find — every node
  * labeled with the minimum id of its component. (Raw scalacheck
  * generators with explicit seeds, same discipline as `PropertySpec` —
  * the scalatest bridge artifact is not in the offline cache.) */
class ConnectedComponentsPropertySpec extends SparkSpec {

  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    nodes.map(n => n -> find(n)).toMap
  }

  private val graphGen: Gen[(List[Long], List[(Long, Long)])] = for {
    n <- Gen.choose(1, 12)
    nEdges <- Gen.choose(0, 16)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, n - 1L)
      b <- Gen.choose(0L, n - 1L)
    } yield (a, b))
  } yield ((0L until n.toLong).toList, edges.filter(e => e._1 != e._2))

  test("label propagation == union-find on random graphs") {
    val s = spark
    import s.implicits._
    (1 to 10).foreach { i =>
      val (nodes, edges) = graphGen(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"generator failed for seed $i"))
      val expected = unionFind(nodes, edges)
      // distributed label-propagation loop (budget 0 forces it)
      val loop = DedupOps.connectedComponents(
          nodes.toDF("doc_id"), edges.toDF("a", "b"), driverEdgeBudget = 0)
        .as[(Long, Long)].collect().toMap
      assert(loop == expected, s"loop: seed $i nodes=$nodes edges=$edges")
      // driver union-find fast path (default budget)
      val fast = DedupOps.connectedComponents(
          nodes.toDF("doc_id"), edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(fast == expected, s"fast: seed $i nodes=$nodes edges=$edges")
      // star contraction (the high-diameter fallback), invoked directly
      val star = DedupOps.starContraction(
          nodes.toDF("doc_id"), edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(star == expected, s"star: seed $i nodes=$nodes edges=$edges")
    }
  }

  test("long chain exceeding the hash-to-min budget converges via star contraction") {
    val s = spark
    import s.implicits._
    // a 120-node path has diameter 119: hash-to-min needs ~60 rounds to
    // reach fixpoint, so maxIter=5 forces the contraction fallback, which
    // must deliver the same single component — not an error, not a split
    val n = 120L
    val nodes = (0L until n).toList
    val edges = (0L until n - 1).map(i => (i, i + 1)).toList
    val expected = unionFind(nodes, edges)
    assert(expected.values.toSet == Set(0L)) // sanity: one chain, root 0
    val got = DedupOps.connectedComponents(
        nodes.toDF("doc_id"), edges.toDF("a", "b"),
        maxIter = 5, driverEdgeBudget = 0)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }
}
