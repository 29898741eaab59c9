package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The dbscan family's scale contract, as code:
  *  - blocked (LSH-bucketed candidates) ≡ exact on a corpus whose
  *    clusters respect the bucket geometry (full candidate recall);
  *  - the injectable edge source reproduces the same labeling from a
  *    caller-supplied verified ε-edge set;
  *  - the exact kernel REFUSES an over-contract corpus loudly instead
  *    of silently running the quadratic scan.
  */
class DbscanSpec extends SparkSpec {

  /** Three well-separated clusters living in distinct sign-orthants of
    * the first 4 dims (so every ε-close pair shares its sign bucket —
    * full recall for the blocked candidate source), plus one isolated
    * noise point. Components are > 1 milli-unit from zero, so the
    * quantized sign is stable. ε² = 1250000 (milli-units²) keeps
    * intra-cluster pairs (≤ 0.3 apart per dim) inside and the
    * inter-cluster gaps (≥ 2.0) far outside. */
  private def corpus = {
    val s = spark
    import s.implicits._
    def cluster(base: Array[Float], startId: Int, n: Int) =
      (0 until n).map { i =>
        val jitter = 0.05f * (i % 3) // ≤ 0.1 spread inside the cluster
        (startId + i.toLong, base.map(_ + jitter))
      }
    (cluster(Array(1f, 1f, 1f, 1f), 0, 5) ++
      cluster(Array(-1f, 1f, -1f, 1f), 10, 5) ++
      cluster(Array(1f, -1f, -1f, -1f), 20, 4) ++
      Seq((99L, Array(5f, 5f, 5f, 5f)))) // isolated: noise
      .toDF("vec_id", "embedding")
  }

  private def collectRoles(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

  test("blocked ≡ exact when the corpus respects the bucket geometry") {
    val exact = SimilarityOps.dbscan(corpus, "vec_id", "embedding",
      eps2 = 1250000L, minPts = 4)
    val blocked = SimilarityOps.dbscanBlocked(corpus, "vec_id", "embedding",
      eps2 = 1250000L, minPts = 4, bits = 4)
    val (e, b) = (collectRoles(exact), collectRoles(blocked))
    assert(e == b, s"exact minus blocked: ${e -- b}; blocked minus exact: ${b -- e}")
    // and the labeling is the expected one: clusters labeled by min id,
    // the isolated vector is noise
    val byId = e.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byId(0L) == (("core", 0L)) && byId(10L) == (("core", 10L)) &&
      byId(99L) == (("noise", -1L)), byId.toSeq.sortBy(_._1).toString)
    // 4-member cluster at minPts=4: all cores
    assert((20L to 23L).forall(id => byId(id) == (("core", 20L))))
  }

  test("an injected verified edge source drives the same semantics") {
    val s = spark
    import s.implicits._
    val ids = (0L to 5L).toDF("vec_id")
    // path 0-1-2-3 (cores at minPts=3: degree ≥ 2 ⇒ {1, 2}, labeled by
    // their min member id 1), plus a border 4 hanging off core 1, plus
    // isolated 5
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (1L, 4L)).toDF("a", "b")
    val out = collectRoles(
      SimilarityOps.dbscanFromEdges(ids, edges, minPts = 3))
    assert(out == Set(
      (0L, "border", 1L), (1L, "core", 1L), (2L, "core", 1L),
      (3L, "border", 1L), (4L, "border", 1L),
      (5L, "noise", -1L)), out.toSeq.sortBy(_._1).toString)
  }

  test("the bits-free overload derives bits from the corpus and matches explicit bits") {
    // 15 vectors, dim 4: the integer rule gives max(4, min(4, ...)) = 4,
    // so the committed auto path must equal the explicit bits = 4 call
    val auto = SimilarityOps.dbscanBlocked(corpus, "vec_id", "embedding",
      eps2 = 1250000L, minPts = 4)
    val explicit = SimilarityOps.dbscanBlocked(corpus, "vec_id", "embedding",
      eps2 = 1250000L, minPts = 4, bits = 4)
    assert(collectRoles(auto) == collectRoles(explicit))
  }

  test("the bits-free overload refuses ragged embedding dimensions loudly") {
    // one degenerate short vector must not silently collapse the
    // derived bits for the whole corpus (min-dim would floor at 4)
    val s = spark
    import s.implicits._
    val ragged = corpus.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq
      .patch(0, Seq((999L, Seq(0.1f, 0.2f))), 1)
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      SimilarityOps.dbscanBlocked(ragged, "vec_id", "embedding",
        eps2 = 1250000L, minPts = 4))
    assert(e.getMessage.contains("uniform embedding dimensions"), e.getMessage)
  }

  test("the integer auto-bits rule holds occupancy flat across decades") {
    import SimilarityOps.deriveBits
    assert(deriveBits(500, 64) == 4)     // sf0.01 — unchanged results
    assert(deriveBits(2000, 64) == 4)    // sf0.1
    assert(deriveBits(20000, 64) == 6)   // sf1
    assert(deriveBits(200000, 64) == 9)  // sf10 — past the measured crossover
    assert(deriveBits(512L << 13, 64) == 13) // exact power boundary
    assert(deriveBits((512L << 13) + 1, 64) == 14)
    assert(deriveBits(1L << 40, 8) == 8) // capped by the vector dimension
    assert(deriveBits(0, 64) == 4 && deriveBits(1, 64) == 4)
  }

  test("saturated buckets are refused loudly, naming the auto-bits fix") {
    // 15 vectors in 3 sign-buckets: Σ|bucket|² = 25+25+16+1 = 67 — a
    // budget below that must refuse BEFORE the self-join runs
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.dbscanBlocked(corpus, "vec_id", "embedding",
        eps2 = 1250000L, minPts = 4, bits = 4, maxCandidatePairs = 50L)
    }
    assert(e.getMessage.contains("saturated") &&
      e.getMessage.contains("bits-free overload"), e.getMessage)
    // and the same corpus under the default budget runs fine (covered
    // by the equality tests above)
  }

  test("the exact kernel refuses an over-contract corpus loudly") {
    val over = spark.range(SimilarityOps.MaxExactDbscanVectors + 1)
      .select(col("id").as("vec_id"),
        array(lit(0.001f), lit(0.002f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.dbscan(over, "vec_id", "embedding",
        eps2 = 1250000L, minPts = 4)
    }
    assert(e.getMessage.contains("dbscanBlocked"), e.getMessage)
  }
}
