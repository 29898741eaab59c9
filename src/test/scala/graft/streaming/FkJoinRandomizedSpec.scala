package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Randomized FK-join-vs-relational equivalence (SURVEY.md §5.2 #4): feed
  * a seeded-random interleaving of left upserts / FK changes / tombstones
  * and right upserts / tombstones through the streaming two-phase FK join,
  * materialize its changelog, and compare against the plain relational
  * join of the final table states. Catches exactly the class of
  * consistency bugs the reference catalogs (SURVEY.md §2.5). */
class FkJoinRandomizedSpec extends SparkSpec {

  private val fkOf: String => String = v => {
    val fk = v.substring(0, v.indexOf('|'))
    if (fk.isEmpty) null else fk
  }

  /** Materialize the join changelog: last change per left key wins
    * (same-seq tie: upsert beats the departing delete). */
  private def materialize(changes: Seq[FkJoinChange]): Map[String, (String, String)] =
    changes.groupBy(_.leftKey).flatMap { case (lk, cs) =>
      val last = cs.maxBy(c => (c.seq, !c.deleted))
      if (last.deleted) None else Some(lk -> ((last.leftPayload, last.rightValue)))
    }

  private def scenario(seed: Long, ops: Int, how: String): Unit = {
    val rnd = new scala.util.Random(seed)
    val leftKeys = Vector("p1", "p2", "p3", "p4", "p5")
    val fks = Vector("m1", "m2", "m3", "")
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext

    val left = MemoryStream[Rec]
    val right = MemoryStream[Rec]
    val name = s"fkrand_${how}_$seed"
    val q = FkJoinStream.join(left.toDS(), right.toDS(), fkOf, how)
      .writeStream.format("memory").queryName(name).outputMode("append").start()

    var leftState = Map.empty[String, String]   // pk -> value
    var rightState = Map.empty[String, String]  // fk -> value
    try {
      var seq = 0L
      (1 to ops).foreach { _ =>
        seq += 1
        if (rnd.nextBoolean()) {
          val k = leftKeys(rnd.nextInt(leftKeys.size))
          if (rnd.nextInt(4) == 0) {
            left.addData(Rec(k, null, 0, seq)); leftState -= k
          } else {
            val v = s"${fks(rnd.nextInt(fks.size))}|name${rnd.nextInt(3)}"
            left.addData(Rec(k, v, 0, seq)); leftState += (k -> v)
          }
        } else {
          val fk = fks(rnd.nextInt(3)) // only real fks on the right
          if (rnd.nextInt(4) == 0) {
            right.addData(Rec(fk, null, 0, seq)); rightState -= fk
          } else {
            val v = s"r${rnd.nextInt(5)}"
            right.addData(Rec(fk, v, 0, seq)); rightState += (fk -> v)
          }
        }
        if (seq % 7 == 0) q.processAllAvailable()
      }
      q.processAllAvailable()

      val streamed = materialize(s.table(name).as[FkJoinChange].collect().toSeq)
      // relational expectation over final states
      val expected = leftState.flatMap { case (pk, v) =>
        val fk = fkOf(v)
        val r = if (fk == null) None else rightState.get(fk)
        how match {
          case "inner" => r.map(rv => pk -> ((v, rv)))
          case "left"  => Some(pk -> ((v, r.orNull)))
        }
      }
      assert(streamed == expected,
        s"seed=$seed how=$how: streamed=$streamed expected=$expected")
    } finally q.stop()
  }

  test("randomized interleavings converge to the relational join (left)") {
    Seq(1L, 42L, 2024L).foreach(scenario(_, 40, "left"))
  }

  test("randomized interleavings converge to the relational join (inner)") {
    Seq(7L, 99L, 31337L).foreach(scenario(_, 40, "inner"))
  }
}
