package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamZScore.{Anomaly, TypedValue}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming rolling z-score: spike detection after a full baseline,
  * no self-shifted baselines, state across batches, and exact agreement
  * with an independent in-memory replay of the x53 fold. */
class StreamZScoreSpec extends SparkSpec {

  private def run(batches: Seq[Seq[TypedValue]], window: Int = 20,
                  threshold: Double = 3.0): Seq[Anomaly] = {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.get(key, "")
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[TypedValue]
    val name = s"szs${System.nanoTime()}"
    val q = StreamZScore.anomalies(in.toDS(), window, threshold)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      s.table(name).as[Anomaly].collect().toSeq
    } finally {
      q.stop()
      if (prev.nonEmpty) s.conf.set(key, prev) else s.conf.unset(key)
    }
  }

  private def ev(t: String, id: Long, v: Double) = TypedValue(t, id, id * 10, v)

  test("a spike after a stable 20-event baseline alerts; warm-up never does") {
    // values 10 ± small deterministic wiggle, then one 10x spike
    val base = (1 to 25).map(i => ev("click", i.toLong, 10.0 + (i % 3) * 0.2))
    val spike = ev("click", 26L, 100.0)
    val out = run(Seq(base :+ spike))
    assert(out.map(_.event_id) == Seq(26L), out)
    assert(out.head.z > 3.0, out)
  }

  test("the anomaly enters the baseline afterwards, like the batch frame") {
    // after the spike, a return to normal can itself look anomalous
    // relative to a spike-contaminated window only via the REAL frames —
    // replay decides; here we just pin that the spike is buffered (the
    // next identical spike scores LOWER because the window now holds one)
    val base = (1 to 20).map(i => ev("view", i.toLong, 10.0 + (i % 2) * 0.4))
    val s1 = ev("view", 21L, 80.0)
    val s2 = ev("view", 22L, 80.0)
    val out = run(Seq(base ++ Seq(s1, s2)))
    val z = out.map(a => a.event_id -> math.abs(a.z)).toMap
    assert(z.contains(21L))
    assert(!z.contains(22L) || z(22L) < z(21L), out)
  }

  test("agrees exactly with an in-memory replay on randomized multi-type streams") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def round6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def round4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gen = Gen.listOfN(120, for {
      t <- Gen.oneOf("a", "b")
      v <- Gen.oneOf(Gen.choose(90, 110), Gen.choose(0, 400)) // mostly flat + outliers
    } yield (t, v.toDouble))
    (1 to 3).foreach { seed =>
      val raw = gen(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(fail(s"gen failed for seed $seed"))
        .zipWithIndex.map { case ((t, v), i) => TypedValue(t, i.toLong, i.toLong, v) }
      val w = 10
      val expected = raw.groupBy(_.event_type).toSeq.flatMap { case (_, es) =>
        var window = Vector.empty[Double]
        es.sortBy(e => (e.ts_sec, e.event_id)).flatMap { e =>
          val hit =
            if (window.size == w) {
              val sv = window.sum
              val sv2 = window.map(x => x * x).sum
              val mean = sv / w
              val varr = round6(sv2 / w - mean * mean)
              if (varr > 0) {
                val z = round4((e.value - mean) / math.sqrt(varr))
                if (math.abs(z) > 3.0) Some((e.event_id, z)) else None
              } else None
            } else None
          window = (window :+ e.value).takeRight(w)
          hit
        }
      }.toSet
      val got = run(Seq(raw.take(40), raw.slice(40, 80), raw.drop(80)),
        window = w).map(a => (a.event_id, a.z)).toSet
      assert(got == expected, s"seed=$seed missing=${expected -- got} extra=${got -- expected}")
    }
  }
}
