package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Changelog

/** Property layer (SURVEY.md §5.2 #4): algebraic laws checked on random
  * inputs, batch side. scalacheck generators sampled with explicit seeds
  * (the scalatest bridge artifact is not in the offline cache). */
class PropertySpec extends SparkSpec {

  private def forAll[A](gen: Gen[A], cases: Int = 10)(body: A => Unit): Unit =
    (1 to cases).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"generator failed for seed $i")))
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val upserts: Gen[List[(String, Option[Int])]] = Gen.listOfN(40,
    for {
      k <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.option(Gen.choose(0, 100))
    } yield (k, v))

  test("t12 histogram quantile law: equals the type-1 quantile of the sorted raw values") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("t12_length_quantiles")(s, dir)
      .as[(String, Double, Long)].collect()
      .map { case (src, q, v) => (src, q) -> v }.toMap
    val raw = Tables.documents(s, dir)
      .select(col("source"), col("n_chars")).as[(String, Long)].collect()
      .groupBy(_._1).map { case (src, rows) => src -> rows.map(_._2).sorted }
    for ((src, xs) <- raw; q <- Seq(0.25, 0.5, 0.75, 0.9)) {
      // type-1 (lower) quantile with the operator's IEEE ceil(n*q) rank
      val rank = math.ceil(xs.length * q).toLong.max(1)
      val want = xs(rank.toInt - 1)
      assert(got((src, q)) == want,
        s"$src q=$q: histogram said ${got((src, q))}, sorted values say $want")
    }
    assert(got.size == raw.size * 4)
  }

  test("x28 chi-square law: matches the plain-Scala statistic from raw cell counts") {
    val s = spark
    import s.implicits._
    val dir = "/root/testdata/sf0.001"
    val Array((chi2, cells, nDocs)) = SparkEntry.queries("x28_mix_chi2")(s, dir)
      .as[(Double, Long, Long)].collect()

    val cellCounts = Tables.documents(s, dir)
      .groupBy("lang", "source").count()
      .as[(String, String, Long)].collect()
    val rl = cellCounts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cs = cellCounts.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val n = cellCounts.map(_._3).sum
    val want = cellCounts.map { case (l, src, o) =>
      val e = rl(l).toDouble * cs(src) / n
      (o - e) * (o - e) / e
    }.sum
    assert(chi2 >= 0.0 && cells == cellCounts.length && nDocs == n)
    assert(math.abs(chi2 - want) < 1e-5,
      s"operator chi2 $chi2 vs independent replication $want")
  }

  test("changelog law: latestByKey equals the sequential fold of upserts/tombstones") {
    val s = spark
    import s.implicits._
    forAll(upserts) { ops =>
      val rows = ops.zipWithIndex.map { case ((k, v), i) =>
        (k, v.map(_.toString).orNull, i.toLong)
      }
      val df = rows.toDF("key", "value", "seq")
      // engine: materialize + tombstone filter
      val got = Changelog.upsertView(df, Seq("key"), Seq(col("seq")),
          col("value").isNull)
        .select("key", "value").as[(String, String)].collect().toMap
      // law: naive in-order fold
      val expected = rows.foldLeft(Map.empty[String, String]) {
        case (m, (k, v, _)) => if (v == null) m - k else m + (k -> v)
      }
      assert(got == expected)
    }
  }

  test("tumbling-window law: every event lands in exactly one window containing it") {
    val s = spark
    import s.implicits._
    forAll(Gen.listOfN(50, Gen.choose(0L, 10000L))) { offsets =>
      whenever(offsets.nonEmpty) {
        val df = offsets.zipWithIndex
          .map { case (o, i) => (i.toLong, new java.sql.Timestamp(1700000000000L + o * 1000)) }
          .toDF("id", "ts")
        val assigned = df.select(col("id"), window(col("ts"), "37 seconds").as("w"), col("ts"))
        // exactly one row per event
        assert(assigned.count() == offsets.length)
        // and the window contains the event
        val violations = assigned.filter(
          col("ts") < col("w.start") || col("ts") >= col("w.end")).count()
        assert(violations == 0)
      }
    }
  }

  test("sliding-window law: every event lands in exactly size/slide windows") {
    val s = spark
    import s.implicits._
    forAll(Gen.listOfN(30, Gen.choose(0L, 5000L))) { offsets =>
      whenever(offsets.nonEmpty) {
        val df = offsets.zipWithIndex
          .map { case (o, i) => (i.toLong, new java.sql.Timestamp(1700000000000L + o * 1000)) }
          .toDF("id", "ts")
        val n = df.select(col("id"), window(col("ts"), "40 seconds", "10 seconds")).count()
        assert(n == offsets.length * 4L) // 40/10 = 4 windows per event
      }
    }
  }

  test("Kafka wire codec law: random MessageSets round-trip byte-faithfully") {
    import graft.kafka.Wire
    // keys/values cover null, empty (distinct from null on the wire:
    // BYTES(-1) vs BYTES(0)), and arbitrary binary up to 1 KiB
    val bytesGen: Gen[Array[Byte]] = Gen.frequency(
      2 -> Gen.const(null.asInstanceOf[Array[Byte]]),
      1 -> Gen.const(Array.emptyByteArray),
      7 -> Gen.choose(1, 1024).flatMap(n =>
        Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)))
    val recsGen = Gen.choose(0, 20).flatMap(n => Gen.listOfN(n,
      for {
        off <- Gen.choose(0L, 1000000L)
        ts <- Gen.choose(-1L, 4102444800000L) // -1 = NO_TIMESTAMP is legal
        k <- bytesGen
        v <- bytesGen
      } yield Wire.WireRecord(off, ts, k, v)))
    forAll(recsGen, cases = 25) { recs =>
      val decoded = Wire.decodeMessageSet(Wire.encodeMessageSet(recs),
        allowTruncatedTail = false)
      assert(decoded.length == recs.length)
      decoded.zip(recs).foreach { case (d, r) =>
        assert(d.offset == r.offset && d.timestamp == r.timestamp)
        // null and empty must survive as DISTINCT states
        assert((d.key == null) == (r.key == null), "null-key fidelity")
        assert((d.value == null) == (r.value == null), "null-value fidelity")
        if (r.key != null) assert(java.util.Arrays.equals(d.key, r.key))
        if (r.value != null) assert(java.util.Arrays.equals(d.value, r.value))
      }
    }
  }

  test("Kafka gzip wrapper law: random batches survive compress/decompress " +
      "with producer-relative offsets resolved") {
    import graft.kafka.Wire
    val bytesGen: Gen[Array[Byte]] = Gen.frequency(
      2 -> Gen.const(null.asInstanceOf[Array[Byte]]),
      1 -> Gen.const(Array.emptyByteArray),
      7 -> Gen.choose(1, 2048).flatMap(n =>
        Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)))
    val recsGen = Gen.choose(1, 20).flatMap(n => Gen.listOfN(n,
      for {
        ts <- Gen.choose(-1L, 4102444800000L)
        k <- bytesGen
        v <- bytesGen
      } yield Wire.WireRecord(0L, ts, k, v)))
    forAll(recsGen, cases = 25) { recs =>
      val decoded = Wire.decodeMessageSet(Wire.encodeMessageSetGzip(recs),
        allowTruncatedTail = false)
      assert(decoded.length == recs.length)
      // producer convention (wrapper offset = n−1 over relative 0..n−1)
      // must resolve to absolute 0..n−1
      assert(decoded.map(_.offset) == recs.indices.map(_.toLong))
      decoded.zip(recs).foreach { case (d, r) =>
        assert(d.timestamp == r.timestamp)
        assert((d.key == null) == (r.key == null), "null-key fidelity")
        assert((d.value == null) == (r.value == null), "null-value fidelity")
        if (r.key != null) assert(java.util.Arrays.equals(d.key, r.key))
        if (r.value != null) assert(java.util.Arrays.equals(d.value, r.value))
      }
    }
  }

  test("H.264 I_PCM law: random frames at random even dims round-trip " +
      "pixel-exactly") {
    import graft.multimodal.H264
    val gen = for {
      w <- Gen.choose(1, 17).map(_ * 2) // 2..34: crosses MB boundaries
      h <- Gen.choose(1, 17).map(_ * 2)
      seed <- Gen.choose(Int.MinValue, Int.MaxValue)
    } yield (w, h, seed)
    forAll(gen, cases = 20) { case (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val y = new Array[Byte](w * h); rnd.nextBytes(y)
      val cb = new Array[Byte](w * h / 4); rnd.nextBytes(cb)
      val cr = new Array[Byte](w * h / 4); rnd.nextBytes(cr)
      val f = H264.Frame(w, h, y, cb, cr)
      val out = H264.decodeNals(Seq(H264.encodeSpsNal(w, h),
        H264.encodePpsNal(), H264.encodeIdrIPcmNal(f)))
      assert(out.length == 1)
      val g = out.head
      assert(g.width == w && g.height == h, s"dims ${g.width}x${g.height}")
      assert(java.util.Arrays.equals(g.y, y), s"luma ${w}x$h seed $seed")
      assert(java.util.Arrays.equals(g.cb, cb), "cb")
      assert(java.util.Arrays.equals(g.cr, cr), "cr")
    }
  }

  test("Haar pyramid law: random cell tables equal a plain-Scala replay") {
    val s = spark
    import s.implicits._
    val cellsGen = for {
      nGroups <- Gen.choose(1, 3)
      rows <- Gen.listOfN(nGroups * 20, for {
        g <- Gen.choose(0, nGroups - 1)
        day <- Gen.choose(0L, 31L)
        m <- Gen.choose(-100000L, 100000L)
      } yield (s"g$g", day, m))
    } yield rows.groupBy(r => (r._1, r._2)) // one cell per (g, day)
      .map { case ((g, d), vs) => (g, d, vs.map(_._3).sum) }.toSeq
    forAll(cellsGen, cases = 8) { cells =>
      whenever(cells.nonEmpty) {
        val got = graft.functions.TimeSeries.haarFromCells(
            cells.toDF("g", "day", "m"), "g")
          .collect()
          .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
            r.getLong(4))).toSet
        val d0 = cells.map(_._2).min
        val want = cells.groupBy(_._1).flatMap { case (g, rows) =>
          var m = (0 until 32).map(p =>
            rows.collectFirst { case (_, d, v) if d - d0 == p => v }
              .getOrElse(0L)).toVector
          val all = Seq.newBuilder[(Int, Int, Long)]
          for (l <- 1 to 5) {
            val pairs = m.grouped(2).toVector
            pairs.zipWithIndex.foreach { case (Vector(a, b), p) =>
              all += ((l, p, a - b)) }
            m = pairs.map { case Vector(a, b) => a + b }
          }
          all.result().sortBy { case (l, p, d) => (-math.abs(d), l, p) }
            .take(5).zipWithIndex
            .map { case ((l, p, d), i) => (g, i + 1, l, p, d) }
        }.toSet
        assert(got == want, s"cells=$cells")
      }
    }
  }
}
