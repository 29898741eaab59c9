package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV distinct sketch: exact below k, within the published error bound
  * above k, and invariant to partitioning (the merge path). */
class SketchesSpec extends SparkSpec {

  test("exact when the group has fewer than k distinct values") {
    val s = spark
    import s.implicits._
    val df = (1 to 500).map(i => ("g", i % 40)).toDF("g", "v")
    val Array(row) = Sketches.kmvDistinct(df, Seq("g"), "v", k = 64).collect()
    assert(row.getDouble(1) == 40.0)
  }

  test("estimate within ~4 standard errors of the truth above k") {
    val s = spark
    import s.implicits._
    val distinct = 10000
    val df = (1 to distinct).map(i => ("g", i)).toDF("g", "v")
    val k = 256
    val Array(row) = Sketches.kmvDistinct(df, Seq("g"), "v", k = k).collect()
    val est = row.getDouble(1)
    val se = distinct / math.sqrt(k - 2)
    assert(math.abs(est - distinct) < 4 * se, s"est=$est truth=$distinct se=$se")
  }

  test("partitioning-invariant and duplicate-insensitive (merge path)") {
    val s = spark
    import s.implicits._
    val base = (1 to 3000).map(i => ("g", i % 1000)) // every value 3 times
    val one = Sketches.kmvDistinct(base.toDF("g", "v").coalesce(1),
      Seq("g"), "v", k = 128).collect().head.getDouble(1)
    val many = Sketches.kmvDistinct(base.toDF("g", "v").repartition(17),
      Seq("g"), "v", k = 128).collect().head.getDouble(1)
    assert(one == many)
  }

  test("NULL values are ignored, per count(DISTINCT) convention") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", Some(1)), ("g", Some(2)), ("g", None), ("g", None))
      .toDF("g", "v")
    val Array(row) = Sketches.kmvDistinct(df, Seq("g"), "v", k = 16).collect()
    assert(row.getDouble(1) == 2.0)
  }

  test("k below 3 is rejected") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      Sketches.kmvDistinct(Seq(("g", 1)).toDF("g", "v"), Seq("g"), "v", k = 2)
    }
  }

  // ---- HLL ---------------------------------------------------------------

  test("HLL: small cardinalities hit the linear-counting regime near-exactly") {
    val s = spark
    import s.implicits._
    val df = (1 to 900).map(i => ("g", i % 300)).toDF("g", "v")
    val Array(row) = Sketches.hllDistinct(df, Seq("g"), "v").collect()
    val est = row.getDouble(2)
    // linear counting at n=300, m=1024: relative error well under 10%
    assert(math.abs(est - 300.0) < 30.0, s"est=$est")
  }

  test("HLL: estimate within ~4 standard errors at 50k distinct (b=10)") {
    val s = spark
    import s.implicits._
    val distinct = 50000
    val df = (1 to distinct).map(i => ("g", i)).toDF("g", "v")
    val Array(row) = Sketches.hllDistinct(df, Seq("g"), "v").collect()
    val est = row.getDouble(2)
    val se = 1.04 / math.sqrt(1024.0) * distinct
    assert(math.abs(est - distinct) < 4 * se, s"est=$est truth=$distinct se=$se")
  }

  test("HLL: partitioning-invariant and duplicate-insensitive (register max merges)") {
    val s = spark
    import s.implicits._
    val base = (1 to 15000).map(i => ("g", i % 5000))
    val one = Sketches.hllDistinct(base.toDF("g", "v").coalesce(1),
      Seq("g"), "v").collect().head.getDouble(2)
    val many = Sketches.hllDistinct(base.toDF("g", "v").repartition(17),
      Seq("g"), "v").collect().head.getDouble(2)
    assert(one == many)
  }

  test("HLL: NULLs ignored; per-group registers independent") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some(1)), ("a", Some(2)), ("a", None),
      ("b", Some(7))).toDF("g", "v")
    val got = Sketches.hllDistinct(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // tiny n: linear counting m·ln(m/(m−c)) ≈ c + c²/2m — near-exact
    assert(got("a")._1 === 2L && math.abs(got("a")._2 - 2.0) < 0.01, got)
    assert(got("b")._1 === 1L && math.abs(got("b")._2 - 1.0) < 0.01, got)
  }

  test("HLL: bucket-bit bounds enforced") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(Seq(("g", 1)).toDF("g", "v"), Seq("g"), "v", b = 3)
    }
  }

  test("HLL overlap: near-identical sets read jaccard ~1, disjoint sets ~0") {
    val s = spark
    import s.implicits._
    val shared = (1 to 3000).map(i => ("A", s"v$i")) ++
      (1 to 3000).map(i => ("B", s"v$i")) ++
      (1 to 3000).map(i => ("C", s"w$i"))
    val out = Sketches.hllOverlap(shared.toDF("g", "v"), "g", "v", b = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val (_, _, jAB) = out(("A", "B"))
    assert(jAB > 0.9, s"identical sets must read ~1: $out")
    val (_, _, jAC) = out(("A", "C"))
    assert(jAC < 0.1, s"disjoint sets must read ~0: $out")
    // union of identical sets estimates like the single set
    val (u, sh, _) = out(("A", "B"))
    assert(math.abs(u - sh) / u < 0.25, s"A=B: union ≈ shared: $out")
  }

  test("AMS F2: a single-value stream estimates its self-join size EXACTLY") {
    val s = spark
    import s.implicits._
    // one distinct value, n copies: every Z_j = ±n, every Z_j² = n²,
    // so the median is exactly F₂ = n² — zero estimator variance
    val n = 137
    val df = Seq.fill(n)("only").toDF("v")
    val r = Sketches.amsF2(df, "v", sketches = 8).collect().head
    assert(r.getLong(0) == 8L)
    assert(r.getLong(1) == n.toLong * n, s"true F2: $r")
    assert(r.getDouble(2) == (n.toLong * n).toDouble, s"estimate must be exact: $r")
    assert(r.getDouble(3) == 0.0, s"rel_err: $r")
  }

  test("AMS F2: estimate within 5 relative standard errors on a skewed stream") {
    val s = spark
    import s.implicits._
    // zipf-ish: value i repeated 200/i times, i = 1..50
    val rows = (1 to 50).flatMap(i => Seq.fill(200 / i)(s"w$i"))
    val trueF2 = (1 to 50).map(i => { val f = (200 / i).toLong; f * f }).sum
    val r = Sketches.amsF2(rows.toDF("v"), "v", sketches = 8).collect().head
    assert(r.getLong(1) == trueF2)
    // var(Z²) ≤ 2·F₂² ⇒ rse ≈ sqrt(2); median-of-8 tames it, 5×√2 is safe
    assert(math.abs(r.getDouble(3)) < 5 * math.sqrt(2.0),
      s"AMS estimate implausibly far from F2: $r")
  }

  test("AMS F2: Z vectors merge by addition across shards (sketch linearity)") {
    val s = spark
    import s.implicits._
    val all = (1 to 400).map(i => s"w${i % 37}")
    val (sh1, sh2) = all.splitAt(167)
    // the merge law lives on the Z vector: Z(union) = Z(a) + Z(b) per j
    def zvec(xs: Seq[String]): Map[Int, Long] =
      Sketches.amsZ(xs.toDF("v"), "v", sketches = 8)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (za, zb, zu) = (zvec(sh1), zvec(sh2), zvec(all))
    (0 until 8).foreach { j =>
      assert(za(j) + zb(j) == zu(j), s"sketch row $j must merge additively")
    }
  }

  test("AMS: streaming complete-mode Z vector converges to the batch sketch") {
    val s = spark
    import s.implicits._
    implicit val sql = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val all = (1 to 600).map(i => s"w${i % 53}")
    val in = MemoryStream[String]
    val name = s"ams${System.nanoTime()}"
    val q = Sketches.amsZ(in.toDF().withColumnRenamed("value", "v"), "v", 8)
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      all.grouped(210).foreach { b => in.addData(b); q.processAllAvailable() }
      val got = s.table(name)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val want = Sketches.amsZ(all.toDF("v"), "v", 8)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == want, s"stream Z must equal batch Z: $got vs $want")
    } finally q.stop()
  }
}
