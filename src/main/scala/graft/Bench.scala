package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths and the shared file-status cache once so
    // per-query timings measure the engine, not first-use classloading or
    // parquet footer listing. entry() warms the join/agg path; a synthetic
    // one-row frame through the same tokenizer + explode/agg expressions
    // warms the codegen that the alphabetically-first timed query (a2) was
    // otherwise first to pay — WITHOUT executing a timed query on the timed
    // data, which would warm a2's plan/input caches more than its peers'.
    SparkEntry.entry(spark).count()
    locally {
      import org.apache.spark.sql.functions._
      spark.range(1).select(lit("warm up the token explode agg path").as("text"))
        .select(explode(graft.functions.TextAnalysis.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt")).count()
    }
    Tables.names.foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    // Environment steal (CI neighbors, page-cache churn) showed up in past
    // rounds as ±15-26% swings on identical binaries. Min-of-N across
    // interleaved rounds is the standard fix: each query's reps are spread
    // across the suite's wall-clock, so one noisy window can't tag a query
    // as regressed. The reported time per query is the min over rounds.
    val repeat = sys.env.get("SPARK_GRAFT_BENCH_REPEAT")
      .flatMap(_.trim.toIntOption).getOrElse(3).max(1)
    // optional comma-separated filter (same contract as Verify's
    // SPARK_GRAFT_ONLY) — for A/B runs that need a fixed query subset in
    // an otherwise identical JVM (e.g. replaying an old round's key set
    // to separate suite-growth pressure from per-query regressions)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // A crashed query must not masquerade as a fast one: its slot is null
    // and the error message is reported separately (first failure wins;
    // later rounds skip a query that has already failed).
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    val errors = scala.collection.mutable.Map.empty[String, String]
    for (round <- 1 to repeat; name <- names if !errors.contains(name)) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        times(name) = sec :: times.getOrElse(name, Nil)
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          times.remove(name)
      }
    }
    // min is the headline (environment steal only ADDS time); p50 sits
    // alongside so the per-query noise band is visible in the artifact
    // itself rather than inferred from round-over-round deltas.
    val best = times.view.mapValues(_.min).toMap
    val p50 = times.view.mapValues { ts =>
      val s = ts.sorted
      s((s.length - 1) / 2)
    }.toMap
    val results = names.map { n => (n, best.getOrElse(n, 0.0), errors.get(n)) }
    def jstr(s: String) = "\"" + s.replaceAll("[\"\\\\]", " ").replaceAll("[\\u0000-\\u001f\\u007f]", " ") + "\""
    val qs = results.map { case (k, sec, err) =>
      jstr(k) + ":" + (if (err.isEmpty) sec.toString else "null")
    }.mkString("{", ",", "}")
    val p50s = results.map { case (k, _, err) =>
      jstr(k) + ":" + (if (err.isEmpty) p50(k).toString else "null")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => jstr(k) + ":" + jstr(m.take(200)) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, sec, None) => sec }.sum
    // Noise normalization, carried IN the artifact: host steal inflates
    // every query nearly uniformly (the documented environment
    // signature), so each query's ratio to the suite median is stable
    // across run windows even when raw seconds are not. Cross-round
    // comparisons should read norm[q] (a real regression moves a query
    // AGAINST the suite); the suite median itself tracks the window.
    val okTimes = results.collect { case (_, sec, None) => sec }.sorted
    val suiteMedian =
      if (okTimes.isEmpty) 0.0 else okTimes((okTimes.length - 1) / 2)
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val norms = results.map { case (k, sec, err) =>
      jstr(k) + ":" + (if (err.isEmpty && suiteMedian > 0)
        r4(sec / suiteMedian).toString else "null")
    }.mkString("{", ",", "}")
    // Cross-round delta, also carried IN the artifact: read the previous
    // round's BENCH_DETAIL (env SPARK_GRAFT_BENCH_PREV, else the
    // highest-numbered BENCH_DETAIL_r*.json in the cwd), pull its `norm`
    // map, and emit norm_ratio_vs_prev[q] = norm_now / norm_prev — the
    // freeze artifact itself then answers "which queries regressed
    // beyond noise" (ratio ≫ 1 against a stable suite median) without
    // a manual A/B.
    // p50-based normalization carried alongside the min-based one: the
    // two estimators disagreed in round 14 (0.967 vs 1.024 median) and
    // the honest artifact states both. p50 resists "one lucky reaped
    // round" per query; min resists one slow round.
    val okP50s = results.collect { case (k, _, None) => p50(k) }.sorted
    val suiteMedianP50 =
      if (okP50s.isEmpty) 0.0 else okP50s((okP50s.length - 1) / 2)
    val normsP50 = results.map { case (k, _, err) =>
      jstr(k) + ":" + (if (err.isEmpty && suiteMedianP50 > 0)
        r4(p50(k) / suiteMedianP50).toString else "null")
    }.mkString("{", ",", "}")
    // the current round's own artifact (a rerun) must not become the
    // "previous" baseline — self-ratios of ~1.0 hide real deltas
    val outName = Paths.get(outPath).getFileName.toString
    val prevPath = sys.env.get("SPARK_GRAFT_BENCH_PREV").orElse {
      val rx = "BENCH_DETAIL_r(\\d+)\\.json".r
      Option(new java.io.File(".").listFiles()).toSeq.flatten
        .filter(_.getName != outName)
        .flatMap(f => f.getName match {
          case rx(n) => Some((n.toInt, f.getPath)); case _ => None })
        .sortBy(-_._1).headOption.map(_._2)
    }
    // real JSON parse (Jackson ships with Spark) — the old regex pull
    // was brittle to field reordering/nesting
    val prevTree = prevPath.flatMap { path =>
      try {
        val txt = new String(Files.readAllBytes(Paths.get(path)),
          StandardCharsets.UTF_8)
        Option(new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt))
      } catch { case _: Throwable => None }
    }
    def numMap(field: String): Map[String, Double] = prevTree.flatMap { t =>
      Option(t.get(field)).filter(_.isObject).map { node =>
        val it = node.fields()
        val b = Map.newBuilder[String, Double]
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.isNumber) b += (e.getKey -> e.getValue.asDouble())
        }
        b.result()
      }
    }.getOrElse(Map.empty)
    val prevNorm = numMap("norm")
    // prev norm_p50: prefer the emitted map; else rebuild from prev p50s
    val prevNormP50: Map[String, Double] = {
      val direct = numMap("norm_p50")
      if (direct.nonEmpty) direct
      else {
        val p = numMap("p50")
        if (p.isEmpty) Map.empty
        else {
          val vs = p.values.toSeq.sorted
          val med = vs((vs.length - 1) / 2)
          if (med > 0) p.view.mapValues(_ / med).toMap else Map.empty
        }
      }
    }
    def ratios(curNorm: String => Option[Double], prev: Map[String, Double]) =
      results.map { case (k, _, err) =>
        val ratio = for {
          c <- if (err.isEmpty) curNorm(k) else None
          p <- prev.get(k) if p > 0
        } yield r4(c / p)
        jstr(k) + ":" + ratio.map(_.toString).getOrElse("null")
      }.mkString("{", ",", "}")
    val vsPrev = ratios(
      k => if (suiteMedian > 0) Some(best(k) / suiteMedian) else None, prevNorm)
    val vsPrevP50 = ratios(
      k => if (suiteMedianP50 > 0) Some(p50(k) / suiteMedianP50) else None,
      prevNormP50)
    val prevField = prevPath.filter(_ => prevNorm.nonEmpty || prevNormP50.nonEmpty)
      .map(p => jstr(p)).getOrElse("null")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","repeat":$repeat,"suite_median_sec":${r4(suiteMedian)},"suite_median_p50_sec":${r4(suiteMedianP50)},"prev_detail":$prevField,"queries":$qs,"p50":$p50s,"norm":$norms,"norm_p50":$normsP50,"norm_ratio_vs_prev":$vsPrev,"norm_ratio_vs_prev_p50":$vsPrevP50,"errors":$errs,"sf":"$sfDir"}"""
    // stdout gets buried in sbt [info] noise — the file is the reliable channel.
    val p = Paths.get(outPath)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, (json + "\n").getBytes(StandardCharsets.UTF_8))
    println(json)
    // The per-query line can exceed a log tail window and get clipped at
    // the head; repeat the headline number on its own short line so a
    // parser that only sees the tail still gets the total.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}""")
    spark.stop()
  }
}
