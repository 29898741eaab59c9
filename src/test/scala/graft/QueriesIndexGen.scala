package graft

import org.apache.spark.sql.DataFrame

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Generator for `QUERIES.md` — the navigable index of every
  * `SparkEntry.queries` entry: id → one-line description → physical plan
  * shape → SCALE.md anchor. Descriptions come from the comment block
  * directly above each entry in `SparkEntry.scala` (the in-source doc),
  * with a supplemental map for the self-describing early entries that
  * carry no comment; [[QueriesIndexSpec]] fails the build when an id has
  * neither, or when the committed QUERIES.md drifts from the source.
  *
  * Run: `sbt "Test/runMain graft.QueriesIndexGen"` (writes QUERIES.md;
  * plan shapes are read from the executed plan at sf0.001 with AQE off,
  * so the static shape — scans, joins, exchanges, aggregates — is
  * visible rather than the runtime-coalesced one).
  */
object QueriesIndexGen {

  private val entryRx = """^\s*"([a-z0-9_]+)" ->.*""".r

  /** One-line descriptions for entries whose code is self-describing and
    * carries no adjacent comment block. */
  val supplemental: Map[String, String] = Map(
    "p1_pipe" -> "Identity pipe: event projection read through unchanged (reference Pipe topology).",
    "q1_agg" -> "TPC-H Q1 shape: shipped-lineitem pricing aggregates per (returnflag, linestatus).",
    "w1_tumbling_count" -> "Hourly tumbling-window event counts per event type (reference WindowedGrouping).",
    "j1_band_join" -> "Inner windowed band join: same-user event pairs within 24 h (reference WindowedJoin).",
    "k1_latest_per_key" -> "KTable materialization: latest event per user (max_by aggregate, one shuffle).",
    "d1_exact_dedup" -> "Exact dedup: normalized-text md5 groups with representative id and duplicate count.",
    "s1_cosine_topk" -> "Brute-force cosine top-5 neighbors for the probe vectors (bounded topK aggregate).",
    "t1_langid" -> "N-gram-heuristic language identification per document.",
    "x1_setops" -> "INTERSECT/EXCEPT set algebra over per-type user sets.",
    "p2_mapvalues" -> "Stateless mapValues: square each event's value (reference mapValues/Pipe family).",
    "p3_selectkey" -> "selectKey re-keying: lineitems keyed by a returnflag-linestatus composite.",
    "p4_flatmap_split" -> "flatMapValues split: explode each document into its tokens (reference LineSplit).",
    "a2_wordcount" -> "The reference WordCount: token explode then groupBy(word).count.",
    "a3_count_by_key" -> "groupByKey + count per user — the reference's counts store.",
    "a4_reduce_sum" -> "groupByKey + reduce: per-user value sum (reference IntegerAdd reduce).",
    "a5_agg_stats" -> "Multi-aggregate per order status: count/sum/min/max in one pass.",
    "w2_tumbling_sum" -> "Daily tumbling-window sum of event value per user.",
    "w3_session" -> "6-hour-gap session windows per user with event counts.",
    "w4_sliding_count" -> "Sliding 2h/1h hopping-window event counts.",
    "j2_left_band_count" -> "Left windowed band join (0..24 h) with per-left match counts; unmatched events keep count 0.",
    "j3_enrich" -> "Stream-table enrichment: every event joined to its customer row.",
    "j4_ktable_join" -> "KTable-KTable PK join: latest event per user against the broadcast customer dim.",
    "j5_table_self_join" -> "KTable self-join: each user's latest click joined to their latest purchase.",
    "j6_fk_left_join" -> "KTable FK left join: orders to the BUILDING-segment customer slice; other FKs null-pad.",
    "j7_fk_inner_join" -> "Chained FK inner joins: lineitem to broadcast part and supplier dims.",
    "j8_semi_join" -> "Left-semi join: customers having a >400k order.",
    "j9_anti_join" -> "Left-anti join: customers with no >400k order.",
    "j10_q3_shipping" -> "TPC-H Q3 shape: unshipped-order revenue (three-way join, aggregate, bounded top-N).",
    "k2_upsert_tombstone" -> "Changelog upsert view with tombstones: latest row per user; error rows delete the key.",
    "k5_scd2_asof" -> "Point-in-time (as-of) lookup over the k4 SCD2 history at a fixed cutoff.",
    "d2_minhash_lsh" -> "MinHash-LSH candidate near-dup pairs (12 hashes, 4 bands of 3).",
    "d4_simhash" -> "64-bit SimHash signature per document.",
    "s2_lsh_ann" -> "SRP-LSH bucketed ANN candidate pairs over the embedding corpus.",
    "s3_ivf_assign" -> "IVF coarse assignment: each vector to its nearest of 16 deterministic seed centroids.",
    "t2_quality" -> "Per-doc quality features: token count/length, stopword and punctuation ratios, composite score.",
    "t3_token_count" -> "Whitespace and regex token counts per document (the two tokenizer contracts).",
    "t4_fingerprint" -> "Normalized-text md5 fingerprint per document (the exact-dedup digest).",
    "m1_bytes_meta" -> "Opaque-content metadata: byte vs char length per document.",
    "x2_topk_users" -> "Global top-10 users by total event value with dense rank.",
    "x3_rollup" -> "ROLLUP over (returnflag, linestatus) with counts and quantity sums.",
    "x8_cube" -> "CUBE over (orderstatus, orderpriority) with counts and totals.",
    "x4_json_extract" -> "JSON field extraction from the event props payload.",
    "x5_window_rank" -> "Top-3 events per user by value via a row_number window.",
    "x6_distinct_count" -> "Multi-column distinct counts per returnflag.",
    "x41_snapshot_diff" -> "Corpus snapshot CDC: added/removed/changed doc keys between two content-digest snapshots.",
    "x31_sessionize" -> "300-second-gap sessionization with per-session count/span/value rollups.",
    "x95_decay_attribution" -> "Exponentially time-decayed multi-touch attribution of purchase credit.",
    "x57_attribution" -> "Last-touch attribution: purchase value credited to the latest preceding non-purchase event within 7 days.",
    "g10_modularity" -> "Label-propagation communities on the part co-purchase graph plus modularity readout.",
    "x71_epoch_shards" -> "Epoch-salted hash sharding: per-epoch shard assignment churn readout.",
    "g8_sssp" -> "Bounded-hop single-source shortest path over the bigram graph (4 relaxation rounds).",
    "x45_retention_cohorts" -> "Weekly cohort retention triangle from first-seen week.",
    "x65_cusum" -> "CUSUM changepoint series over daily purchase volume with a frozen (mu, sigma) baseline.")

  /** id → one-line description, extracted from the queries map region of
    * SparkEntry.scala (adjacent comment block, section separators
    * excluded) with [[supplemental]] as fallback; ids with neither map
    * to an empty string (the spec turns that into a failure). */
  def descriptions(srcPath: String = "src/main/scala/graft/SparkEntry.scala")
      : Seq[(String, String)] = {
    val src = new String(Files.readAllBytes(Paths.get(srcPath)),
      StandardCharsets.UTF_8).split('\n')
    val qstart = src.indexWhere(_.contains("def queries"))
    val qend = src.indexWhere(_.contains("def oracleSql"))
    def isSeparator(l: String): Boolean =
      l.contains("----") || l.trim.startsWith("// §")
    val out = Seq.newBuilder[(String, String)]
    for (i <- qstart until qend) src(i) match {
      case entryRx(id) =>
        var j = i - 1
        while (j > qstart && src(j).trim.isEmpty) j -= 1
        val block = Seq.newBuilder[String]
        while (j > qstart && src(j).trim.startsWith("//") && !isSeparator(src(j))) {
          block += src(j).trim.stripPrefix("//").trim
          j -= 1
        }
        val fromComment = block.result().reverse.mkString(" ")
          .replaceAll("\\s+", " ").trim
        val desc =
          if (fromComment.nonEmpty) oneLine(fromComment)
          else supplemental.getOrElse(id, "")
        out += ((id, desc))
      case _ => ()
    }
    out.result()
  }

  /** Cut a comment block down to its first sentence (bounded length). */
  private def oneLine(s: String): String = {
    val cut = {
      val idx = s.indexOf(". ")
      if (idx > 20) s.substring(0, idx + 1) else s
    }
    if (cut.length <= 180) cut
    else cut.take(177).reverse.dropWhile(c => c != ' ').reverse.trim + "…"
  }

  /** Compact physical-plan summary: node-kind counts of the executed
    * plan (AQE off in the generator session, so the static shape shows). */
  def planShape(df: DataFrame): String = {
    val counts = scala.collection.mutable.LinkedHashMap(
      "scan" -> 0, "bcast-join" -> 0, "shuffle-join" -> 0, "nl-join" -> 0,
      "shuffle" -> 0, "agg" -> 0, "window" -> 0, "generate" -> 0)
    df.queryExecution.executedPlan.foreach { n =>
      val c = n.getClass.getSimpleName
      if (c.contains("FileSourceScan") || c.contains("BatchScan")) counts("scan") += 1
      else if (c.contains("BroadcastHashJoin")) counts("bcast-join") += 1
      else if (c.contains("SortMergeJoin") || c.contains("ShuffledHashJoin")) counts("shuffle-join") += 1
      else if (c.contains("BroadcastNestedLoopJoin") || c.contains("CartesianProduct")) counts("nl-join") += 1
      else if (c.contains("ShuffleExchange")) counts("shuffle") += 1
      else if (c.contains("Aggregate")) counts("agg") += 1
      else if (c.contains("Window")) counts("window") += 1
      else if (c.contains("Generate")) counts("generate") += 1
    }
    val s = counts.filter(_._2 > 0)
      .map { case (k, v) => if (v == 1) k else s"$k ×$v" }.mkString(", ")
    if (s.isEmpty) "local/driver-composed" else s
  }

  def render(shapes: Map[String, String], scaleMd: String): String = {
    val descs = descriptions()
    // batch query id → gated streaming twin ids (the STREAMCHECK column)
    val twinsOf: Map[String, Seq[String]] = StreamVerify.twins
      .groupBy(_._2).view.mapValues(_.map(_._1).sorted.toSeq).toMap
    val header =
      s"""# QUERIES — generated index of the ${descs.size}-query surface
        |
        |Generated by `sbt "Test/runMain graft.QueriesIndexGen"` — do not
        |edit by hand; `QueriesIndexSpec` fails when this file drifts from
        |`SparkEntry.scala`. Columns: query id (the `SparkEntry.queries` /
        |oracle key), one-line description (from the in-source comment),
        |physical plan shape (executed-plan node counts at sf0.001, AQE
        |off), whether SCALE.md carries a measured scaling note for the
        |id, and the STREAMCHECK twin ids hash-gated against the query
        |(`graft.StreamVerify`), — when none.
        |
        || id | description | plan shape | SCALE.md | STREAMCHECK |
        ||---|---|---|---|---|""".stripMargin
    val rows = descs.map { case (id, desc) =>
      val anchor = if (scaleMd.contains(id)) "✓" else "—"
      val shape = shapes.getOrElse(id, "?")
      val twins = twinsOf.get(id).map(_.mkString(", ")).getOrElse("—")
      s"| $id | ${desc.replace("|", "\\|")} | $shape | $anchor | $twins |"
    }
    (header +: rows).mkString("\n") + "\n"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.builder("local[8]", 8)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shapes = SparkEntry.queries.map { case (id, fn) =>
      id -> (try planShape(fn(spark, sfDir))
             catch { case e: Throwable => s"(plan failed: ${e.getClass.getSimpleName})" })
    }
    val scaleMd = new String(Files.readAllBytes(Paths.get("SCALE.md")),
      StandardCharsets.UTF_8)
    Files.write(Paths.get("QUERIES.md"),
      render(shapes, scaleMd).getBytes(StandardCharsets.UTF_8))
    println(s"QUERIES.md written: ${SparkEntry.queries.size} entries")
    spark.stop()
  }
}
