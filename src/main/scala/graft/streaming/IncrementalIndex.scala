package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incrementally-maintained INVERTED INDEX over a document changelog —
  * [[IncrementalView]]'s adder/subtractor discipline applied to the
  * retrieval index (the live twin of the batch `x29_inverted_index`
  * statistics): each change retracts the OLD text's term contributions
  * and adds the NEW text's, so the per-term (df, total_tf) table
  * follows from folding per-batch deltas — the corpus is never
  * re-tokenized, and a re-indexing job never exists.
  *
  * df and total_tf are both algebraic in exact LONG arithmetic
  * (df ±1 per distinct term per doc, tf ±count), so adds and
  * subtracts telescope exactly and the maintained index is spec-pinned
  * EQUAL to a from-scratch recompute of the live documents after every
  * micro-batch, through overwrites, deletes, and resurrections.
  * Postings LISTS are deliberately not maintained here — a list is not
  * algebraic (no subtractor); the per-doc store remains the changelog
  * itself, and rankers that need per-(term, doc) tf read it through
  * the batch index (x29) or [[graft.state.StateQueries]].
  *
  * Scale shape: the stored index is vocabulary-sized; each micro-batch
  * tokenizes only its changed documents (|batch| work), partial-
  * aggregates to |touched terms| delta rows, and merges — O(|batch| +
  * |vocab|) per batch with [[SwapDir]]'s crash-safe swap, O(touched
  * terms) on a transactional table (the [[ChangelogSink]] note).
  * Batch-id high-water-mark dedup makes foreachBatch redelivery a
  * no-op, exactly as [[IncrementalView]]. */
object IncrementalIndex {

  /** One term's maintained statistics. */
  case class TermAgg(term: String, df: Long, total_tf: Long)

  private val MetaFile = "_applied_batch"

  /** The ONE tokenizer of the index — the plain-Scala form of
    * `TextAnalysis.tokens` (lowercase, split \W+, drop empties; the
    * equivalence is spec-asserted corpus-wide), as per-term counts.
    * Locale.ROOT pins the case mapping: default-locale toLowerCase
    * forks on e.g. a Turkish JVM ('I' → dotless 'ı'), silently
    * splitting the maintained index from the batch x29 index. */
  private[streaming] def termCounts(text: String): Map[String, Long] =
    text.toLowerCase(java.util.Locale.ROOT).split("\\W+").filter(_.nonEmpty)
      .groupBy(identity).map { case (t, o) => t -> o.length.toLong }

  def start(changes: Dataset[Change], tablePath: String,
            checkpoint: String): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Change], batchId: Long) =>
        applyBatch(batch, tablePath, batchId)
      }
      .start()

  /** The maintained index's live rows (empty before the first commit). */
  def index(spark: SparkSession, tablePath: String): Dataset[TermAgg] = {
    import spark.implicits._
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.resolveCurrent(fs, tablePath)
      .map(spark.read.parquet(_).as[TermAgg])
      .getOrElse(spark.emptyDataset[TermAgg])
  }

  /** One delta merge; also the batch-backfill entry. Skips batch ids at
    * or below the stored high-water mark (foreachBatch redelivery). */
  def applyBatch(batch: Dataset[Change], tablePath: String,
                 batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.cleanStaleTmp(fs, tablePath)

    val currentPath = SwapDir.resolveCurrent(fs, tablePath)
    if (currentPath.exists(p => appliedBatch(fs, p).exists(_ >= batchId)))
      return
    val current = currentPath
      .map(spark.read.parquet(_).as[TermAgg])
      .getOrElse(spark.emptyDataset[TermAgg])

    // adder (+new text) / subtractor (−old text), per change row; a
    // term's df moves by ±1 per document CONTAINING it, tf by ±count
    val delta = batch.flatMap { c =>
      val sub = if (c.old == null) Map.empty[String, Long] else termCounts(c.old)
      val add = if (c.value == null) Map.empty[String, Long] else termCounts(c.value)
      (sub.keySet ++ add.keySet).iterator.map { t =>
        val a = add.getOrElse(t, 0L)
        val s = sub.getOrElse(t, 0L)
        TermAgg(t,
          (if (a > 0) 1L else 0L) - (if (s > 0) 1L else 0L),
          a - s)
      }.toSeq
    }
    val merged = current.unionByName(delta)
      .groupBy("term")
      .agg(sum("df").as("df"), sum("total_tf").as("total_tf"))
      .filter(col("df") > 0)

    val tmp = SwapDir.tmpPath(tablePath)
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val out = fs.create(new Path(tmp, MetaFile), true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    SwapDir.commit(fs, tablePath, tmp)
  }

  private def appliedBatch(fs: org.apache.hadoop.fs.FileSystem,
                           tablePath: String): Option[Long] = {
    val p = new Path(tablePath, MetaFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        s.toLongOption
      } finally in.close()
    }
  }
}
