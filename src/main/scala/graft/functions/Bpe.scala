package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge learning — the vocabulary-training
  * stage of an LLM data pipeline (Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"; public
  * literature). Each round counts adjacent symbol pairs over the corpus
  * word-frequency table, picks the most frequent pair, and fuses it into a
  * single symbol; the learned merge list IS the tokenizer.
  *
  * Scale shape (100 TB): the corpus is touched exactly ONCE — the
  * word-frequency aggregation (a map-side-combined token count, the same
  * shuffle as a2_wordcount). Every merge round after that runs on the
  * VOCABULARY table (|unique words| rows — millions at worst, independent
  * of corpus row count), so k rounds cost k tiny aggregations, not k
  * corpus scans. Driver state is one (pair, count) row per round —
  * bounded by the round budget, never by data size.
  *
  * Pair semantics are the textbook `get_stats`: every adjacent symbol
  * position counts (overlapping pairs included — "aaa" contributes
  * (a,a) twice), weighted by word frequency. The merge applies
  * left-to-right non-overlapping, which is exactly what a single-pass
  * string `replace` of "a<SEP>b" with "ab" does — both engines share that
  * contract, and ties on count break on (left, right) string order so the
  * learned table is deterministic cross-engine.
  */
object Bpe {

  /** Unit separator (chr(31) oracle-side). The tokenizer alphabet is
    * [a-zA-Z0-9_] (see [[TextAnalysis.tokens]]), so U+001F can never occur
    * inside a symbol and merged symbols never re-introduce it. Written as
    * an escape, not a literal control byte, so the value survives diffs,
    * editors, and copy-paste. */
  val Sep = "\u001f"

  private val MaxRounds = 64 // driver holds one row per round — keep it a budget

  /** Learn `rounds` BPE merges over the word distribution of `textCol`.
    * Returns the merge table (step, lhs, rhs, merged, cnt) — `rounds`
    * rows, materialized on the driver (bounded), so the cached vocabulary
    * frame is released before returning.
    */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds > 0 && rounds <= MaxRounds, s"rounds must be in [1, $MaxRounds]")
    val spark = docs.sparkSession
    // the one corpus-sized pass: word -> frequency
    val wf = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wf"))
      // initial symbol sequence: the word's characters joined by Sep
      .select(array_join(filter(split(col("w"), ""), c => c =!= ""), Sep).as("syms"),
        col("wf"))
      .persist()

    var cur = wf
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    // while + flag, not a `return` inside the for-closure: in Scala 2.13 a
    // closure return is a thrown NonLocalReturnControl, which a broad
    // catch would intercept. NonFatal also keeps the cleanup handler away
    // from control-flow throwables by construction.
    var step = 1
    var exhausted = false
    try {
      while (step <= rounds && !exhausted) {
        val arr = split(col("syms"), Sep)
        // adjacent pairs: one struct per symbol position (empty for 1-symbol words)
        val pairs = cur
          .select(explode(when(size(arr) >= 2,
              transform(sequence(lit(1), size(arr) - 1),
                i => struct(element_at(arr, i).as("a"), element_at(arr, i + 1).as("b"))))
            .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"),
            col("wf"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum("wf").as("cnt"))
        val top = pairs.orderBy(col("cnt").desc, col("a").asc, col("b").asc)
          .limit(1).collect()
        if (top.isEmpty) {
          // vocabulary fully fused — nothing left to merge
          exhausted = true
        } else {
          val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((step, a, b, a + b, cnt))
          // fuse the winning pair; symbols stay in [A-Za-z0-9_]* so quoting
          // is belt-and-braces
          val pat = java.util.regex.Pattern.quote(a + Sep + b)
          val rep = java.util.regex.Matcher.quoteReplacement(a + b)
          cur = cur.select(regexp_replace(col("syms"), lit(pat), lit(rep)).as("syms"),
            col("wf"))
          step += 1
        }
      }
      finish(spark, wf, merges.result())
    } catch {
      case scala.util.control.NonFatal(e) =>
        wf.unpersist(blocking = false); throw e
    }
  }

  private def finish(spark: SparkSession, cached: DataFrame,
                     rows: Seq[(Int, String, String, String, Long)]): DataFrame = {
    cached.unpersist(blocking = false)
    import spark.implicits._
    rows.toDF("step", "lhs", "rhs", "merged", "cnt")
  }

  /** Apply a learned merge table to tokenize `textCol`: each word's
    * character sequence has the merges applied in step order, yielding the
    * subword segmentation as an array column. Pure map-side projection —
    * the merge table rides along as a chain of `regexp_replace`s (one per
    * merge, the same left-to-right contract as learning), so encoding
    * scales linearly with input splits and never shuffles.
    */
  def encode(docs: DataFrame, textCol: String,
             merges: Seq[(String, String)], out: String = "subwords"): DataFrame = {
    val word = col("__graft_w")
    val base = array_join(filter(split(word, ""), c => c =!= ""), Sep)
    val fused = merges.foldLeft(base) { case (acc, (a, b)) =>
      regexp_replace(acc,
        lit(java.util.regex.Pattern.quote(a + Sep + b)),
        lit(java.util.regex.Matcher.quoteReplacement(a + b)))
    }
    docs
      .withColumn("__graft_w", explode(TextAnalysis.tokens(col(textCol))))
      .withColumn(out, split(fused, Sep))
      .drop("__graft_w")
  }
}
