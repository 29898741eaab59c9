package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.functions._

import graft.expressions.{DamerauLevenshtein, JaroWinkler}

/** Entity-resolution fuzzy matching over string keys.
  *
  * The shape that survives scale is DICTIONARY-FIRST: aggregate the
  * corpus down to its distinct names (with multiplicity), block the
  * tiny dictionary on a cheap deterministic key, and run the O(|a|·|b|)
  * edit-distance verifier only inside blocks. The corpus itself is
  * touched exactly once (the distinct aggregation, map-side partials);
  * every all-pairs-flavored step runs on the dictionary, which is
  * orders of magnitude smaller than the rows it describes.
  */
object FuzzyMatch {

  /** Unrestricted Damerau-Levenshtein distance (codegen'd custom
    * expression — Spark ships only plain `levenshtein`). */
  def damerauLevenshtein(a: Column, b: Column): Column =
    GraftShims.column(DamerauLevenshtein(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Classic Jaro-Winkler similarity in [0, 1] (codegen'd custom
    * expression — Spark ships no Jaro family). */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftShims.column(JaroWinkler(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** Blocked fuzzy self-match of the distinct values of `nameCol`:
    * returns (name_a, name_b, n_a, n_b, lev, dl) for distinct name
    * pairs in the same block with unrestricted Damerau-Levenshtein
    * ≤ `maxDist` (name_a < name_b).
    *
    * `blockKey` is part of the match SEMANTICS (pairs in different
    * blocks are non-candidates by definition), which is what makes the
    * operator exact rather than approximate: recall within a block is
    * total because every in-block pair is verified.
    */
  def dictionaryMatch(rows: DataFrame, nameCol: String,
                      blockKey: Column => Column, maxDist: Int): DataFrame = {
    val dict = rows.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n"))
      .withColumn("blk", blockKey(col("name")))
    val a = dict.select(col("blk"), col("name").as("name_a"), col("n").as("n_a"))
    val b = dict.select(col("blk"), col("name").as("name_b"), col("n").as("n_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dl", damerauLevenshtein(col("name_a"), col("name_b")))
      .filter(col("dl") <= maxDist)
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"),
        levenshtein(col("name_a"), col("name_b")).as("lev"), col("dl"))
  }

  /** The SIMILARITY-thresholded twin of [[dictionaryMatch]]: distinct
    * in-block name pairs with Jaro-Winkler ≥ `minSim` (name_a <
    * name_b), emitting the rounded score. Edit-distance thresholds
    * (dl ≤ k) treat a typo in a 5-char code and a 40-char title the
    * same; a RELATIVE score is the right gate when key lengths vary —
    * the two gates are complementary, not redundant. Same
    * dictionary-first cost shape: the corpus is aggregated once and
    * the O(|a|·|b|) scorer runs only inside dictionary blocks. */
  def jaroWinklerMatch(rows: DataFrame, nameCol: String,
                       blockKey: Column => Column, minSim: Double): DataFrame = {
    val dict = rows.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n"))
      .withColumn("blk", blockKey(col("name")))
    val a = dict.select(col("blk"), col("name").as("name_a"), col("n").as("n_a"))
    val b = dict.select(col("blk"), col("name").as("name_b"), col("n").as("n_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("jw", round(jaroWinkler(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= minSim)
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"), col("jw"))
  }
}
