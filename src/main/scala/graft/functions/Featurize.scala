package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-dimension featurization for model pipelines.
  *
  * The hashing trick (Weinberger et al. 2009, "Feature Hashing for
  * Large Scale Multitask Learning") maps an unbounded vocabulary into a
  * FIXED feature space with no dictionary: feature index h(term) mod d,
  * value Σ ξ(term) over occurrences with a ±1 sign hash ξ — the signed
  * sum makes collisions cancel in expectation, so the estimator of any
  * inner product is unbiased. No vocabulary table means no vocabulary
  * BUILD: featurization is a single pass that never learns state, the
  * property that lets a 100 TB corpus featurize map-side with one
  * (doc, feat)-keyed aggregation and lets train/serve skew vanish (the
  * same hash runs everywhere).
  *
  * Both hashes ride the engine-portable md5 discipline ([[Sampling]]):
  * index = 60-bit md5 prefix mod d, sign from an independent
  * `:sign`-salted digest — DuckDB reproduces them verbatim.
  */
object Featurize {

  /** ±1 sign hash of a term (independent of the index hash by salt). */
  def signHash(term: Column): Column =
    lit(1L) - lit(2L) * pmod(Sampling.rawHash(concat(term, lit(":sign"))), lit(2L))

  /** Sparse hashed bag-of-words: (doc_id, feat, weight) rows with
    * feat = h(term) mod `dim` and weight = Σ ±1 over the doc's token
    * occurrences (exact integers; exact-zero cancellations dropped —
    * they carry no information and a dense reader materializes zeros
    * anyway). One exchange: the (doc_id, feat) aggregation, partial
    * map-side; the token explode and both hashes are projections. */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     dim: Int = 256): DataFrame = {
    require(dim >= 2 && dim <= (1 << 20), s"feature dimension out of range: $dim")
    docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .select(col("doc_id"),
        Sampling.hashBucket(col("term"), dim).cast("int").as("feat"),
        signHash(col("term")).as("sgn"))
      .groupBy("doc_id", "feat").agg(sum("sgn").as("weight"))
      .filter(col("weight") =!= 0)
  }
}
