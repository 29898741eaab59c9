package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact → MinHash+LSH → SimHash → n-gram Jaccard.
  *
  * Design for 100 TB:
  *  - every candidate-generation step is a hash-partitioned groupBy/join on
  *    a *bounded* key (fingerprint, band signature, bucket) — never an
  *    all-pairs product;
  *  - the only data-sized shuffles hash short digests, not documents;
  *  - all hashing is md5-based and engine-portable (identical hex output in
  *    Spark and the DuckDB oracle), and every aggregate has a map-side
  *    partial (min / sum).
  */
object DedupOps {

  /** Exact dedup: group identical texts, keep the smallest doc_id as the
    * representative. Grouping on the md5 fingerprint keeps the shuffle rows
    * small (32-byte digest vs full document). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .groupBy(col("__fp").as("fp"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("dup_cnt"))

  /** Word n-gram shingles (default 3). Documents shorter than n words
    * collapse to a single whole-document shingle. */
  def shingles(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))

  /** MinHash signature rows: one row per (doc, seed) with the min md5 over
    * the doc's shingles. Lexicographic min over hex digests is a valid
    * uniform minhash and is engine-portable. The min is an algebraic
    * aggregate ⇒ map-side combine; shuffle volume is |docs| × numHashes
    * short strings regardless of document size. */
  def minhashRows(docs: DataFrame, idCol: String, textCol: String,
                  numHashes: Int, shingleN: Int = 3): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(shingles(TextAnalysis.tokens(col(textCol)), shingleN)).as("sh"))
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(numHashes - 1))).as("seed"), col("sh"))
      .withColumn("h", md5(concat_ws("|", col("seed"), col("sh"))))
      .groupBy("doc_id", "seed").agg(min("h").as("mh"))

  /** LSH band signatures: seeds are grouped into bands of `rowsPerBand`;
    * a band's signature joins its (seed-tagged, sorted) minhashes. Docs
    * sharing any (band, signature) are near-dup candidates. */
  def lshBands(mh: DataFrame, rowsPerBand: Int): DataFrame =
    mh.withColumn("band", col("seed") / lit(rowsPerBand) cast "int")
      .groupBy("doc_id", "band")
      .agg(concat_ws("|",
        sort_array(collect_list(concat(lpad(col("seed"), 2, "0"), lit(":"), col("mh")))))
        .as("sig"))

  /** Candidate near-dup pairs (a < b) from shared LSH buckets. The join key
    * (band, sig) is the LSH bucket — cardinality ∝ corpus size, and each
    * bucket is tiny, so the self-join is a bucket-local product, not n². */
  def lshCandidatePairs(bands: DataFrame): DataFrame = {
    val l = bands.select(col("band"), col("sig"), col("doc_id").as("a"))
    val r = bands.select(col("band").as("band2"), col("sig").as("sig2"), col("doc_id").as("b"))
    l.join(r, l("band") === r("band2") && l("sig") === r("sig2") && l("a") < r("b"))
      .select("a", "b").distinct()
  }

  /** End-to-end MinHash-LSH candidate pairs. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 12, rowsPerBand: Int = 3): DataFrame =
    lshCandidatePairs(lshBands(minhashRows(docs, idCol, textCol, numHashes), rowsPerBand))

  /** 16-bit SimHash signature per document: per token-hash bit, majority
    * vote of ±1 contributions. Two shuffle-free explodes + one aggregation
    * keyed by (doc, bit) then (doc); contributions sum map-side.
    * 16 bits keeps the oracle SQL tractable; the construction generalizes
    * to 64 by changing the constant. */
  def simhash16(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("h"),
        explode(sequence(lit(0), lit(15))).as("bitpos"))
      // nibble = hex digit at bitpos/4; bit = that nibble's (3 - bitpos%4)-th bit
      .withColumn("nib", conv(expr("substring(h, (bitpos div 4) + 1, 1)"), 16, 10).cast("int"))
      .withColumn("contrib", expr("(shiftright(nib, 3 - (bitpos % 4)) % 2) * 2 - 1"))
      .groupBy("doc_id", "bitpos")
      .agg(sum("contrib").as("s"))
      .withColumn("bit", when(col("s") > 0, 1L).otherwise(0L))
      .groupBy("doc_id")
      .agg(sum(expr("shiftleft(bit, cast(bitpos as int))")).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, blocked by the
    * high byte of the signature (at 16 bits a coarse block; at 64 bits use
    * the standard (d+1)-band split — same shape). */
  def simhashPairs(sigs: DataFrame, maxDist: Int): DataFrame = {
    val l = sigs.select(col("doc_id").as("a"), col("simhash").as("ha"))
      .withColumn("blk", shiftright(col("ha"), 8))
    val r = sigs.select(col("doc_id").as("b"), col("simhash").as("hb"))
      .withColumn("blk2", shiftright(col("hb"), 8))
    l.join(r, l("blk") === r("blk2") && l("a") < r("b"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("int"))
      .filter(col("hamming") <= maxDist)
      .select("a", "b", "hamming")
  }

  /** n-gram Jaccard similarity for candidate pairs: |shingles(a) ∩
    * shingles(b)| / |union|. Computed via an explode + count join so set
    * sizes aggregate map-side; only candidate pairs (from LSH or another
    * blocker) ever meet. */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   pairs: DataFrame, shingleN: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
        explode(shingles(TextAnalysis.tokens(col(textCol)), shingleN)).as("sh"))
      .distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // hash-join on (doc, shingle) both hops — never a per-pair cross product
    val inter = pairs
      .join(sh.withColumnRenamed("doc_id", "a"), "a")
      .join(sh.withColumnRenamed("doc_id", "b"), Seq("b", "sh"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
      .join(inter, Seq("a", "b"), "left_outer")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .select(col("a"), col("b"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 6).as("jaccard"))
  }
}
