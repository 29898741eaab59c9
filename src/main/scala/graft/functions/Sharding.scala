package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) sharding — stable assignment of
  * keys to N shards such that growing the fleet to N+1 moves ONLY the
  * keys the new shard wins (≈ 1/(N+1) of them), never a reshuffle of
  * the survivors (Thaler & Ravishankar 1998; the consistent-placement
  * alternative to `hash(key) mod N`, which moves N/(N+1) of all keys).
  *
  * For a 100 TB corpus this is the difference between an incremental
  * reshard that rewrites one new shard's worth of data and one that
  * rewrites the entire dataset: HRW re-routes exactly the rows whose
  * argmax changed, and the winner for every moved row is the NEW shard
  * — a structural theorem (adding a candidate can only change an argmax
  * to itself), spec-pinned, not a statistical tendency.
  *
  * The weight is `md5(key ":" shard)` compared as hex text — portable
  * (identical in Spark and DuckDB/standard SQL, the same cross-engine
  * determinism rule the dedup digests use) and uniform enough that
  * shard loads concentrate tightly around 1/N. Pure projection: per row
  * N codegen'd md5 calls and one array-of-struct max, no shuffle, no
  * state — the assignment can run inside any scan. */
object Sharding {

  /** The HRW shard (0-based LongType) of `key` among `n` shards.
    * Hash ties between distinct inputs are md5 collisions — unreachable
    * in practice; if one occurred the larger shard id would win. */
  def hrwShard(key: Column, n: Int): Column = {
    require(n >= 1 && n <= 256, s"shard count out of range: $n")
    val candidates = (0 until n).map { i =>
      struct(
        md5(concat(key.cast("string"), lit(s":$i"))).as("h"),
        lit(i.toLong).as("s"))
    }
    array_max(array(candidates: _*)).getField("s")
  }

  /** Consistent-hash ring with `vnodes` virtual nodes per shard — the
    * other classic movement-minimal placement (Karger 1997): vnode
    * `"s:v"` sits at its 60-bit md5 position on the ring; a key belongs
    * to the first vnode clockwise from its own position (wrap-around to
    * the ring minimum). HRW costs O(N) hashes per KEY; the ring costs
    * |ring| hashes ONCE and a successor lookup per key — the right trade
    * when N·vnodes is large. Here the whole ring broadcasts (it is tiny)
    * and the successor is a broadcast cross product + one min aggregate:
    * `min(wrapFlag·2^61 + pos)` linearizes "smallest pos ≥ key, else
    * smallest pos overall" into one integer order, so Catalyst plans a
    * partial-aggregated hash agg, never a per-key sort.
    *
    * Returns one row per input row: the key columns plus `outCol` (the
    * shard at `n`) and `outCol + "_next"` (the shard at `n + 1`) — the
    * growth readout: insertion only reroutes keys the NEW shard's
    * vnodes capture (the ring movement theorem, spec-pinned), but load
    * balance is rougher than HRW at small `vnodes` (arc lengths vary;
    * that variance is the price of the cheaper lookup, and why real
    * rings run 100+ vnodes). */
  def ringGrowth(df: DataFrame, keyCol: String, n: Int,
                 vnodes: Int = 4, outCol: String = "shard"): DataFrame = {
    require(n >= 1 && n < 256 && vnodes >= 1 && n * vnodes <= 4096,
      s"ring out of range: n=$n vnodes=$vnodes")
    val spark = df.sparkSession
    val ring = spark.range((n + 1).toLong * vnodes).select(
      expr(s"id div $vnodes").as("__s"),
      Sampling.rawHash(concat(expr(s"id div $vnodes").cast("string"),
        lit(":"), (col("id") % vnodes).cast("string"))).as("__pos"))
    val ordv = shiftleft(
      when(col("__pos") >= col("__kpos"), lit(0L)).otherwise(lit(1L)), 61) +
      col("__pos")
    df.select(col(keyCol), Sampling.rawHash(col(keyCol)).as("__kpos"))
      .crossJoin(broadcast(ring))
      .groupBy(col(keyCol))
      .agg(
        min(when(col("__s") < n, struct(ordv.as("o"), col("__s"))))
          .getField("__s").as(outCol),
        min(struct(ordv.as("o"), col("__s")))
          .getField("__s").as(outCol + "_next"))
  }
}
