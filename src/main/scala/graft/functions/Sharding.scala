package graft.functions

import org.apache.spark.sql.Column
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
}
