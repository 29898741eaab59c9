package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's seven join forms (SURVEY.md §2.5), re-expressed as
  * Catalyst-plannable joins. Batch shapes here; streaming variants in
  * [[graft.streaming]].
  *
  * Scale notes baked into each helper:
  *  - dimension enrichment broadcasts the small side (no shuffle of the
  *    100 TB fact side);
  *  - band (interval) joins keep an equi-key so Spark plans a hash/sort-merge
  *    join with a residual range predicate, NOT a cartesian product;
  *  - FK joins are plain equi-joins — Catalyst + AQE pick broadcast vs
  *    sort-merge and handle skew.
  */
object Joins {

  /** Stream-table enrichment (reference KStream⋈KTable,
    * `TopologiesTest.scala:421-435`): each fact row joins the dimension's
    * current value for its key. `broadcastDim` forces the small-side
    * broadcast so the fact table never shuffles. */
  def enrich(facts: DataFrame, dim: DataFrame, joinExpr: Column,
             how: String = "inner", broadcastDim: Boolean = true): DataFrame =
    facts.join(if (broadcastDim) broadcast(dim) else dim, joinExpr, how)

  /** Windowed stream-stream join (reference KStream⋈KStream with
    * `JoinWindows.ofTimeDifference*`, `apps/WindowedJoin.scala:46-53`):
    * equi-join on key plus `tsR ∈ [tsL + lowerSec, tsL + upperSec]`.
    * The equality keeps this a shuffled hash/merge join; the band is a
    * cheap residual filter. */
  def bandJoin(left: DataFrame, right: DataFrame, keyEq: Column,
               tsL: Column, tsR: Column, lowerSec: Long, upperSec: Long,
               how: String = "inner"): DataFrame =
    left.join(right,
      keyEq && tsR >= tsL + lit(lowerSec) && tsR <= tsL + lit(upperSec), how)

  /** Primary-key table-table join (reference KTable⋈KTable,
    * `TopologiesTest.scala:437-452`): materialize both changelogs to their
    * latest rows first (see [[Changelog]]), then equi-join. */
  def tableJoin(leftLatest: DataFrame, rightLatest: DataFrame,
                joinExpr: Column, how: String = "inner"): DataFrame =
    leftLatest.join(rightLatest, joinExpr, how)

  /** Foreign-key table-table join (reference KTable FK join,
    * `apps/ForeignJoin.scala:37-42`): left rows carry a FK matched against
    * the right table's primary key. Relational semantics (one row per match,
    * null-extended for "left"), deliberately NOT reproducing the reference's
    * duplicate-tombstone emissions (SURVEY.md §2.5 bug catalog). */
  def fkJoin(left: DataFrame, right: DataFrame, fk: Column, pk: Column,
             how: String = "left_outer"): DataFrame =
    left.join(right, fk === pk, how)

  /** Point-in-interval (range) join with NO equi-key — the shape Spark
    * otherwise plans as a BroadcastNestedLoopJoin, i.e. every point
    * against every interval. Bucketization restores an equi-key: time is
    * cut into fixed `bucketSec` buckets, a point lands in exactly ONE
    * bucket, an interval is exploded to every bucket it overlaps, and
    * the bucket equi-join + residual `start ≤ p ≤ end` filter is exactly
    * the theta join — each matching pair meets once (in the point's
    * single bucket), so no post-join dedup is needed.
    *
    * 100 TB shape: per-bucket work is |points_b| · |intervals_b|,
    * bounded by temporal density instead of |points| · |intervals|; the
    * interval fan-out is len/bucketSec + 1 ≤ 2 once bucketSec ≥ the
    * longest interval (pick it so). Both sides shuffle once on the
    * bucket key and AQE's skew split covers hot instants. Rows with
    * `end < start` denote empty intervals and are dropped (BETWEEN over
    * them matches nothing). Columns are named (not Column objects) so
    * they resolve unambiguously on their own side; all three are
    * epoch-second longs. Integer `div` keeps bucket ids exact where a
    * double `floor(x / b)` would round past 2^53.
    *
    * The two sides must have DISJOINT column names (enforced): the
    * residual filter resolves `pointCol`/`startCol`/`endCol` across the
    * joined frame, so a shared name would be ambiguous — alias one side
    * before calling. The internal bucket column name is likewise
    * collision-checked. */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   pointCol: String, startCol: String, endCol: String,
                   bucketSec: Long): DataFrame = {
    require(bucketSec > 0, s"bucketSec must be positive, got $bucketSec")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"intervalJoin needs disjoint column names between points and " +
        s"intervals (residual filter would be ambiguous); shared: " +
        s"${shared.mkString(", ")} — alias one side first")
    require(!points.columns.contains("__graft_bkt") &&
        !intervals.columns.contains("__graft_bkt"),
      "column __graft_bkt is reserved by intervalJoin")
    val pb = points.withColumn("__graft_bkt", expr(s"$pointCol div $bucketSec"))
    val ib = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__graft_bkt",
        explode(sequence(expr(s"$startCol div $bucketSec"),
          expr(s"$endCol div $bucketSec"))))
    pb.join(ib, "__graft_bkt")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__graft_bkt")
  }

  /** Hand-salted equi-join for KNOWN hot keys — the skew pattern AQE's
    * runtime skew split handles per shuffle block, expressed as an
    * explicit operator for when the skew is structural and known up
    * front (a celebrity entity, a default/placeholder key) and the
    * small side is replicable but too large to broadcast whole (the
    * fragment-replicate middle ground). The big side scatters each row
    * into one of `buckets` sub-keys by a DETERMINISTIC row-dependent
    * hash (never rand(): task retries and replays must land each row in
    * the same bucket); the small side replicates every row across ALL
    * `buckets` sub-keys via a literal-sequence explode. The join
    * shuffle then spreads a hot key's rows over `buckets` reducers
    * instead of one, at the cost of small-side × buckets shuffle
    * volume — size `buckets` to the hot key's imbalance, not the
    * cluster. Result is EXACTLY the unsalted equi-join (each big row
    * meets each small match once, in its single salt bucket); the j21
    * oracle is the plain SQL join.
    *
    * Sides must have disjoint column names (same contract as
    * [[intervalJoin]]); the salt columns are collision-checked. */
  def salted(big: DataFrame, small: DataFrame, bigKey: String,
             smallKey: String, saltFrom: Seq[Column], buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(saltFrom.nonEmpty, "salted join needs at least one salt-source column")
    val shared = big.columns.toSet.intersect(small.columns.toSet)
    require(shared.isEmpty,
      s"salted join needs disjoint column names; shared: " +
        s"${shared.mkString(", ")} — alias one side first")
    require(!big.columns.contains("__graft_salt") &&
        !small.columns.contains("__graft_salt_r"),
      "columns __graft_salt/__graft_salt_r are reserved by salted")
    val b = big.withColumn("__graft_salt",
      pmod(hash(saltFrom: _*), lit(buckets)))
    val sm = small.withColumn("__graft_salt_r",
      explode(array((0 until buckets).map(lit): _*)))
    b.join(sm, col(bigKey) === col(smallKey) &&
        col("__graft_salt") === col("__graft_salt_r"))
      .drop("__graft_salt", "__graft_salt_r")
  }

  /** EXISTS — rows of `left` having a match. Spark's left-semi never
    * duplicates or widens rows, and the right side is reduced before the
    * probe. */
  def semi(left: DataFrame, right: DataFrame, joinExpr: Column): DataFrame =
    left.join(right, joinExpr, "left_semi")

  /** NOT EXISTS. */
  def anti(left: DataFrame, right: DataFrame, joinExpr: Column): DataFrame =
    left.join(right, joinExpr, "left_anti")
}
