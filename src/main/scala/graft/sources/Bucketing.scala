package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write-side bucketing — the co-located-join tool for keys that are
  * joined repeatedly at scale.
  *
  * A shuffle exchanges the fact table every time a join runs; bucketing
  * pays that exchange ONCE at write time: rows are hash-partitioned into
  * a fixed bucket count by the join key and each bucket lands in its own
  * file, so any later equi-join (or aggregation) on that key between
  * tables with compatible bucket counts plans with NO Exchange on either
  * side. At 100 TB this converts every recurring fact⋈fact join from a
  * full-corpus shuffle into a per-bucket merge — the biggest single
  * shuffle eliminator Spark offers for keys known in advance.
  *
  * `sortBy` additionally orders rows inside each bucket file, letting the
  * join skip its sort stage and giving tight row-group statistics.
  *
  * Bucketed layout is a table property, so the write goes through
  * `saveAsTable` (the catalog records bucket spec); reads via
  * `spark.table`. Plan behavior is asserted in `BucketedJoinSpec`.
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed (and optionally in-bucket
    * sorted) by `key` into `buckets` buckets. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortBy: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(buckets > 0, s"need buckets > 0, got $buckets")
    val w = df.write.mode(mode).format("parquet").bucketBy(buckets, key)
    val ws = if (sortBy.nonEmpty) w.sortBy(sortBy.head, sortBy.tail: _*) else w
    ws.saveAsTable(table)
  }
}
