package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data skipping for a
  * write-once/scan-thousands corpus. Interleaving the bits of k bounded
  * dimension keys makes rows that are close in EVERY dimension close in
  * the one-dimensional sort order, so parquet row-group min/max stats
  * stay tight on ALL the interleaved dimensions at once — a range
  * predicate on any of them skips row groups, where a lexicographic
  * sort only serves its leading column. (Public technique: Morton 1966;
  * the layout trick behind Delta/Iceberg Z-ordering.)
  *
  * Everything here is plain integer bit arithmetic on the driver-declared
  * bit budget: engine-portable (the x38 oracle replays it in SQL),
  * codegen-friendly, zero shuffles to COMPUTE; the write pays the one
  * range-exchange any clustered layout pays. */
object ZOrder {

  /** Morton interleave of `dims` pre-bounded non-negative ints: bit j of
    * dimension i lands at position j·k + i. Callers bound each dimension
    * into [0, 2^bits) first (bucket, quantize, or mod — that choice is
    * the caller's skipping granularity). k·bits ≤ 62 keeps the key in a
    * signed long. */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    val k = dims.size
    require(k >= 1, "need at least one dimension")
    require(bits >= 1 && k * bits <= 62,
      s"k*bits must fit a signed long: got $k*$bits")
    val terms = for {
      (d, i) <- dims.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(d.cast("long"), j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_ + _)
  }

  /** Plain-Scala reference (spec cross-check). */
  def zValueRef(dims: Seq[Long], bits: Int): Long = {
    var z = 0L
    val k = dims.size
    for (i <- dims.indices; j <- 0 until bits)
      z |= ((dims(i) >> j) & 1L) << (j * k + i)
    z
  }

  /** Z-clustered parquet write: range-partition by the z-key (so file
    * boundaries follow the space-filling curve), sort within partitions,
    * drop the internal key column. One range exchange + in-partition
    * sort — never a global sort of data through one task. */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[Column],
                    bits: Int, files: Int): Unit = {
    require(files > 0, s"files must be positive, got $files")
    require(!df.columns.contains("__z"),
      "input already has a __z column — rename it; writeZOrdered uses it internally")
    df.withColumn("__z", zValue(dims, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }
}
