package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Layout-aware parquet writer for curated datasets — the output half of
  * a training-data pipeline. A 100 TB corpus is written once and scanned
  * thousands of times, so the layout IS the performance contract for
  * every downstream reader:
  *
  *  - `partitionBy` directories give readers partition pruning on the
  *    coarse key (language, source, date);
  *  - a bounded number of files per directory (`filesPerDir`), assigned
  *    by hash of the sort key, prevents both the tiny-file explosion
  *    (one file per task per directory) and single-file serialization;
  *  - rows are sorted WITHIN each file by `sortCols`, so parquet
  *    row-group min/max stats are tight and predicate pushdown on the
  *    sort key skips whole row groups.
  *
  * Shuffle audit: exactly one exchange (on partition dirs + file index);
  * the sort is within-partition, never global. */
object CuratedWriter {

  def write(df: DataFrame, path: String, partitionCols: Seq[String],
            sortCols: Seq[Column], filesPerDir: Int): Unit = {
    require(filesPerDir > 0, s"filesPerDir must be positive, got $filesPerDir")
    require(sortCols.nonEmpty, "sortCols must be non-empty (they drive file assignment)")
    require(!df.columns.contains("__file"),
      "input already has a __file column — rename it; write() uses that name internally")
    val dirs = partitionCols.map(col)
    df.withColumn("__file", pmod(hash(sortCols: _*), lit(filesPerDir)))
      .repartition(dirs :+ col("__file"): _*)
      .sortWithinPartitions(dirs ++ sortCols: _*)
      .drop("__file") // projection: preserves both partitioning and order
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
