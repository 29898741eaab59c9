package graft.functions

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.SwapDir

/** Persistence for fitted models — the "fit once, score everywhere"
  * contract a 100 TB pipeline needs: the expensive fits (Lloyd k-means
  * centroids, the logistic gate's weights, BPE merge tables, IVF/PQ
  * codebooks) run on a schedule, and every scoring job LOADS the frozen
  * artifact instead of refitting on the data it is about to score (the
  * StreamCusum/StreamKlDrift frozen-baseline argument, applied batch-
  * side).
  *
  * Layout: `<path>/` holds the model rows as parquet plus a
  * `_model_kind` marker file naming what the rows are. Saves commit
  * through [[SwapDir]]'s rename swap, so a crash mid-save leaves the
  * previous model intact and a load never observes a half-written
  * table; loads VERIFY the kind so a scoring job cannot silently read
  * the wrong artifact class (centroids where weights were expected
  * score garbage without erroring — the marker turns that into a loud
  * failure).
  *
  * Driver-held weight vectors (the classifier's d+1 doubles) round-trip
  * through a (pos, value) table so the artifact stays engine-portable
  * parquet rather than JVM serialization. */
object ModelStore {

  private val KindFile = "_model_kind"

  /** Save a model TABLE (centroids, merges, codebooks …) atomically. */
  def save(model: DataFrame, path: String, kind: String): Unit = {
    require(kind.nonEmpty && !kind.exists(_.isControl), s"bad kind '$kind'")
    val spark = model.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    SwapDir.cleanStaleTmp(fs, path)
    val tmp = SwapDir.tmpPath(path)
    model.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val out = fs.create(new Path(tmp, KindFile), true)
    try out.write(kind.getBytes("UTF-8")) finally out.close()
    SwapDir.commit(fs, path, tmp)
  }

  /** Load a model table, verifying the stored kind. */
  def load(spark: SparkSession, path: String, kind: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = SwapDir.resolveCurrent(fs, path).getOrElse(
      throw new IllegalStateException(s"no model at $path"))
    val p = new Path(current, KindFile)
    val stored =
      if (!fs.exists(p)) ""
      else {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      }
    require(stored == kind,
      s"model at $path is '$stored', expected '$kind' — refusing to score " +
        "with the wrong artifact class")
    spark.read.parquet(current)
  }

  /** Save a driver-held weight vector as a (pos, value) table. */
  def saveWeights(spark: SparkSession, w: Array[Double], path: String,
                  kind: String): Unit = {
    import spark.implicits._
    save(w.toSeq.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("pos", "value"), path, kind)
  }

  /** Load a weight vector saved by [[saveWeights]], in pos order. */
  def loadWeights(spark: SparkSession, path: String, kind: String): Array[Double] =
    load(spark, path, kind)
      .orderBy(col("pos"))
      .collect().map(_.getDouble(1))
}
