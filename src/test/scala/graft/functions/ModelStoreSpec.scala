package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** [[ModelStore]]: fitted artifacts round-trip exactly, scoring with a
  * loaded model equals scoring with the fresh fit, kind verification is
  * loud, and a save overwrites atomically. */
class ModelStoreSpec extends SparkSpec {

  import spark.implicits._

  test("k-means centroids round-trip and assign identically after reload") {
    val vecs = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.1f, 0.1f)),
      (3L, Seq(5.0f, 5.0f)), (4L, Seq(5.1f, 4.9f))).toDF("vec_id", "embedding")
    val fitted = SimilarityOps.kmeansFit(vecs, "vec_id", "embedding",
      k = 2, iters = 5)
    val path = Files.createTempDirectory("graft_model_km").toString + "/centroids"
    ModelStore.save(fitted, path, kind = "kmeans-centroids")
    val loaded = ModelStore.load(spark, path, kind = "kmeans-centroids")
    assert(loaded.collect().toSet == fitted.collect().toSet)
  }

  test("classifier weights round-trip; frozen scoring equals the fresh fit") {
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f), 1), (2L, Seq(0.9f, 0.1f), 1),
      (3L, Seq(0.0f, 1.0f), 0), (4L, Seq(0.1f, 0.9f), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val w = Classifier.logisticFit(df, "embedding", col("label") === 1,
      iters = 20, lr = 0.5)
    val path = Files.createTempDirectory("graft_model_w").toString + "/weights"
    ModelStore.saveWeights(spark, w, path, kind = "logistic-weights")
    val w2 = ModelStore.loadWeights(spark, path, kind = "logistic-weights")
    assert(w2.toSeq == w.toSeq) // bit-exact doubles through parquet
    val fresh = Classifier.logisticScore(df, "vec_id", "embedding", w, 0.5)
      .collect().toSet
    val frozen = Classifier.logisticScore(df, "vec_id", "embedding", w2, 0.5)
      .collect().toSet
    assert(fresh == frozen)
  }

  test("kind mismatch and missing model fail loud; resave swaps atomically") {
    val path = Files.createTempDirectory("graft_model_k").toString + "/m"
    intercept[IllegalStateException](ModelStore.load(spark, path, "anything"))
    ModelStore.save(Seq((1, "a")).toDF("id", "v"), path, kind = "vocab")
    val e = intercept[IllegalArgumentException](
      ModelStore.load(spark, path, kind = "centroids"))
    assert(e.getMessage.contains("'vocab'"), e.getMessage)
    // resave with new content: the load sees exactly the new rows
    ModelStore.save(Seq((2, "b"), (3, "c")).toDF("id", "v"), path, kind = "vocab")
    assert(ModelStore.load(spark, path, "vocab").collect().length == 2)
  }
}
