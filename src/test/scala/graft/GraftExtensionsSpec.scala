package graft

/** The custom expression must be reachable from SQL text through the
  * registry, with the same results as the Column API. */
class GraftExtensionsSpec extends SparkSpec {

  test("dot_product_float is callable from SQL and matches the Column API") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      """SELECT vec_id, dot_product_float(embedding, embedding) AS d
        |FROM emb_sql""".stripMargin)
    val viaColumn = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        functions.SimilarityOps.dot(
          org.apache.spark.sql.functions.col("embedding"),
          org.apache.spark.sql.functions.col("embedding")).as("d"))
    assert(viaSql.exceptAll(viaColumn).count() == 0)
    assert(viaColumn.exceptAll(viaSql).count() == 0)
  }

  test("curation helpers are callable from SQL and match the Column API") {
    GraftExtensions.register(spark)
    Tables.documents(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_fingerprint(text) AS fp,
        |  graft_hash_bucket(doc_id, 10) AS b
        |FROM docs_sql""".stripMargin)
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions.col
    val viaColumn = d.select(col("doc_id"),
      functions.TextAnalysis.fingerprint(col("text")).as("fp"),
      functions.Sampling.hashBucket(col("doc_id"), 10).as("b"))
    assert(viaSql.exceptAll(viaColumn).count() == 0)
    assert(viaColumn.exceptAll(viaSql).count() == 0)
  }

  test("signature expressions are callable from SQL") {
    GraftExtensions.register(spark)
    Tables.documents(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("docs_sql2")
    val viaSql = spark.sql(
      """SELECT doc_id, ascii_word_tokens(text) AS toks,
        |  graft_simhash16(ascii_word_tokens(text)) AS sh,
        |  graft_minhash(ascii_word_tokens(text), 12) AS mh
        |FROM docs_sql2""".stripMargin)
    val row = viaSql.orderBy("doc_id").limit(1).collect()(0)
    assert(row.getSeq[String](1).nonEmpty)
    assert(row.getSeq[Long](3).length == 12)
    // same signatures as the Column API path
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val colSide = functions.DedupOps.simhash16(d, "doc_id", "text")
    val sqlSide = viaSql
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("toks")) > 0)
      .select("doc_id", "sh")
    assert(sqlSide.exceptAll(colSide).count() == 0)
  }

  test("deflate ratio is callable from SQL and matches the Column API") {
    GraftExtensions.register(spark)
    Tables.documents(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("docs_sql3")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_deflate_ratio(text) AS r FROM docs_sql3")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaCol = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.expressions.DeflateRatio.ratio(
          org.apache.spark.sql.functions.col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql === viaCol && viaSql.nonEmpty)
  }

  test("hrw_shard is callable from SQL and matches the Column API") {
    GraftExtensions.register(spark)
    Tables.documents(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("docs_hrw")
    val viaSql = spark.sql(
      "SELECT doc_id, hrw_shard(doc_id, 8) AS s FROM docs_hrw")
    import org.apache.spark.sql.functions.col
    val viaColumn = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), functions.Sharding.hrwShard(col("doc_id"), 8).as("s"))
    assert(viaSql.exceptAll(viaColumn).count() == 0)
    assert(viaColumn.exceptAll(viaSql).count() == 0)
    // non-literal shard count is rejected at the registration boundary
    val err = intercept[Exception] {
      spark.sql("SELECT hrw_shard(doc_id, doc_id) FROM docs_hrw").collect()
    }
    assert(err.getMessage.contains("hrw_shard") ||
      err.getCause != null && err.getCause.getMessage.contains("hrw_shard"))
  }

  test("SQL arity errors are caught at registration boundary") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT dot_product_float(array(1.0f))").collect()
    }
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("dot_product_float"))
  }
}
