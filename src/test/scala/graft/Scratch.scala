package graft

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count()
    val targets = args.toSeq match {
      case Nil => Seq("c1_curation", "d7_dedup_clusters", "s1_cosine_topk",
        "d3_ngram_jaccard", "q1_agg", "d2_minhash_lsh")
      case xs => xs
    }
    sys.env.get("SCRATCH_CONF").foreach { kvs =>
      kvs.split(";").foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => sys.error(s"SCRATCH_CONF entry needs key=value, got: $kv")
        }
      }
    }
    if (sys.env.contains("SCRATCH_EXPLAIN")) {
      targets.foreach { name =>
        println(s"SCRATCH ===== $name =====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
      spark.stop(); return
    }
    if (sys.env.contains("SCRATCH_CGLOG")) {
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
        org.apache.logging.log4j.Level.DEBUG)
    }
    import org.apache.spark.metrics.source.CodegenMetrics
    targets.foreach { name =>
      val fn = SparkEntry.queries(name)
      val c0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      val t0ct = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val c1 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      val t1ct = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
      println(f"SCRATCH $name%-22s run1=${times(0)}%.3f run2=${times(1)}%.3f run3=${times(2)}%.3f " +
        f"compiles=${c1 - c0} compileMs=${t1ct - t0ct}")
    }
    spark.stop()
  }
}
