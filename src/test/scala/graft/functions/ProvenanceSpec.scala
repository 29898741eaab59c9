package graft.functions

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** c6's provenance audit must AGREE with the pipeline it explains:
  * 'kept' is exactly c1's surviving set, every doc appears once, and
  * each drop reason is consistent with the shared scorers. */
class ProvenanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("'kept' ≡ c1's output; total partition covers every doc exactly once") {
    val prov = SparkEntry.queries("c6_provenance")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(prov.length.toLong == nDocs, "one provenance row per document")
    assert(prov.map(_._1).distinct.length == prov.length)
    val kept = prov.collect { case (id, "kept") => id }.toSet
    val c1 = SparkEntry.queries("c1_curation")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === c1, s"provenance 'kept' diverged from the pipeline: " +
      s"missing=${c1 -- kept} extra=${kept -- c1}")
    // every stage label is one of the pipeline's stages
    val stages = prov.map(_._2).toSet
    assert(stages.subsetOf(Set("lang", "quality", "duplicate", "sampled_out", "kept")), stages)
  }

  test("drop reasons are consistent with the shared scorers (spot rules)") {
    val prov = SparkEntry.queries("c6_provenance")(spark, dir)
    val scored = graft.Tables.documents(spark, dir).select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val joined = prov.join(scored, "doc_id").collect()
    joined.foreach { r =>
      val (stage, lang, quality) =
        (r.getString(1), r.getString(2), r.getDouble(3))
      if (stage == "lang") assert(lang != "en", r.toString)
      else {
        assert(lang == "en", r.toString)
        if (stage == "quality") assert(quality < 0.5, r.toString)
        else assert(quality >= 0.5, r.toString)
      }
    }
  }
}
