package graft.ops

import graft.{SparkSpec, Tables}

class CurateCliSpec extends SparkSpec {
  import spark.implicits._

  test("curation funnel: monotone retention, dedup applied, filters honored") {
    val docs = Tables.documents(spark, sf)
    val result = CurateCli.curate(docs, "doc_id", "text",
      CurateCli.Config(minQuality = 0.5, languages = Set("en")))
    val byStage = result.funnel.map(s => s.stage -> s).toMap
    assert(result.funnel.map(_.stage) ==
      Seq("input", "exact_dedup", "near_dedup", "language", "quality"))
    // retention is monotone non-increasing through the funnel
    val docCounts = result.funnel.map(_.docs)
    assert(docCounts.zip(docCounts.tail).forall { case (a, b) => b <= a },
      s"funnel must only shrink: $docCounts")
    assert(byStage("input").docs == docs.count())
    // the synthetic corpus has near-duplicate pairs (J >= 0.8) but no
    // byte-identical docs at this SF — near dedup must remove some
    assert(byStage("exact_dedup").docs <= byStage("input").docs)
    assert(byStage("near_dedup").docs < byStage("exact_dedup").docs)
    // the curated output matches the final stage count and honors filters
    assert(result.corpus.count() == byStage("quality").docs)
    val langs = result.corpus
      .select(graft.text.TextAnalysis.languageId($"text").as("l"))
      .distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en")), s"non-en docs leaked: $langs")
    val badQ = result.corpus.filter(
      graft.text.TextAnalysis.qualityScore($"text",
        graft.text.TextAnalysis.LangProfiles("en")) < 0.5)
    assert(badQ.count() == 0)
    assert(byStage("quality").tokens > 0)
  }
}
