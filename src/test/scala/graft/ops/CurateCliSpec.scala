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

  test("streaming curation: dup dropped, junk filtered, good doc passes") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val in = Files.createTempDirectory("scurate").toString
    def row(id: Long, t: String, ts: String) =
      s"""{"doc_id":$id,"ts":"$ts","text":"$t"}"""
    val good = "the cat is in the house and it is a fine day for all of the cats"
    Files.writeString(java.nio.file.Paths.get(s"$in/b0.json"), Seq(
      row(1, good, "2024-01-01T10:00:00Z"),
      row(2, good, "2024-01-01T10:00:01Z"),            // exact dup → dropped
      row(3, "el gato es un animal que vive en la casa y es de la familia",
        "2024-01-01T10:00:02Z"),                        // not en → dropped
      row(4, "x!!! ??? ,,, ;;; :::", "2024-01-01T10:00:03Z") // junk → dropped
    ).mkString("\n"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("ts", TimestampType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).json(in)
    val q = CurateCli.curateStream(stream, "text", "ts",
      CurateCli.Config(minQuality = 0.5, languages = Set("en")))
      .writeStream.format("memory").queryName("scurate_out")
      .option("checkpointLocation", Files.createTempDirectory("sc-cp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val ids = spark.table("scurate_out").select("doc_id")
      .as[Long].collect().toSet
    assert(ids == Set(1L), s"only the first good en doc should land, got $ids")
  }
}
