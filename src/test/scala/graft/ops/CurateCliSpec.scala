package graft.ops

import graft.{SparkSpec, Tables}
import graft.text.TextAnalysis
import org.apache.spark.sql.functions.col

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
    result.unpersist() // release the corpus cache (shared test session)
  }

  test("funnel with maxShingleDf engages the exact DF-cut near-dedup path") {
    // every doc shares a boilerplate 3-gram; the true near-dup pair's
    // OTHER shared shingles have DF=2. With cap=1 the exact path cuts
    // every DF>=2 shingle, so NOTHING collapses (12 survivors) — while
    // the sketch path at threshold 0.01 would collapse the dup pair and
    // boilerplate docs alike. A dead knob fails this loudly.
    val boiler = (0 until 10).map(i =>
      ((100 + i).toLong, s"click here now unique$i text$i body$i words$i"))
    val dups = Seq((1L, "click here now alpha beta gamma delta epsilon zeta"),
      (2L, "click here now alpha beta gamma delta epsilon eta"))
    val corpus = (boiler ++ dups).toDF("doc_id", "text")
    val cut = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, jaccardThreshold = 0.01,
        maxShingleDf = 1L))
    assert(cut.funnel.find(_.stage == "near_dedup").get.docs == 12,
      s"cap=1 cuts every shared shingle -> no collapses; got ${cut.funnel}")
    cut.unpersist()
    val sketch = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, jaccardThreshold = 0.01))
    assert(sketch.funnel.find(_.stage == "near_dedup").get.docs < 12,
      "sketch path at threshold 0.01 must collapse the near-dup pair")
    sketch.unpersist()
  }

  test("extended funnel: pii_scrub, repetition, decontaminate, pack stages") {
    // hand-built corpus where each extended stage has exactly one victim:
    // doc 2 carries PII (scrubbed, not dropped), doc 3 is degenerate
    // repetition spam, doc 4 overlaps the eval set on an 8-token window
    val good1 = "the cat sat on the mat and watched the birds in the garden all day long"
    val good2 = "contact me at alice@example.org about the house by the sea we all like"
    // "the" keeps the spam doc classified en (zero-hit docs tie → "de")
    val spam = "the spam " * 20 + "the spam"
    val leaked = "the hidden answer to the secret benchmark question is forty two exactly"
    val corpus = Seq(
      (1L, good1), (2L, good2), (3L, spam), (4L, leaked + " plus trailing words")
    ).toDF("doc_id", "text")
    val eval_ = Seq((900L, leaked)).toDF("doc_id", "text")
    val result = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, piiScrub = true,
        maxRepetitionRatio = 0.5, packBudget = 16, packBuckets = 2),
      evalDocs = Some(eval_))
    assert(result.funnel.map(_.stage) ==
      Seq("input", "exact_dedup", "near_dedup", "language", "quality",
        "pii_scrub", "repetition", "decontaminate", "pack"))
    val byStage = result.funnel.map(s => s.stage -> s).toMap
    // pii scrub rewrites text, drops nothing
    assert(byStage("pii_scrub").docs == byStage("quality").docs)
    // repetition filter drops exactly the spam doc; decontaminate the leak
    assert(byStage("repetition").docs == byStage("pii_scrub").docs - 1)
    assert(byStage("decontaminate").docs == byStage("repetition").docs - 1)
    val ids = result.corpus.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L), s"survivors must be the two good docs, got $ids")
    // the surviving corpus carries SCRUBBED text
    val texts = result.corpus.select("text").as[String].collect().mkString(" ")
    assert(!texts.contains("alice@example.org") && texts.contains("<EMAIL>"),
      s"pii must be redacted in the output corpus: $texts")
    // pack sidecar: one row per surviving doc, token totals consistent
    // with the decontaminate stage count (same tokenCount both sides)
    val packed = result.packed.get
    assert(packed.count() == byStage("decontaminate").docs)
    assert(byStage("pack").docs == byStage("decontaminate").docs)
    assert(byStage("pack").tokens == byStage("decontaminate").tokens)
    assert(packed.columns.toSeq ==
      Seq("doc_id", "bucket", "seq_id", "start_offset", "n_tokens"))
    result.unpersist()
  }

  test("gopher stage drops rule violators, keeps compliant docs") {
    // doc 1: >= 50 tokens, sane mean token length, stopwords — passes
    // the whole battery. doc 2: clean English but far under the 50-token
    // floor (word_count_ok fails). doc 3: long enough but #-ridden
    // (symbol_ok fails). Both victims pass language + quality at
    // minQuality=0, so only the gopher stage can be the thing dropping
    // them — a dead stage fails this loudly.
    val sentence = "the cat sat near the mat and the dog ran over the hill while "
    val compliant = sentence * 5 // 70 tokens
    val short_ = "the cat sat on the mat today and the dog was here"
    val symbols = sentence * 5 + "## ## ## ## ## ## ## ## ## ## ## ## ## ##"
    val corpus = Seq((1L, compliant), (2L, short_), (3L, symbols))
      .toDF("doc_id", "text")
    val r = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, gopherRules = true))
    assert(r.funnel.map(_.stage) ==
      Seq("input", "exact_dedup", "near_dedup", "language", "quality",
        "gopher"))
    val ids = r.corpus.select("doc_id").as[Long].collect().toSet
    r.unpersist()
    assert(ids == Set(1L), s"gopher battery must keep only doc 1, got $ids")
  }

  test("perplexity stage drops the improbable-bigram doc, keeps fluent text") {
    // doc 1 repeats its own bigrams 10x (every bigram is corpus-common
    // -> low cross-entropy); doc 2 is a run of once-seen bigrams (every
    // c12 = c1 = 1 -> NLL per bigram ~ ln(1+V) - ln 2, far above doc
    // 1's). A threshold between the two separates them; both pass
    // language + quality at minQuality=0 with the open language set, so
    // only the perplexity gate can drop doc 2.
    val corpus = Seq(
      (1L, "the cat sat on the mat and " * 10),
      (2L, "zebra quark nimbus oracle vortex plasma glyph ember"))
      .toDF("doc_id", "text")
    val open = Set("en", "de", "fr", "es", "zh", "ja", "unknown")
    val r = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, languages = open,
        maxBigramXentMicro = 1500000L))
    assert(r.funnel.map(_.stage).last == "perplexity")
    val ids = r.corpus.select("doc_id").as[Long].collect().toSet
    r.unpersist()
    assert(ids == Set(1L), s"perplexity gate must keep only doc 1, got $ids")
  }

  test("perplexity gate keeps bigram-less docs (no evidence, no drop)") {
    val corpus = Seq(
      (1L, "the cat sat on the mat and " * 10),
      (2L, "single-token"))
      .toDF("doc_id", "text")
    val open = Set("en", "de", "fr", "es", "zh", "ja", "unknown")
    val r = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, languages = open,
        maxBigramXentMicro = 1L)) // drop ANY doc with bigram evidence > 0
    val ids = r.corpus.select("doc_id").as[Long].collect().toSet
    r.unpersist()
    assert(ids == Set(2L),
      s"doc without bigrams must survive the harshest gate, got $ids")
  }

  test("perplexity stage runs between gopher and line_dedup") {
    val sentence = "the cat sat near the mat and the dog ran over the hill while "
    val corpus = Seq((1L, sentence * 5), (2L, sentence * 6))
      .toDF("doc_id", "text")
    val r = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, jaccardThreshold = 0.999,
        gopherRules = true, maxBigramXentMicro = 99000000L,
        lineDedupMinDf = 2))
    assert(r.funnel.map(_.stage).containsSlice(
      Seq("gopher", "perplexity", "line_dedup")),
      s"perplexity must sit between gopher and line_dedup: ${r.funnel.map(_.stage)}")
    r.unpersist()
  }

  test("gopher stage runs between repetition and span_excise") {
    val sentence = "the cat sat near the mat and the dog ran over the hill while "
    val corpus = Seq((1L, sentence * 5), (2L, sentence * 6))
      .toDF("doc_id", "text")
    val r = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, jaccardThreshold = 0.999,
        maxRepetitionRatio = 0.999, gopherRules = true, exciseSpanK = 0))
    assert(r.funnel.map(_.stage).containsSlice(Seq("repetition", "gopher")),
      s"gopher must follow repetition: ${r.funnel.map(_.stage)}")
    r.unpersist()
  }

  test("nearKeepBest keeps the higher-quality near-dup, default keeps min id") {
    // doc 2 = doc 1 + one token: J = 5/6 ≥ 0.8, and the extra token
    // makes doc 2 the higher-quality member (+4000 ppm length credit,
    // no stopwords on either side)
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    def survivors(cfg: CurateCli.Config): Set[Long] = {
      val r = CurateCli.curate(corpus, "doc_id", "text", cfg)
      val ids = r.corpus.select("doc_id").as[Long].collect().toSet
      r.unpersist()
      ids
    }
    val open = CurateCli.Config(minQuality = 0.0,
      languages = Set("en", "de", "es", "fr", "zh", "unknown"))
    assert(survivors(open) == Set(1L), "min-id survivorship keeps doc 1")
    assert(survivors(open.copy(nearKeepBest = true)) == Set(2L),
      "best-quality survivorship keeps the longer copy")
  }

  test("span_excise stage cuts shared passages, keeps docs (tokens drop, docs don't)") {
    // two docs share a 10-token boilerplate stretch at different offsets;
    // shared k=3 shingle fraction stays far below the 0.8 near-dup
    // threshold, so both survive whole-doc dedup and meet span excision
    val boiler = "one two three the cat and the dog walked home"
    val corpus = Seq(
      (1L, boiler + " while the weather stayed warm and the garden was quiet"),
      (2L, "the report was finished early in the morning " + boiler)
    ).toDF("doc_id", "text")
    val result = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, exciseSpanK = 4))
    assert(result.funnel.map(_.stage) ==
      Seq("input", "exact_dedup", "near_dedup", "language", "quality",
        "span_excise"))
    val byStage = result.funnel.map(s => s.stage -> s).toMap
    // excision drops TOKENS, never documents
    assert(byStage("span_excise").docs == byStage("quality").docs)
    assert(byStage("span_excise").tokens == byStage("quality").tokens - 20,
      s"each doc must lose exactly its 10 boilerplate tokens: ${result.funnel}")
    val texts = result.corpus.select("text").as[String].collect()
    assert(texts.forall(!_.contains("cat")), s"boilerplate must be excised: ${texts.toSeq}")
    assert(texts.exists(_.contains("garden")) && texts.exists(_.contains("report")),
      s"unique content must survive: ${texts.toSeq}")
    result.unpersist()
  }

  test("line_dedup stage cuts cross-doc boilerplate lines, keeps docs") {
    // three docs share a footer LINE; each keeps its unique body line.
    // The shared line is short relative to each doc, so whole-doc and
    // near dedup both pass everything through — only line dedup can be
    // the thing cutting it. minDf=3 would also pass; 2 is the default.
    val footer = "copyright the example site all rights reserved"
    val corpus = Seq(
      (1L, "the cat sat near the mat and the dog ran over the hill\n" + footer),
      (2L, "a completely different story about the weather in the hills\n" + footer),
      (3L, "the report was finished early in the morning by the team\n" + footer)
    ).toDF("doc_id", "text")
    val r = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, lineDedupMinDf = 2))
    assert(r.funnel.map(_.stage) ==
      Seq("input", "exact_dedup", "near_dedup", "language", "quality",
        "line_dedup"))
    val byStage = r.funnel.map(s => s.stage -> s).toMap
    // a rewrite stage: docs constant, each doc loses its 7 footer tokens
    assert(byStage("line_dedup").docs == byStage("quality").docs)
    assert(byStage("line_dedup").tokens == byStage("quality").tokens - 21,
      s"each doc must lose exactly the footer tokens: ${r.funnel}")
    val texts = r.corpus.select("text").as[String].collect()
    r.unpersist()
    assert(texts.forall(!_.contains("copyright")),
      s"footer line must be gone: ${texts.toSeq}")
    assert(texts.exists(_.contains("weather")) &&
      texts.exists(_.contains("report")),
      s"unique body lines must survive: ${texts.toSeq}")
  }

  test("extended funnel honors decontaminateMinHits (n-of-k evidence)") {
    // doc 5 shares exactly ONE 8-gram with eval; minHits=2 keeps it
    val window = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      // en stopwords after the window keep langid = en without adding
      // any second eval-matching 8-gram
      (5L, window + " is the only one window in it today"),
      (6L, "a completely clean document about the weather in the hills")
    ).toDF("doc_id", "text")
    val eval_ = Seq((901L, window + " iota kappa")).toDF("doc_id", "text")
    def survivors(minHits: Int) = {
      val r = CurateCli.curate(corpus, "doc_id", "text",
        CurateCli.Config(minQuality = 0.0, decontaminateMinHits = minHits),
        evalDocs = Some(eval_))
      val ids = r.corpus.select("doc_id").as[Long].collect().toSet
      r.unpersist(); ids
    }
    assert(survivors(1) == Set(6L))
    assert(survivors(2) == Set(5L, 6L))
  }

  test("mix and token_budget funnel stages: stratum dropped, budget prefix kept") {
    val corpus = Seq(
      (1L, "the cat sat on the mat and it was a fine day for all of us", "wiki"),
      (2L, "a dog ran in the park and the sun was out for the whole of it", "wiki"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank", "wiki"),
      (4L, "it is a spammy page full of the usual words about the weather", "web")
    ).toDF("doc_id", "text", "source")
    val cfg = CurateCli.Config(minQuality = 0.0,
      mixRatesPpm = Map("web" -> 0L), mixDefaultPpm = 1000000L,
      budgetTokens = 30L)
    val r = CurateCli.curate(corpus, "doc_id", "text", cfg)
    assert(r.funnel.map(_.stage) ==
      Seq("input", "exact_dedup", "near_dedup", "language", "quality",
        "mix", "token_budget"))
    val byStage = r.funnel.map(s => s.stage -> s).toMap
    assert(byStage("mix").docs == 3, "the web stratum must drop at rate 0")
    // expected budget prefix computed from the operator's own scoring,
    // in (quality desc, id) order over the mix survivors
    val scored = Seq(1L, 2L, 3L).map { id =>
      val row = corpus.filter(col("doc_id") === id)
        .select(
          TextAnalysis.qualityScore(col("text"),
            TextAnalysis.LangProfiles("en")).as("q"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("t"))
        .head()
      (id, row.getDouble(0), row.getLong(1))
    }.sortBy { case (id, q, _) => (-q, id) }(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    val expected = scored.scanLeft((0L, 0L)) { case ((_, cum), (id, _, t)) =>
      (id, cum + t)
    }.drop(1).takeWhile(_._2 <= 30L).map(_._1).toSet
    assert(expected.nonEmpty && expected.size < 3,
      s"test corpus must make the budget bind: $scored")
    val ids = r.corpus.select("doc_id").as[Long].collect().toSet
    r.unpersist()
    assert(ids == expected, s"budget prefix mismatch: got $ids want $expected")
  }

  test("domain_cap stage: each stratum keeps only its k best by quality") {
    val corpus = Seq(
      (1L, "the cat sat on the mat and it was a fine day for all of us", "wiki"),
      (2L, "a dog ran in the park and the sun was out for the whole of it", "wiki"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank", "wiki"),
      (4L, "it is a spammy page full of the usual words about the weather", "web")
    ).toDF("doc_id", "text", "source")
    val r = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, domainCapK = 2))
    assert(r.funnel.map(_.stage) ==
      Seq("input", "exact_dedup", "near_dedup", "language", "quality",
        "domain_cap"))
    val byStage = r.funnel.map(s => s.stage -> s).toMap
    assert(byStage("domain_cap").docs == 3,
      "wiki must drop from 3 to 2; web keeps its single doc")
    // the survivor set is the capPerStratum top-2 of wiki plus doc 4
    val want = TextAnalysis.capPerStratum(
      corpus.filter(col("source") === "wiki"), "doc_id", "text", "source", 2)
      .select("doc_id").as[Long].collect().toSet + 4L
    val ids = r.corpus.select("doc_id").as[Long].collect().toSet
    r.unpersist()
    assert(ids == want)
  }

  test("decontaminate stage scrubs the eval side when piiScrub is on") {
    // the eval doc's every 8-gram window spans the email token; if the
    // eval side were shingled RAW while the corpus copy is scrubbed,
    // zero shingles would match and the leak would survive curation
    val leaked = "contact bob@x.com about the secret answer key for it"
    val corpus = Seq(
      (1L, leaked + " and the rest of the document is here"),
      (2L, "a clean document about the weather in the hills today now")
    ).toDF("doc_id", "text")
    val eval_ = Seq((902L, leaked)).toDF("doc_id", "text")
    val r = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, piiScrub = true),
      evalDocs = Some(eval_))
    val ids = r.corpus.select("doc_id").as[Long].collect().toSet
    r.unpersist()
    assert(ids == Set(2L),
      s"the eval-overlapping doc must drop despite scrubbing, got $ids")
  }

  test("datasheetJson: per-stage drops, rewrite/sidecar stages charge zero") {
    val funnel = Seq(
      CurateCli.StageCount("input", 10, 1000),
      CurateCli.StageCount("exact_dedup", 8, 800),
      CurateCli.StageCount("pii_scrub", 8, 800),
      CurateCli.StageCount("decontaminate", 6, 600),
      CurateCli.StageCount("pack", 6, 600))
    val js = CurateCli.datasheetJson(funnel)
    // shape must be machine-parseable JSON with the documented keys
    assert(js.startsWith("""{"funnel":[""") &&
      js.endsWith(""""final_docs":6,"final_tokens":600}"""), js)
    assert(js.contains(
      """{"stage":"exact_dedup","docs":8,"tokens":800,"dropped_docs":2}"""))
    assert(js.contains(
      """{"stage":"pii_scrub","docs":8,"tokens":800,"dropped_docs":0}"""))
    assert(js.contains(
      """{"stage":"decontaminate","docs":6,"tokens":600,"dropped_docs":2}"""))
    assert(js.contains(
      """{"stage":"pack","docs":6,"tokens":600,"dropped_docs":0}"""))
    // total charged drops reconcile with input minus final
    val dropped = """"dropped_docs":(\d+)""".r
      .findAllMatchIn(js).map(_.group(1).toLong).sum
    assert(dropped == 10L - 6L)
  }

  test("randomized configs: funnel invariants hold under stage interactions") {
    // seeded sweep over random Config combinations — the hand-written
    // cases each exercise one stage; this pins the INTERACTIONS (e.g.
    // mix+budget+keepBest+excision all on). Invariants checked per run:
    //   1. doc counts are monotone non-increasing through the datasheet
    //   2. the curated corpus ids are a subset of the input ids
    //   3. the final datasheet row equals the corpus actually returned
    //   4. every enabled stage appears exactly once, in funnel order
    val docs = Tables.documents(spark, sf).limit(200).cache()
    val inputIds = docs.select("doc_id").as[Long].collect().toSet
    val rnd = new scala.util.Random(11)
    val order = Seq("input", "exact_dedup", "near_dedup", "language",
      "quality", "mix", "domain_cap", "pii_scrub", "repetition", "gopher",
      "line_dedup", "span_excise", "decontaminate", "token_budget", "pack")
    for (i <- 1 to 8) {
      val cfg = CurateCli.Config(
        minQuality = rnd.nextInt(3) * 0.25,
        languages = Set("en", "de", "es", "fr", "zh", "unknown"),
        maxShingleDf = if (rnd.nextBoolean()) 50L else 0L,
        nearKeepBest = rnd.nextBoolean(),
        mixDefaultPpm = if (rnd.nextBoolean()) 800000L else 1000000L,
        domainCapK = if (rnd.nextBoolean()) 30 else 0,
        piiScrub = rnd.nextBoolean(),
        maxRepetitionRatio = if (rnd.nextBoolean()) 0.9 else 1.0,
        gopherRules = rnd.nextBoolean(),
        lineDedupMinDf = if (rnd.nextBoolean()) 2 else 0,
        exciseSpanK = if (rnd.nextBoolean()) 8 else 0,
        budgetTokens = if (rnd.nextBoolean()) 5000L else 0L,
        packBudget = if (rnd.nextBoolean()) 128 else 0,
        packBuckets = 4)
      val evalDocs =
        if (rnd.nextBoolean()) Some(docs.filter($"doc_id" % 13 === 0))
        else None
      val r = CurateCli.curate(docs, "doc_id", "text", cfg, evalDocs)
      val stages = r.funnel.map(_.stage)
      assert(stages == order.filter(stages.contains),
        s"cfg#$i: stages out of order: $stages")
      assert(stages.distinct == stages, s"cfg#$i: duplicate stage: $stages")
      val counts = r.funnel.map(_.docs)
      assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
        s"cfg#$i ($cfg): docs must be monotone non-increasing: " +
          s"${stages.zip(counts)}")
      val outIds = r.corpus.select("doc_id").as[Long].collect().toSet
      assert(outIds.subsetOf(inputIds), s"cfg#$i: corpus invented ids")
      // 'pack' re-counts the packed sidecar; the corpus row count is the
      // last non-pack stage
      val lastCorpusRow = r.funnel.reverse.find(_.stage != "pack").get
      assert(outIds.size == lastCorpusRow.docs,
        s"cfg#$i: datasheet (${lastCorpusRow.docs}) vs corpus (${outIds.size})")
      r.unpersist()
    }
    docs.unpersist()
  }

  test("funnel evaluates each stage's lineage once (no O(stages²) recompute)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val n = 200
    val rows = (1 to n).map(i =>
      Row(i.toLong, s"the cat number $i sat on the mat and it was a fine " +
        s"sunny day for all of the cats in the house number $i"))
    val acc = spark.sparkContext.longAccumulator("docScans")
    val rdd = spark.sparkContext.parallelize(rows, 4).map { r => acc.add(1); r }
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val docs = spark.createDataFrame(rdd, schema)
    val result = CurateCli.curate(docs, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, languages = Set("en")))
    assert(result.corpus.count() == result.funnel.last.docs)
    result.unpersist()
    // With stage persists: input count = 1 pass over docs; exact-dedup
    // materialization = 2 more (groupBy build + semi-join probe). Every
    // later stage/count reads a stage cache, never the input lineage.
    // The pre-fix funnel re-derived the input at EVERY stage count
    // (>= 10 passes) — 4n is a discriminating bound with headroom.
    assert(acc.value <= 4L * n,
      s"input lineage scanned ${acc.value.toDouble / n}x; expected <= 4x")
  }

  test("rewrite stages cut lineage: corpus plan size is bounded, not doubled per stage") {
    // line_dedup / span_excise / decontaminate each join the corpus back
    // against a derivative of itself — with bare persists the logical
    // plan DOUBLES at every such stage (persist caches rows, not the
    // tree) and driver-side planning grows geometrically. With the
    // checkpoint discipline every stage's plan is a LogicalRDD leaf, so
    // the returned corpus plan must be constant-size REGARDLESS of how
    // many join-back stages ran. A regression to persist fails loudly:
    // the 3-join-back plan is >8x the baseline's node count.
    val footer = "copyright the example site all rights reserved"
    val corpus = (1 to 20).map(i =>
      (i.toLong, s"the cat number $i sat on the mat and watched bird " +
        s"number $i in the garden\n" + footer)).toDF("doc_id", "text")
    val eval_ = Seq((900L, "the hidden answer to the secret benchmark " +
      "question is forty two exactly")).toDF("doc_id", "text")
    def planNodes(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case p => p }.size
    val base = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0))
    val rewrites = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, lineDedupMinDf = 2,
        exciseSpanK = 8), evalDocs = Some(eval_))
    val (nBase, nRewrites) = (planNodes(base.corpus), planNodes(rewrites.corpus))
    base.unpersist(); rewrites.unpersist()
    assert(nBase <= 3, s"baseline corpus plan must be a checkpoint leaf: $nBase")
    assert(nRewrites <= nBase + 2,
      s"3 join-back stages must not grow the plan: base=$nBase rewrites=$nRewrites")
  }

  test("streaming curation: near-dup in a later micro-batch is flagged at ingest") {
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    val in = Files.createTempDirectory("sccand").toString
    def row(id: Long, t: String, ts: String) =
      s"""{"doc_id":$id,"ts":"$ts","text":"$t"}"""
    val base = "the quick brown fox jumps over the lazy dog and then naps in the warm sun all afternoon"
    val near = "the quick brown fox jumps over the lazy dog and then naps in the warm sun all evening"
    // batch 1: original + junk that the quality gate must stop before it
    // ever reaches near-dup state; batch 2: near-dup + exact dup (exact
    // dedup drops it upstream → no candidate) + unrelated doc
    val b0 = java.nio.file.Paths.get(s"$in/b0.json")
    val b1 = java.nio.file.Paths.get(s"$in/b1.json")
    Files.writeString(b0, Seq(
      row(1, base, "2024-01-01T10:00:00Z"),
      row(2, "x!!! ??? ,,, ;;; :::", "2024-01-01T10:00:01Z")
    ).mkString("\n"))
    Files.writeString(b1, Seq(
      row(3, near, "2024-01-01T10:00:02Z"),
      row(4, base, "2024-01-01T10:00:03Z"),
      row(5, "a completely different story about columnar query engines today",
        "2024-01-01T10:00:04Z")
    ).mkString("\n"))
    // the file source orders micro-batches by modification time — pin
    // mtimes so b0 is deterministically the first batch
    val now = System.currentTimeMillis()
    Files.setLastModifiedTime(b0, java.nio.file.attribute.FileTime.fromMillis(now - 60000))
    Files.setLastModifiedTime(b1, java.nio.file.attribute.FileTime.fromMillis(now))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("ts", TimestampType), StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
    val q = CurateCli.curateStreamCandidates(stream, "doc_id", "text", "ts",
      CurateCli.Config(minQuality = 0.4, languages = Set("en"),
        jaccardThreshold = 0.5, shingleK = 2))
      .writeStream.format("memory").queryName("sccand_out")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sccand-cp").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val pairs = spark.table("sccand_out").select("doc_id", "dup_of")
      .distinct().as[(String, String)].collect().toSet
    // only the cross-batch near-dup pair, normalized; the exact dup was
    // dropped before the near-dup stage, junk never entered state
    assert(pairs == Set(("3", "1")),
      s"expected exactly the flagged near-dup pair (3,1), got $pairs")
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

  test("containment_dedup stage drops the excerpt, keeps container and unrelated") {
    val big = "the cat sat on the mat while the dog ran in the garden and " +
      "the bird sang near the tree as the sun rose over the hill and the " +
      "children played by the river with their friends all day long"
    // a contiguous 13-word window of `big`: containment 1.0 but Jaccard
    // far below 0.8, so near-dedup (which runs first) keeps it
    val excerpt = "the bird sang near the tree as the sun rose over the hill"
    val other = "completely different text about ships and oceans with " +
      "many waves crashing on the shore during the storm at night"
    val docs = Seq((1L, big), (2L, excerpt), (3L, other))
      .toDF("doc_id", "text")
    val result = CurateCli.curate(docs, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, containmentThreshold = 0.9))
    assert(result.funnel.map(_.stage).contains("containment_dedup"))
    val kept = result.corpus.select("doc_id").as[Long].collect().toSet
    result.unpersist()
    assert(kept == Set(1L, 3L), s"excerpt must drop, got $kept")
  }

  test("min_novelty stage drops the shingle-recombination doc, keeps originals") {
    val a = "the cat sat on the mat while the dog ran in the garden and " +
      "the bird sang near the tall green tree all through the day"
    val b = "many ships crossed the wide blue ocean as the waves crashed " +
      "over the rocks near the shore during the long winter storm"
    // doc 3 splices halves of docs 1 and 2: almost every shingle first
    // appeared in an earlier doc (only the seam shingles are novel), yet
    // it is no near-dup of either — the signal pair-wise dedup misses
    val splice = "the cat sat on the mat while the dog ran in the garden " +
      "over the rocks near the shore during the long winter storm"
    val docs = Seq((1L, a), (2L, b), (3L, splice)).toDF("doc_id", "text")
    val result = CurateCli.curate(docs, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, minNovelty = 0.3))
    assert(result.funnel.map(_.stage).contains("min_novelty"))
    val kept = result.corpus.select("doc_id").as[Long].collect().toSet
    result.unpersist()
    assert(kept == Set(1L, 2L), s"low-novelty splice must drop, got $kept")
  }

  test("containment/novelty stages keep the corpus plan lineage-cut") {
    val corpus = (1 to 20).map(i =>
      (i.toLong, s"the cat number $i sat on the mat and watched bird " +
        s"number $i in the garden by the house")).toDF("doc_id", "text")
    val result = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, containmentThreshold = 0.8,
        minNovelty = 0.01))
    val nodes = result.corpus.queryExecution.optimizedPlan
      .collect { case p => p }.size
    result.unpersist()
    assert(nodes <= 3, s"corpus plan must stay a checkpoint leaf: $nodes")
  }

  test("snmWindow near-dedup path: length-adjacent dup dropped, min-id survives") {
    val base = "the quick brown fox jumps over the lazy dog in the warm garden"
    val docs = Seq(
      (1L, base),
      (2L, base + " today"),  // near-dup, length-adjacent → SNM catches
      (3L, "completely different text about ships and storms on the ocean"))
      .toDF("doc_id", "text")
    val result = CurateCli.curate(docs, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, snmWindow = 3,
        jaccardThreshold = 0.5))
    val kept = result.corpus.select("doc_id").as[Long].collect().toSet
    result.unpersist()
    assert(kept == Set(1L, 3L), s"SNM near-dedup must drop doc 2: $kept")
  }

  test("quality_pct stage cuts each source's bottom tail, not whole sources") {
    // quality = 4000·tokens + 600000 here (no punct; stopword fraction
    // pinned at the cap by one "the" per 5 tokens), so within-source
    // order follows token count. Source B's BEST doc scores below
    // source A's WORST — an absolute cut separating A's docs would
    // drop all of B; the percentile gate keeps each source's top half.
    def doc(id: Long, src: String, nTok: Int) = (id, src,
      (0 until nTok).map(i => if (i % 5 == 0) "the" else s"w${id}x$i")
        .mkString(" "))
    val docs = Seq(
      doc(1L, "A", 40), doc(2L, "A", 30), doc(3L, "A", 20), doc(4L, "A", 10),
      doc(5L, "B", 8), doc(6L, "B", 6), doc(7L, "B", 4), doc(8L, "B", 2))
      .toDF("doc_id", "source", "text")
    val result = CurateCli.curate(docs, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, minQualityPctPpm = 500000L))
    assert(result.funnel.map(_.stage).contains("quality_pct"))
    val kept = result.corpus.select("doc_id").as[Long].collect().toSet
    result.unpersist()
    assert(kept == Set(1L, 2L, 5L, 6L),
      s"top half of EACH source must survive, got $kept")
  }

  test("char_entropy stage drops the key-mash doc, keeps natural text") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away"),
      (2L, "the " + "a" * 60), // one stopword passes lang-id; mash fails entropy
      (3L, "the ships crossed the wide ocean as waves hit the rocky shore"))
      .toDF("doc_id", "text")
    val result = CurateCli.curate(docs, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, minCharEntropyFp = 2000000L))
    assert(result.funnel.map(_.stage).contains("char_entropy"))
    val kept = result.corpus.select("doc_id").as[Long].collect().toSet
    result.unpersist()
    assert(kept == Set(1L, 3L), s"low-entropy mash must drop, got $kept")
  }

  test("quality_pct/char_entropy stages keep the corpus plan lineage-cut") {
    val corpus = (1 to 20).map(i =>
      (i.toLong, if (i % 2 == 0) "even" else "odd",
        s"the cat number $i sat on the mat and watched bird " +
        s"number $i in the garden by the house")).toDF("doc_id", "source", "text")
    val result = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, minQualityPctPpm = 1L,
        minCharEntropyFp = 1L))
    val nodes = result.corpus.queryExecution.optimizedPlan
      .collect { case p => p }.size
    result.unpersist()
    assert(nodes <= 3, s"corpus plan must stay a checkpoint leaf: $nodes")
  }

  test("nfc_normalize stage makes composed/decomposed spellings exact-dedup") {
    // identical sentence, one with the composed e-acute, one decomposed —
    // byte-different, canonically equivalent. Without the stage both
    // survive exact dedup; with it they collapse to the min-id survivor.
    val sentence = "the caf\u00e9 on the corner serves the best coffee in town"
    val sentenceD = "the cafe\u0301 on the corner serves the best coffee in town"
    val corpus = Seq((1L, sentence), (2L, sentenceD))
      .toDF("doc_id", "text")
    val without = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, jaccardThreshold = 0.999))
    val idsWithout = without.corpus.select("doc_id").as[Long].collect().toSet
    without.unpersist()
    assert(idsWithout == Set(1L, 2L),
      "without the stage the spellings must NOT dedup (byte-different)")
    val withNfc = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0, jaccardThreshold = 0.999,
        nfcNormalize = true))
    assert(withNfc.funnel.map(_.stage).take(3) ==
      Seq("input", "nfc_normalize", "exact_dedup"))
    val ids = withNfc.corpus.select("doc_id").as[Long].collect().toSet
    val texts = withNfc.corpus.select("text").as[String].collect().toSet
    withNfc.unpersist()
    assert(ids == Set(1L), s"NFC-equal docs must exact-dedup, got $ids")
    assert(texts == Set(sentence), "survivor text must be the NFC form")
  }

  test("phrase_audit drops exact-quote carriers, keeps scattered-word docs") {
    // doc 1 quotes the audited phrase verbatim; doc 2 contains every
    // word of it but never consecutively (the statistical shingle
    // stage's false-positive shape — the audit must NOT drop it);
    // doc 3 carries the second quote; doc 4 is clean. All pass the
    // upstream gates at minQuality=0, so only phrase_audit can drop.
    val corpus = Seq(
      (1L, "the model replied that the secret canary value is blue and moved on"),
      (2L, "blue is the value the canary secret keeps; is that the answer"),
      (3L, "we measured exam answer leakage again today in the training run"),
      (4L, "the cat sat on the mat and watched the garden"))
      .toDF("doc_id", "text")
    val r = CurateCli.curate(corpus, "doc_id", "text",
      CurateCli.Config(minQuality = 0.0,
        auditPhrases = Seq(
          Seq("secret", "canary", "value", "is", "blue"),
          Seq("exam", "answer", "leakage"))))
    assert(r.funnel.map(_.stage) ==
      Seq("input", "exact_dedup", "near_dedup", "language", "quality",
        "phrase_audit"))
    val ids = r.corpus.select("doc_id").as[Long].collect().toSet
    r.unpersist()
    assert(ids == Set(2L, 4L),
      s"audit must drop exactly the verbatim carriers, got $ids")
  }
}
