package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Dedup.decontaminate]]: planted k-shingle contamination, the
  * short-doc (<k tokens) fallback-shingle edge, null-text passthrough,
  * and the broadcast shape of the eval semi-join. */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def evalDocs = Seq(
    // 10 tokens → three distinct 8-token shingles
    (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    // <8 tokens → ONE whole-doc fallback shingle "tiny eval doc"
    (101L, "tiny eval doc")
  ).toDF("doc_id", "text")

  private def corpus = Seq(
    // embeds the verbatim window alpha..theta → contaminated
    (10L, "prefix words alpha beta gamma delta epsilon zeta eta theta trailing body"),
    (11L, "completely unrelated content about spark engines and columnar execution"),
    // identical short doc → its fallback shingle equals the eval one
    (12L, "tiny eval doc"),
    // contains the short eval doc's 3 tokens inside a >= 8-token doc: a
    // real 8-gram can never equal a 3-token fallback string → CLEAN.
    // This is exactly the degenerate-shingle hazard: a short eval doc
    // must NOT flag every longer doc that merely mentions its words.
    (13L, "this tiny eval doc phrase is embedded in a longer document body"),
    // null text carries no shingles → passes through as clean
    (14L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("drops docs sharing a k=8 shingle; short-doc fallback only matches whole short docs") {
    val kept = Dedup.decontaminate(corpus, evalDocs, "doc_id", "text", k = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 13L, 14L),
      s"expected 10 (verbatim window) and 12 (identical short doc) dropped, got kept=$kept")
  }

  test("broadcastEval=false (shuffled semi-join) yields identical survivors") {
    val kept = Dedup.decontaminate(corpus, evalDocs, "doc_id", "text", k = 8,
      broadcastEval = false)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 13L, 14L))
  }

  test("eval side reaches the corpus scan as a broadcast LeftSemi") {
    val p = Dedup.decontaminate(corpus, evalDocs, "doc_id", "text", k = 8)
      .queryExecution.executedPlan.toString()
    val semiLines = p.linesIterator.filter(_.contains("LeftSemi")).toSeq
    assert(semiLines.nonEmpty, s"no semi-join in plan:\n$p")
    assert(semiLines.exists(_.contains("BroadcastHashJoin")),
      s"eval semi-join is not broadcast:\n$p")
  }

  test("contaminationCounts: per-doc distinct shared-shingle evidence") {
    val hits = Dedup.contaminationCounts(corpus, evalDocs, "doc_id", "text", k = 8)
      .as[(Long, Long)].collect().toMap
    // doc 10 embeds alpha..theta verbatim → exactly ONE of the eval
    // doc's three 8-gram windows; doc 12 matches the one fallback
    // shingle; clean docs are absent (not zero-count rows)
    assert(hits == Map(10L -> 1L, 12L -> 1L), s"got $hits")
  }

  test("minHits=2 keeps single-shingle collisions, drops heavier overlap") {
    // doc 20 shares TWO of the eval doc's 8-gram windows (11 tokens,
    // windows at offsets 0 and 1 both land inside the eval text)
    val wide = corpus.union(Seq(
      (20L, "alpha beta gamma delta epsilon zeta eta theta iota trailing body")
    ).toDF("doc_id", "text"))
    val counts = Dedup.contaminationCounts(wide, evalDocs, "doc_id", "text", k = 8)
      .as[(Long, Long)].collect().toMap
    assert(counts(20L) == 2L, s"planted doc must have 2 hits, got $counts")
    val kept = Dedup.decontaminate(wide, evalDocs, "doc_id", "text", k = 8,
      minHits = 2).select("doc_id").as[Long].collect().toSet
    // 10 and 12 (1 hit each) survive the tightened threshold; 20 drops
    assert(kept == Set(10L, 11L, 12L, 13L, 14L), s"got $kept")
  }

  test("contaminating the eval set with itself empties only the overlap") {
    // corpus ∩ eval shingles = everything with >= 1 shingle → only the
    // null-text doc survives decontaminating a corpus against itself
    val all = corpus
    val kept = Dedup.decontaminate(all, all, "doc_id", "text", k = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(14L))
  }

  test("confusable evasion: Cyrillic homoglyphs dodge raw shingles; " +
    "folding both sides restores every collision (q250)") {
    // the eval window re-typed with Cyrillic а/е/о/с/р — renders
    // identically, shares zero codepoint-level tokens
    val attacked = corpus
      .filter(col("doc_id") === 10L)
      .select(col("doc_id"),
        translate(col("text"), "aeocp", "аеоср").as("text"))
    // raw decontamination is blind to it
    val keptRaw = Dedup.decontaminate(attacked, evalDocs,
      "doc_id", "text", k = 8).select("doc_id").as[Long].collect().toSet
    assert(keptRaw == Set(10L), "raw shingles must miss the homoglyph copy")
    // folding both sides through the confusable table catches it
    val keptFolded = Dedup.decontaminate(
      attacked.withColumn("text", TextAnalysis.confusableFold(col("text"))),
      evalDocs.withColumn("text", TextAnalysis.confusableFold(col("text"))),
      "doc_id", "text", k = 8).select("doc_id").as[Long].collect().toSet
    assert(keptFolded.isEmpty, "folded shingles must drop the copy")
    // the fold is the identity on pure-ASCII text, and the from/to
    // tables stay codepoint-aligned (translate is positional)
    assert(TextAnalysis.ConfusableFrom.codePointCount(0,
        TextAnalysis.ConfusableFrom.length) ==
      TextAnalysis.ConfusableTo.codePointCount(0,
        TextAnalysis.ConfusableTo.length))
    val ascii = corpus.filter(col("doc_id") === 11L)
      .select(TextAnalysis.confusableFold(col("text")) <=> col("text"))
      .as[Boolean].head()
    assert(ascii, "confusableFold must be identity on ASCII text")
  }
}
