package graft.text

import graft.SparkSpec

/** Pins line-wise boilerplate dedup ([[Dedup.duplicatedLines]] /
  * [[Dedup.removeDuplicatedLines]]): cross-document evidence only,
  * whitespace lines immune, all occurrences drop, order preserved,
  * unaffected docs (incl. null text) pass through byte-identical. */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val nav = "home | products | contact us"
  private def corpus = Seq(
    (1L, s"$nav\nthe first real article body\n  \nmore unique prose here"),
    (2L, s"intro line only in doc two\n$nav\nanother unique closing line"),
    // doc 3 repeats ITS OWN line twice — within-doc repetition is not
    // cross-document evidence, both copies must survive
    (3L, "self repeated line\nself repeated line\nunique third doc line"),
    (4L, null.asInstanceOf[String]),
    // doc 5 is nav-only boilerplate → collapses to empty
    (5L, s"$nav\n   $nav  ")
  ).toDF("doc_id", "text")

  test("duplicatedLines: trimmed cross-doc lines only; whitespace and within-doc repeats immune") {
    val rows = Dedup.duplicatedLines(corpus, "doc_id", "text")
      .as[(Long, Int, String, Long)].collect().toSet
    // nav occurs in docs 1, 2, 5 (5 twice, counted once for df) → df 3
    assert(rows.map(_._1) == Set(1L, 2L, 5L), s"got $rows")
    assert(rows.forall(_._4 == 3L), s"df must count distinct docs: $rows")
    assert(rows.map(r => (r._1, r._2)) ==
      Set((1L, 0), (2L, 1), (5L, 0), (5L, 1)), s"occurrence positions: $rows")
    // the raw (untrimmed) line is reported
    assert(rows.exists(_._3 == s"   $nav  "), s"raw line lost: $rows")
  }

  test("removeDuplicatedLines: drops all occurrences, keeps order, null/unchanged pass through") {
    val out = Dedup.removeDuplicatedLines(corpus, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "the first real article body\n  \nmore unique prose here")
    assert(out(2L) == "intro line only in doc two\nanother unique closing line")
    assert(out(3L) == "self repeated line\nself repeated line\nunique third doc line")
    assert(out(4L) == null)
    assert(out(5L) == "", s"all-boilerplate doc must collapse: '${out(5L)}'")
  }

  test("minDf raises the evidence bar") {
    val out = Dedup.removeDuplicatedLines(corpus, "doc_id", "text", minDf = 4)
      .as[(Long, String)].collect().toMap
    // nav's df is 3 < 4 → nothing is dropped anywhere
    assert(out(1L).startsWith(nav) && out(5L).contains(nav))
  }
}
