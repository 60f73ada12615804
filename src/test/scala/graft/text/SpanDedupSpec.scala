package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Dedup.duplicatedSpans]] / [[Dedup.removeDuplicatedSpans]]:
  * planted cross-document boilerplate, span-merge arithmetic
  * (overlapping and back-to-back windows fuse; a one-token gap splits),
  * the within-doc-repetition exclusion, and short/null-doc passthrough. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // 10-token boilerplate block shared verbatim by docs 1 and 2 →
  // three k=4 window starts (0,1,..) per occurrence merge into ONE span
  private val boiler = "one two three four five six seven eight nine ten"

  private def corpus = Seq(
    (1L, s"$boiler alpha beta gamma delta"),
    (2L, s"unique lead-in words here $boiler"),
    // repeats its own 4-gram twice but shares nothing cross-doc → NO span
    (3L, "echo echo echo echo filler echo echo echo echo closing words"),
    (4L, "entirely unrelated document content with no shared windows at all"),
    (5L, "short doc"), // < k tokens → excluded
    (6L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("shared block yields one merged span per carrier at its own offset") {
    val spans = Dedup.duplicatedSpans(corpus, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1: block at tokens [0,10) → starts 0..6 (7 grams); doc 2 at [4,14)
    assert(spans == Set((1L, 0L, 10L, 7L), (2L, 4L, 14L, 7L)),
      s"got $spans")
  }

  test("a one-token gap between duplicated windows splits the span") {
    // docs share 4-grams a b c d and x y z w, separated by a unique token
    // per doc → two spans each, not one
    val df = Seq(
      (1L, "a b c d SEP1 x y z w"),
      (2L, "a b c d SEP2 x y z w")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set(
      (1L, 0L, 4L, 1L), (1L, 5L, 9L, 1L),
      (2L, 0L, 4L, 1L), (2L, 5L, 9L, 1L)), s"got $spans")
  }

  test("back-to-back duplicated windows (gap exactly k) fuse into one span") {
    // shared grams at positions 0 and 4 with nothing shared between →
    // windows [0,4) and [4,8) are adjacent → single span [0,8)
    val df = Seq(
      (1L, "a b c d x y z w tail1"),
      (2L, "a b c d q r s t tail2"),
      (3L, "p p p p x y z w tail3")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text", k = 4)
      .filter(col("doc_id") === 1L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set((1L, 0L, 8L, 2L)), s"got $spans")
  }

  test("removeDuplicatedSpans excises covered tokens, passes the rest through") {
    val cleaned = Dedup.removeDuplicatedSpans(corpus, "doc_id", "text", k = 4)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(cleaned(1L) == "alpha beta gamma delta")
    assert(cleaned(2L) == "unique lead-in words here")
    assert(cleaned(3L).startsWith("echo"), "no cross-doc span → unchanged")
    assert(cleaned(5L) == "short doc")
    assert(cleaned(6L) == null)
    // row count preserved — excision never drops documents
    assert(cleaned.size == 6)
  }

  test("duplicated-gram set joins as the small (broadcast-capable) side") {
    // the semi-join on the duplicated-hash set must not shuffle the
    // positions side on anything but the 8-byte hash key; with AQE the
    // small aggregate side broadcasts
    val p = Dedup.duplicatedSpans(corpus, "doc_id", "text", k = 4)
      .queryExecution.executedPlan.toString()
    assert(p.contains("LeftSemi"), s"expected semi-join in plan:\n$p")
  }
}
