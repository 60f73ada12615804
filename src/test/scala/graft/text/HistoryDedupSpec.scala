package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Dedup.dedupAgainstHistory]]: exactness under any fpp (the
  * bloom only prunes — a saturated filter must not change results),
  * minHits thresholding, null/short-doc passthrough, and the
  * broadcast + codegen shape of the prefilter. */
class HistoryDedupSpec extends SparkSpec {
  import spark.implicits._

  private def history = Seq(
    (100L, "the quick brown fox jumps over the lazy dog tonight"),
    (101L, "historical corpus body with entirely distinct vocabulary inside it")
  ).toDF("doc_id", "text")

  private def batch = Seq(
    // embeds an 8-gram of history doc 100 → dup
    (1L, "intro words the quick brown fox jumps over the lazy closing"),
    // no 8-gram overlap (shares words, never 8 consecutive) → kept
    (2L, "quick brown dog sentences that never align eight tokens with history"),
    // short doc, no fallback match in history → kept
    (3L, "tiny new doc"),
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("drops batch docs sharing an 8-gram with history; keeps the rest") {
    val kept = Dedup.dedupAgainstHistory(batch, history, "doc_id", "text",
      k = 8).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L), s"got $kept")
  }

  test("a saturated bloom (fpp ~ 1) still yields the exact result") {
    // expectedItems=1 drives the filter to near-total saturation: every
    // shingle becomes a candidate, and ONLY the exact confirm pass
    // separates true overlaps from noise
    val kept = Dedup.dedupAgainstHistory(batch, history, "doc_id", "text",
      k = 8, expectedItems = 1L, fpp = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L), s"saturated-bloom result diverged: $kept")
  }

  test("broadcastConfirm=false (shuffled confirm) is identical") {
    val kept = Dedup.dedupAgainstHistory(batch, history, "doc_id", "text",
      k = 8, broadcastConfirm = false)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L))
  }

  test("minHits=2 requires two distinct shared shingles") {
    // doc 1 embeds exactly ONE 8-token window of history doc 100
    // ("the quick brown fox jumps over the lazy") — a single distinct
    // shared shingle, so the n-of-k threshold at 2 keeps it
    val kept2 = Dedup.dedupAgainstHistory(batch, history, "doc_id", "text",
      k = 8, minHits = 2).select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(1L, 2L, 3L, 4L),
      s"minHits=2 should keep the single-hit doc 1: $kept2")
  }

  test("prefilter is scan-local: no join before the bloom test") {
    // the candidate explode+filter subtree must contain the codegen'd
    // might_contain_long with NO join beneath it — the history corpus
    // is never joined at prefilter time
    val bloom = Dedup.historyShingleBloom(history, "text", k = 8)
    val cand = batch
      .select(col("doc_id"),
        explode(Dedup.shingleHashes(col("text"), 8, distinct = true)).as("sh"))
      .filter(graft.functions.BloomExpressions.mightContainLong(col("sh"), bloom))
    val plan = cand.queryExecution.executedPlan.toString()
    assert(plan.contains("might_contain_long"), s"bloom test missing:\n$plan")
    assert(!plan.contains("Join"), s"prefilter must not join:\n$plan")
  }

  test("expectedItems=0 auto-sizes the bloom from the history's distinct shingles") {
    val exact = history
      .select(explode(Dedup.shingleHashes(col("text"), 8, distinct = true)).as("sh"))
      .distinct().count()
    val auto = Dedup.historyShingleBloom(history, "text", k = 8)
    // the auto floor (1000 items at 1% fpp) must dominate a sketch
    // sized for the true count alone — i.e. it cannot be the saturated
    // undersized configuration — while staying within the documented
    // floor-or-1.3×-estimate bound (+HLL error margin)
    val sizedExact = Dedup.historyShingleBloom(history, "text", k = 8,
      expectedItems = exact)
    val sizedFloor = Dedup.historyShingleBloom(history, "text", k = 8,
      expectedItems = math.max(1000L, exact * 13L / 10L))
    assert(auto.bitSize() >= sizedExact.bitSize(),
      s"auto (${auto.bitSize()}) must not undersize vs exact-count " +
        s"(${sizedExact.bitSize()})")
    assert(auto.bitSize() <= (sizedFloor.bitSize() * 1.1).toLong,
      s"auto (${auto.bitSize()}) exceeds the documented bound " +
        s"(${sizedFloor.bitSize()})")
  }

  test("bloom never false-negatives: every true overlap survives the prefilter") {
    val bloom = Dedup.historyShingleBloom(history, "text", k = 8,
      expectedItems = 100L, fpp = 0.000001)
    val histShingles = history
      .select(explode(Dedup.shingleHashes(col("text"), 8, distinct = true)).as("sh"))
      .as[Long].collect().toSet
    val missed = histShingles.filterNot(bloom.mightContainLong)
    assert(missed.isEmpty, s"false negatives: $missed")
  }
}
