package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-8 pair-similarity family: directed containment (excerpt
  * detection), sparsified tf-idf cosine, and n-gram novelty. */
class SimilarityPairsSpec extends SparkSpec {
  import spark.implicits._

  test("containmentPairs: an excerpt is flagged in its direction only") {
    val big = (1 to 60).map(i => s"tok$i").mkString(" ")
    val excerpt = (10 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, big),
      (2L, excerpt),                             // fully contained in 1
      (3L, "unrelated words entirely disjoint from everything else here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    // C(2→1) = 1.0 (every shingle of the excerpt is in the big doc);
    // C(1→2) ≈ 9/58 — far below threshold, must NOT appear
    assert(pairs.map(p => (p._1, p._2)) == List((2L, 1L)))
    assert(pairs.head._3 == 1.0)
    // symmetric Jaccard misses this pair entirely at any useful threshold
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3,
      threshold = 0.5)
    assert(j.count() == 0)
  }

  test("containmentPairs: maxShingleDf cut drops ubiquitous shingles") {
    val boiler = "common footer text repeated in every single document"
    val docs = (1L to 10L).map(i => (i, s"unique$i payload$i body$i $boiler"))
      .toDF("doc_id", "text")
    // without the cut the shared footer makes everything contain
    // everything at low threshold; with the cut df>5 shingles vanish
    // and no pair survives. maxShingleDf = 0 is the explicit opt-OUT
    // (the containment default is the guarded q48 cut of 20)
    val cut = Dedup.containmentPairs(docs, "doc_id", "text", k = 3,
      threshold = 0.5, maxShingleDf = 5)
    assert(cut.count() == 0)
    val raw = Dedup.containmentPairs(docs, "doc_id", "text", k = 3,
      threshold = 0.5, maxShingleDf = 0)
    assert(raw.count() > 0)
  }

  test("dedupByContainment: excerpt drops, container survives, mutual pair keeps min id") {
    val big = (1 to 60).map(i => s"tok$i").mkString(" ")
    val excerpt = (10 to 25).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, big),
      (2L, excerpt),                     // excerpt of 1 → drops
      (5L, "alpha beta gamma delta epsilon zeta eta theta"),
      (9L, "alpha beta gamma delta epsilon zeta eta theta"), // mutual with 5
      (3L, "unrelated words entirely disjoint from everything else here")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupByContainment(docs, "doc_id", "text",
      k = 3, threshold = 0.9, maxShingleDf = 0)
    val kept = out.select("doc_id").as[Long].collect().toSet
    Dedup.releaseIndex(out) // the documented internal-index release path
    // mutual equal-size containment keeps exactly the smaller id
    assert(kept == Set(1L, 3L, 5L))
  }

  test("tfidfCosinePairs: equal-vector docs hit cosine 1.0; disjoint absent") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "epsilon delta gamma beta alpha"),      // same bag, reordered
      (3L, "zeta eta theta iota kappa")            // disjoint vocabulary
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.tfidfCosinePairs(docs, "doc_id", "text",
        topM = 5, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    assert(pairs.map(p => (p._1, p._2)) == List((1L, 2L)))
    // sqrt(n2)*sqrt(n2) rounds a hair off n2 — deterministic IEEE on
    // every engine (that's why the oracle hash-matches), just not 1.0
    assert(math.abs(pairs.head._3 - 1.0) < 1e-12)
    // shingle Jaccard on the reordered pair is 0 — cosine catches what
    // word-order similarity cannot
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3,
      threshold = 0.3).count() == 0)
  }

  test("tfidfCosinePairs prefix + positional filtering equals brute force") {
    // Zipf-ish corpus: three ubiquitous tokens shared by every doc
    // (the fan-out the prefix filter must absorb), overlapping mid-df
    // tokens, and a unique token per doc
    val corpus = (1 to 60).map { i =>
      (i.toLong, s"the of and tok${i % 7} tok${(i * 3) % 11} uniq$i")
    }
    val docs = corpus.toDF("doc_id", "text")
    // brute force: replicate the exact weighting locally, all pairs
    def brute(threshold: Double): Map[(Long, Long), Double] = {
      val tf = corpus.map { case (id, t) =>
        id -> t.split("\\s+").toSeq.groupBy(identity).view
          .mapValues(_.size.toLong).toMap
      }.toMap
      val dfC = tf.values.flatMap(_.keys).groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val vecs = tf.map { case (id, m) =>
        id -> m.toSeq
          .sortBy { case (tok, c) => (-c.toDouble / dfC(tok), tok) }
          .take(5)
          .map { case (tok, c) => tok -> c * 1000000L / dfC(tok) }.toMap
      }
      (for {
        a <- vecs.keys; b <- vecs.keys; if a < b
        dp = vecs(a).map { case (t, w) => w * vecs(b).getOrElse(t, 0L) }.sum
        na = math.sqrt(vecs(a).values.map(w => w * w).sum.toDouble)
        nb = math.sqrt(vecs(b).values.map(w => w * w).sum.toDouble)
        cos = dp.toDouble / (na * nb)
        if cos >= threshold
      } yield (a, b) -> cos).toMap
    }
    for (t <- Seq(0.3, 0.6, 0.9)) {
      val got = TextAnalysis.tfidfCosinePairs(docs, "doc_id", "text",
          topM = 5, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      assert(got == brute(t), s"mismatch at threshold $t")
    }
  }

  test("ngramNovelty: first doc fully novel, exact copy fully stale") {
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six"),          // exact copy of 1
      (3L, "seven eight nine ten eleven twelve")    // all fresh
    ).toDF("doc_id", "text")
    val r = Dedup.ngramNovelty(docs, "doc_id", "text", k = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) == ((4L, 4L, 1.0)))
    assert(r(2L) == ((4L, 0L, 0.0)))
    assert(r(3L) == ((4L, 4L, 1.0)))
  }
}
