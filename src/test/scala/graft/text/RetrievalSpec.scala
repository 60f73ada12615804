package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BM25 retrieval: scores checked EXACTLY against an independent
  * in-memory fixed-point model (BigInt floor arithmetic — the same
  * spec the DuckDB oracle replays), plus ranking/limit semantics and
  * the partition-pruned postings probe. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // corpus with known term distribution: "apple" rare, "the" ubiquitous
  private lazy val docs = Seq(
    (1L, "the apple tree the orchard"),          // apple x1, dl 5
    (2L, "the the the banana stand"),            // dl 5
    (3L, "apple apple apple pie the"),           // apple x3, dl 5
    (4L, "banana banana the smoothie bar near"), // dl 6
    (5L, "plain text with nothing relevant")     // dl 5
  ).toDF("doc_id", "text")

  /** Independent model: Lucene-BM25 fixed-point exactly as documented
    * on [[Retrieval]] (k1=1.2, b=0.75 cross-multiplied integers). */
  private def modelScores(
      corpus: Seq[(Long, String)], terms: Seq[String]): Map[Long, Long] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    }.toMap
    val n = BigInt(corpus.size)
    val tt = BigInt(toks.values.map(_.size).sum)
    def lfp(x: BigInt): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    corpus.map { case (id, _) =>
      val dl = BigInt(toks(id).size)
      val score = terms.map { term =>
        val tf = BigInt(toks(id).count(_ == term))
        val df = BigInt(toks.values.count(_.contains(term)))
        val idfFp = BigInt(lfp(2 * n + 2) - lfp(2 * df + 1))
        val num = 22 * tf * tt * 1000000
        val den = 10 * tt * tf + 3 * tt + 9 * dl * n
        (idfFp * (num / den) / 1000000).toLong
      }.sum
      id -> score
    }.toMap.filter(_._2 > 0)
  }

  test("bm25Scores match the independent fixed-point model exactly") {
    val terms = Seq("apple", "banana", "the")
    val got = Retrieval.bm25Scores(docs, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = modelScores(
      Seq(1L -> "the apple tree the orchard",
        2L -> "the the the banana stand",
        3L -> "apple apple apple pie the",
        4L -> "banana banana the smoothie bar near",
        5L -> "plain text with nothing relevant").map(p => (p._1, p._2)),
      terms)
    assert(got == want)
    // sanity on the fixture: doc 3 (apple x3) must beat doc 1 (apple x1)
    assert(got(3L) > got(1L))
    // doc 5 matches no term -> excluded
    assert(!got.contains(5L))
  }

  test("rare term outscores ubiquitous term at equal tf") {
    // doc 1 has apple x1 and the x2; a pure-"apple" query on doc 1 must
    // outscore a pure-"the" query on the same doc despite lower tf
    val apple = Retrieval.bm25Scores(docs, "doc_id", "text", Seq("apple"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val the = Retrieval.bm25Scores(docs, "doc_id", "text", Seq("the"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(apple(1L) > the(1L))
  }

  test("bm25TopK: k rows, descending score, id tiebreak") {
    val top = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("apple", "banana"), 3).collect()
    assert(top.length == 3)
    val scores = top.map(_.getLong(1)).toSeq
    assert(scores == scores.sorted.reverse)
    // plan must be TakeOrderedAndProject, not a global sort
    val plan = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("apple"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("postingsIndex written: probe ≡ full filter, partition-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("postings").toString
    val mem = Retrieval.postingsIndex(docs, "doc_id", "text")
      .filter(col("token") === "banana")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    Retrieval.postingsIndex(docs, "doc_id", "text", Some(dir))
    val probe = Retrieval.termLookup(spark, dir, "banana")
    val got = probe.collect()
      .map(r => (r.getString(r.fieldIndex("token")),
        r.getLong(r.fieldIndex("doc_id")), r.getLong(r.fieldIndex("tf")))).toSet
    assert(got == mem)
    val pf = probe.queryExecution.executedPlan.toString
    assert(pf.contains("PartitionFilters: [isnotnull(shard"), pf)
  }

  test("bm25BatchTopK: a single-query batch ranks exactly like bm25Scores") {
    // query text = the fixed term set, so the join formulation and the
    // conditional-agg formulation must produce identical (doc, score)s
    val queries = Seq((100L, "apple banana")).toDF("qid", "qtext")
    val batch = Retrieval.bm25BatchTopK(docs, "doc_id", "text",
      queries, "qid", "qtext", k = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val single = Retrieval.bm25Scores(docs, "doc_id", "text",
      Seq("apple", "banana"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch == single)
  }

  test("bm25BatchTopK: each query-doc ranks itself first; k honored") {
    val queries = docs.filter(col("doc_id").isin(1L, 4L))
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val got = Retrieval.bm25BatchTopK(docs, "doc_id", "text",
      queries, "qid", "qtext", k = 2)
      .collect().groupBy(_.getLong(0))
    assert(got.keySet == Set(1L, 4L))
    got.foreach { case (qid, rows) =>
      assert(rows.length <= 2)
      val best = rows.minBy(r => (-r.getLong(2), r.getLong(1)))
      assert(best.getLong(1) == qid, s"query $qid must retrieve itself first")
    }
  }

  test("duplicate terms rejected; empty terms rejected") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25Scores(docs, "doc_id", "text", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25Scores(docs, "doc_id", "text", Nil)
    }
  }

  test("phraseMatches: consecutive-only, overlaps count, K=1/2/3 paths") {
    val corpus = Seq(
      (1L, "the apple tree"),          // "apple tree" x1
      (2L, "apple apple apple"),       // "apple apple" x2 (overlapping)
      (3L, "tree apple the apple tree"), // "apple tree" x1, "the apple tree" x1
      (4L, "apple, tree"),             // punctuation breaks the token — no match
      (5L, "tree the")                 // terms present, never consecutive in order
    ).toDF("doc_id", "text")
    def run(phrase: String*): Map[Long, Long] =
      Retrieval.phraseMatches(corpus, "doc_id", "text", phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run("apple", "tree") == Map(1L -> 1L, 3L -> 1L))
    assert(run("apple", "apple") == Map(2L -> 2L)) // overlap: 2, not 1
    assert(run("the", "apple", "tree") == Map(1L -> 1L, 3L -> 1L)) // 3-token chain
    assert(run("apple") == Map(1L -> 1L, 2L -> 3L, 3L -> 2L)) // K=1, tf
    assert(run("tree", "apple", "banana").isEmpty)
    intercept[IllegalArgumentException] {
      Retrieval.phraseMatches(corpus, "doc_id", "text", Nil)
    }
  }

  test("rrfFuse: exact integer contributions, cross-list sum, topN cut") {
    // list 1 ranks: a(1), b(2), c(3); list 2: b(1), a(2)
    val l1 = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("doc_id", "score_fp")
    val l2 = Seq((2L, 99L), (1L, 5L), (4L, 0L)).toDF("doc_id", "score_fp")
    def c(r: Int) = 1000000L / (60 + r)
    val got = Retrieval.rrfFuse(Seq(l1, l2), "doc_id", k0 = 60,
        topN = 100, topK = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ((c(1) + c(2), 2L)), 2L -> ((c(2) + c(1), 2L)),
      3L -> ((c(3), 1L)))) // doc 4 scored 0 → never ranked
    // topN truncation: with topN=1 only each list's head contributes
    val top1 = Retrieval.rrfFuse(Seq(l1, l2), "doc_id", topN = 1, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1 == Map(1L -> c(1), 2L -> c(1)))
  }

  test("phraseMatchesAny: per-phrase rows, shared postings agree with phraseMatches") {
    val corpus = Seq(
      (1L, "the apple tree"),
      (2L, "apple apple apple"),
      (3L, "tree apple the apple tree"),
      (4L, "banana split"),
      (5L, "tree the")
    ).toDF("doc_id", "text")
    val phrases = Seq(Seq("apple", "tree"), Seq("apple", "apple"),
      Seq("banana", "split"))
    val got = Retrieval.phraseMatchesAny(corpus, "doc_id", "text", phrases)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // must equal the per-phrase phraseMatches results, tagged by index
    val want = phrases.zipWithIndex.flatMap { case (p, i) =>
      Retrieval.phraseMatches(corpus, "doc_id", "text", p)
        .collect().map(r => (r.getLong(0), i, r.getLong(1)))
    }.toSet
    assert(got == want)
    assert(got == Set((1L, 0, 1L), (3L, 0, 1L), (2L, 1, 2L), (4L, 2, 1L)))
    intercept[IllegalArgumentException] {
      Retrieval.phraseMatchesAny(corpus, "doc_id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      Retrieval.phraseMatchesAny(corpus, "doc_id", "text", Seq(Seq("a"), Nil))
    }
  }

  test("phraseMatches is partitioning-invariant") {
    val corpus = Seq(
      (1L, "a b a b a"), (2L, "b a b"), (3L, "a a b b a b")
    ).toDF("doc_id", "text")
    val one = Retrieval.phraseMatches(corpus, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val many = Retrieval.phraseMatches(corpus.repartition(5), "doc_id",
        "text", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one == Set((1L, 2L), (2L, 1L), (3L, 2L)))
    assert(many == one)
  }
}
