package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Heavy hitters, stratified sampling, and collocation mining — the
  * corpus-statistics operators whose correctness claims are EXACTNESS
  * under adversarial partitioning (the sketch pass must never lose a
  * qualifying token, the sample must never depend on physical layout). */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  // --- heavy hitters ------------------------------------------------

  private def exactHitters(df: org.apache.spark.sql.DataFrame,
      supportPpm: Long): Map[String, Long] = {
    val toks = df.filter(col("text").isNotNull)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(col("t") =!= "").as[String].collect()
    val n = toks.length.toLong
    toks.groupBy(identity).view.mapValues(_.length.toLong)
      .filter { case (_, c) => c * 1000000L >= supportPpm * n }.toMap
  }

  test("heavyHitters equals the exact full count, incl. boundary tokens") {
    // 100 tokens total: "hot" ×10 (exactly 10%), "warm" ×9 (just under),
    // 81 singletons — threshold 100000 ppm keeps hot, drops warm
    val text = (Seq.fill(10)("hot") ++ Seq.fill(9)("warm") ++
      (1 to 81).map(i => s"tail$i")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.heavyHitters(df, "text", supportPpm = 100000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 10L))
    // and the ppm column is the exact floor division
    val ppm = TextAnalysis.heavyHitters(df, "text", supportPpm = 100000L)
      .head().getLong(2)
    assert(ppm == 100000L)
  }

  test("heavyHitters is partitioning-invariant (MG candidates never lose a qualifier)") {
    // Zipf-ish corpus spread over many docs, then ADVERSARIALLY
    // partitioned: all copies of each token land in ONE partition via
    // a skewed repartition — the regime where a per-partition sketch
    // must still surface every global qualifier
    val docs = (1 to 200).map { i =>
      val tok = if (i % 7 == 0) "seven" else if (i % 3 == 0) "three" else s"u$i"
      (i.toLong, s"$tok filler$i")
    }
    val base = docs.toDF("doc_id", "text")
    val expected = exactHitters(base, supportPpm = 50000L)
    assert(expected.nonEmpty, "test corpus must have hitters")
    for (parts <- Seq(1, 3, 13)) {
      val got = TextAnalysis.heavyHitters(
        base.repartition(parts, col("doc_id") % 2), "text",
        supportPpm = 50000L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"mismatch at $parts partitions")
    }
  }

  test("heavyHitters: empty result when nothing qualifies; bad support rejected") {
    val df = (1 to 50).map(i => (i.toLong, s"a$i b$i")).toDF("doc_id", "text")
    assert(TextAnalysis.heavyHitters(df, "text", 900000L).count() == 0)
    intercept[IllegalArgumentException] {
      TextAnalysis.heavyHitters(df, "text", 0L)
    }
  }

  // --- stratified sample --------------------------------------------

  test("stratifiedSample: k per full stratum, whole stratum when smaller, md5 order") {
    val df = ((1 to 20).map(i => (i.toLong, "big")) ++
      Seq((100L, "small"), (101L, "small"))).toDF("doc_id", "source")
    val got = TextAnalysis.stratifiedSample(df, "doc_id", "source", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.count(_._1 == "big") == 5)
    assert(got.count(_._1 == "small") == 2)
    assert(got.filter(_._1 == "big").map(_._3).sorted.toSeq == (1 to 5))
    // the picks are exactly the 5 smallest md5(id) strings — computed
    // locally with the JDK digest, no Spark in the expectation
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = (1 to 20).map(_.toLong).sortBy(id => (md5hex(id.toString), id))
      .take(5).toSet
    assert(got.filter(_._1 == "big").map(_._2).toSet == want)
  }

  test("stratifiedSample is partitioning-invariant") {
    val df = (1 to 60).map(i => (i.toLong, s"s${i % 4}")).toDF("doc_id", "source")
    val a = TextAnalysis.stratifiedSample(df, "doc_id", "source", 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val b = TextAnalysis.stratifiedSample(df.repartition(11), "doc_id",
      "source", 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b)
  }

  // --- collocations -------------------------------------------------

  test("collocations: a planted phrase outranks incidental pairs, fp-exactly") {
    // "new york" always adjacent; "the the…" fillers give high-count
    // low-PMI pairs
    val docs = (1 to 30).map { i =>
      (i.toLong, s"new york is the city $i the the the")
    }
    val df = docs.toDF("doc_id", "text")
    val rows = TextAnalysis.collocations(df, "text", minCount = 3, topK = 5)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2), r.getLong(3)))
    assert(rows.head._1 == ("new", "york"),
      s"planted phrase must rank first: ${rows.toSeq}")
    // fp-exact expectation for the winner: c12=30, c1=c2=30, N = bigrams
    val nBigrams = docs.map(_._2.split("\\s+").length - 1).sum.toLong
    def lfp(x: Long): Long = math.floor(math.log(x.toDouble) * 1e6).toLong
    assert(rows.head._3 == lfp(30L * nBigrams) - lfp(30L * 30L))
  }

  test("collocations is partitioning-invariant and respects minCount") {
    val df = (1 to 40).map(i => (i.toLong, s"alpha beta gamma d$i"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.collocations(df, "text", 3, 10).collect().toSeq
    val b = TextAnalysis.collocations(df.repartition(9), "text", 3, 10)
      .collect().toSeq
    assert(a == b)
    assert(a.forall(_.getLong(2) >= 3))
  }

  // --- zipf slope -----------------------------------------------------

  test("zipfSlope: matches an independent BigInt replay; degenerate → null") {
    // freq table by construction: a×8, b×4, c×2, d×1 → ranks 1..4
    val docs = Seq((1L, "a a a a a b b c d"), (2L, "a a a b b c"))
      .toDF("doc_id", "text")
    val row = TextAnalysis.zipfSlope(docs, "doc_id", "text", topK = 1000)
      .head()
    assert(row.getLong(0) == 4L)
    // independent model: the same fixed-point least squares in BigInt,
    // with true floor division (BigInt / truncates toward zero)
    def lfp(n: Long): BigInt = BigInt(math.floor(math.log(n.toDouble) * 1e6).toLong)
    def floorDiv(num: BigInt, den: BigInt): BigInt = {
      val q = num / den
      if (num % den != 0 && (num.signum != den.signum)) q - 1 else q
    }
    val pts = Seq((1L, 8L), (2L, 4L), (3L, 2L), (4L, 1L))
      .map { case (r, f) => (lfp(r), lfp(f)) }
    val n = BigInt(pts.size)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val want = floorDiv((n * sxy - sx * sy) * 1000000, n * sxx - sx * sx)
    assert(BigInt(row.getLong(1)) == want)
    // geometric frequencies fall FASTER than 1/r, so the fitted
    // exponent must land clearly below −1 (sanity on the sign/scale)
    assert(row.getLong(1) < -1000000L && row.getLong(1) > -3000000L)
    // single-token corpus: no regression exists → NULL, not a crash
    val one = Seq((1L, "solo")).toDF("doc_id", "text")
    val r1 = TextAnalysis.zipfSlope(one, "doc_id", "text").head()
    assert(r1.getLong(0) == 1L && r1.isNullAt(1))
  }

  test("ngramDiversity: repeated trigrams depress the ratio; short docs skip") {
    val docs = Seq(
      // srcA: "a b c a b c" -> trigrams {abc, bca, cab, abc}: 4 total,
      // 3 distinct -> ttr = floor(3e6/4) = 750000
      (1L, "srcA", "a b c a b c"),
      // srcB: all-distinct trigrams -> ttr = 1000000
      (2L, "srcB", "x y z w"),
      // 2-token doc contributes nothing anywhere
      (3L, "srcB", "p q"),
      (4L, "srcC", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.ngramDiversity(docs, "source", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(("srcA", 4L, 3L, 750000L), ("srcB", 2L, 2L, 1000000L)))
  }

  test("sourceKlDivergence: corpus-identical source scores 0, skewed scores > 0") {
    // one source IS the corpus: every ΔL term is exactly 0
    val solo = Seq((1L, "s1", "a a b c")).toDF("doc_id", "source", "text")
    val r0 = TextAnalysis.sourceKlDivergence(solo, "source", "text").head()
    assert(r0.getString(0) == "s1" && r0.getLong(1) == 4L && r0.getLong(2) == 0L)
    // a source concentrated on one token diverges from the blend; the
    // balanced source sits much closer
    val two = Seq(
      (1L, "skew", "a a a a a a a a"),
      (2L, "flat", "a b c d e f g h"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.sourceKlDivergence(two, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(got("skew") > 0L, s"skewed source must diverge, got $got")
    assert(got("skew") > got("flat"),
      s"concentration must out-diverge balance, got $got")
    // hand-check the skew side in the same fixed point: every one of
    // its 8 'a' tokens contributes L(8)-L(8)-L(9)+L(16) (c_s=8, N_s=8,
    // corpus a-count 9, N=16)
    def lfp(x: Long) = math.floor(math.log(x.toDouble) * 1000000L).toLong
    val term = lfp(8) - lfp(8) - lfp(9) + lfp(16)
    val want = math.floorDiv(8L * term, 8L)
    assert(got("skew") == want, s"expected $want, got ${got("skew")}")
  }

  test("hapaxRatio: once-per-SOURCE decides, cross-doc repeats disqualify") {
    val docs = Seq(
      // srcA: 'x' twice (once per doc — still tf=2 within the source,
      // NOT a hapax), 'y' and 'z' once each -> 2 of 3 types
      (1L, "srcA", "x y"), (2L, "srcA", "x z"),
      // srcB: every token repeated -> 0 hapax
      (3L, "srcB", "p p q q"),
      // null text contributes nothing
      (4L, "srcB", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.hapaxRatio(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(("srcA", 3L, 2L, 666666L), ("srcB", 2L, 0L, 0L)))
  }

  test("ngramHeadCoverage: top-k types absorb their exact occurrence share") {
    val docs = Seq(
      // trigram 'a b c' appears 3x (twice in doc 1 via overlap-free
      // repeats, once in doc 2); the other trigrams once each
      (1L, "a b c x a b c"),  // grams: abc, bcx, cxa, xab, abc
      (2L, "a b c"),          // gram: abc
      (3L, "q r"))            // too short: contributes nothing
      .toDF("doc_id", "text")
    // 6 occurrences over 4 types; head k=1 is 'a b c' with 3
    val got = TextAnalysis.ngramHeadCoverage(docs, "text", n = 3, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq((1L, 4L, 6L, 3L, 500000L)))
    // k covering everything -> ppm = 1e6 exactly
    val all = TextAnalysis.ngramHeadCoverage(docs, "text", n = 3, k = 10)
      .head()
    assert(all.getLong(4) == 1000000L)
  }

  test("duplicationTrend: earlier id owns the text, deciles are equal-count bands") {
    // 10 docs, 2 deciles of 5: ids 6..8 repeat ids 1..3's texts, so
    // the first band is all-novel and the second carries 3 dups
    val docs = ((1L to 5L).map(i => (i, s"text $i")) ++
      Seq((6L, "text 1"), (7L, "text 2"), (8L, "text 3"),
        (9L, "text 9"), (10L, "text 10")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.duplicationTrend(docs, "doc_id", "text",
        buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq((1L, 5L, 0L, 0L), (2L, 5L, 3L, 600000L)))
  }

  test("tokenLengthHistogram: types vs occurrences per length") {
    val docs = Seq((1L, "aa bb aa c"), (2L, "ddd aa")).toDF("doc_id", "text")
    // len 1: {c} 1 occ; len 2: {aa, bb} 4 occ; len 3: {ddd} 1 occ
    val got = TextAnalysis.tokenLengthHistogram(docs, "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 1L), (2L, 2L, 4L), (3L, 1L, 1L)))
  }

  test("readabilityCensus: ender runs, sentence floor, corpus-level ratios") {
    val docs = Seq(
      // A: 3 words, 12 token chars, 2 ender runs
      (1L, "A", "Hi there. Bye."),
      // A: no enders -> floors to 1 sentence; 3 words, 12 chars
      (2L, "A", "no enders here"),
      // B: '!' '?' and '.' all end sentences -> 3; 3 words, 14 chars
      (3L, "B", "One! Two? Three."),
      // B: zero words -> excluded entirely (n_docs must stay 1)
      (4L, "B", "   "),
      (5L, "B", null))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.readabilityCensus(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      // A: 6 words / 3 sentences = 2.0; 24 chars / 6 words = 4.0
      ("A", 2L, 6L, 3L, 2000000L, 4000000L),
      // B: 3/3 = 1.0; floor(14e6/3) = 4666666
      ("B", 1L, 3L, 3L, 1000000L, 4666666L)))
  }

  test("dupNgramCensus: repeated bigram mass flags the doc, short docs skip") {
    val docs = Seq(
      // "a b","b a","a b","b a" -> every occurrence duplicated:
      // ppm 1000000 > 300000 -> repetitive
      (1L, "A", "a b a b a"),
      // all-distinct bigrams -> dup 0
      (2L, "A", "x y z"),
      // single token: no bigram -> source B absent from the census
      (3L, "B", "hello"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.dupNgramCensus(docs, "source", "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // A mass: dup 4 / total 6 -> floor = 666666
    assert(got == Seq(("A", 2L, 1L, 666666L)))
  }

  test("crossSourceLeakage: shared distinct texts once per pair, copies collapse") {
    val docs = Seq(
      // "x" lives in A (twice), B, C; "y" in A and B; "z" only in A
      (1L, "A", "x"), (2L, "A", "x"), (3L, "B", "x"), (4L, "C", "x"),
      (5L, "A", "y"), (6L, "B", "y"),
      (7L, "A", "z"), (8L, "C", null))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.crossSourceLeakage(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSeq
    assert(got == Seq(("A", "B", 2L), ("A", "C", 1L), ("B", "C", 1L)))
    // prefix mode: shared 4-char opening, diverging bodies
    val pdocs = Seq((1L, "A", "blahblah one"), (2L, "B", "blahblah two"),
      (3L, "C", "other"))
      .toDF("doc_id", "source", "text")
    assert(TextAnalysis.crossSourceLeakage(pdocs, "source", "text")
      .count() == 0)
    val pgot = TextAnalysis.crossSourceLeakage(pdocs, "source", "text",
        prefixChars = 8)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSeq
    assert(pgot == Seq(("A", "B", 1L)))
  }

  test("sourceVocabularyOverlap: type-set Jaccard, zero pairs kept, minCount prunes") {
    val docs = Seq(
      (1L, "A", "x x y y z"),   // A types: {x, y, z}
      (2L, "B", "x x y q"),     // B types: {x, y, q}
      (3L, "C", "z"))           // C types: {z}
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.sourceVocabularyOverlap(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      ("A", "B", 2L, 500000L),   // {x,y} / {x,y,z,q}
      ("A", "C", 1L, 333333L),   // {z} / {x,y,z}
      ("B", "C", 0L, 0L)))       // disjoint pair still reported
    // minCount = 2: only tokens occurring >= 2 times per source remain
    val pruned = TextAnalysis.sourceVocabularyOverlap(docs, "source",
        "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    // A -> {x, y}; B -> {x}; C -> {} (C vanishes: no qualifying types)
    assert(pruned == Seq(("A", "B", 1L, 500000L)))
  }

  test("languageEntropy: fixed-point fold, monolingual source scores 0") {
    val docs = Seq(
      (1L, "A", "en"), (2L, "A", "en"), (3L, "A", "fr"), (4L, "A", "de"),
      (5L, "B", "en"), (6L, "B", "en"), (7L, "B", "en"),
      (8L, "B", null))
      .toDF("doc_id", "source", "lang")
    val got = TextAnalysis.languageEntropy(docs, "source", "lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // A: L(4)=1386294, L(2)=693147 -> (1386294*4 - 2*693147) // 4
    assert(got == Seq(("A", 4L, 3L, 1039720L), ("B", 3L, 1L, 0L)))
  }

  test("distinctiveTokens: lift vs corpus rate, minCount floor, tie order") {
    // corpus: A = 8 tokens (xx xx xx xx yy yy zz zz), B = 8 tokens
    // (yy yy yy yy yy yy zz zz): N = 16
    // A: xx cs=4 c=4 -> lift = 4*16e6/(8*4)  = 2,000,000
    //    yy cs=2 c=8 -> lift = 2*16e6/(8*8)  =   500,000
    //    zz cs=2 c=4 -> lift = 2*16e6/(8*4)  = 1,000,000
    val docs = Seq(
      (1L, "A", "xx xx xx xx yy yy zz zz"),
      (2L, "B", "yy yy yy yy yy yy zz zz"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.distinctiveTokens(docs, "source", "text",
        k = 2, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("A", 1L, "xx", 4L, 2000000L), ("A", 2L, "zz", 2L, 1000000L),
      // B: yy lift = 6*16e6/(8*8) = 1,500,000; zz = 1,000,000
      ("B", 1L, "yy", 6L, 1500000L), ("B", 2L, "zz", 2L, 1000000L)))
    // minCount floors the within-source count: a 1-occurrence token
    // can't chart even with infinite lift
    val docs2 = Seq((1L, "A", "rare aa aa"), (2L, "B", "aa aa aa"))
      .toDF("doc_id", "source", "text")
    val top = TextAnalysis.distinctiveTokens(docs2, "source", "text",
        k = 1, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq
    assert(top == Seq(("A", "aa"), ("B", "aa")))
  }

  test("dedupSavings: copies collapse, reclaimed mass exact") {
    val docs = Seq(
      (1L, "A", "aaaa"), (2L, "A", "aaaa"), (3L, "A", "aaaa"),
      (4L, "A", "bb"),
      (5L, "B", "cc"), (6L, "B", null))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.dedupSavings(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // A: 4 docs, 2 unique, 14 chars total, 6 unique -> 8e6 // 14
    assert(got == Seq(
      ("A", 4L, 2L, 14L, 6L, 571428L),
      ("B", 1L, 1L, 2L, 2L, 0L)))
  }

  test("qualityBudgetCurve: rank bands, cumulative retention from the top") {
    // no punctuation, no stopwords: q = tokens*4000 + 300000, so the
    // quality order IS the token-count order: 1 < 2 < 3 tokens
    val docs = Seq((1L, "x"), (2L, "x y"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityBudgetCurve(docs, "doc_id", "text",
        TextAnalysis.LangProfiles("en"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      // cut nothing -> keep all 6 tokens
      (1L, 1L, 1L, 304000L, 6L, 1000000L),
      // cut the worst doc -> keep 5 of 6
      (4L, 1L, 2L, 308000L, 5L, 833333L),
      // keep only the best -> 3 of 6
      (7L, 1L, 3L, 312000L, 3L, 500000L)))
  }
}
