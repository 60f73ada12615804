package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ORGANICALLY larger synthetic corpora for the scale-proof harness —
  * the complement of [[ScaleBench.scaleDocuments]]'s decorrelated
  * replicas (VERDICT r6 stretch item: "one run on organically larger
  * data closes the last inference gap").
  *
  * A replica corpus is a transform of the base rows: its near-dup
  * pair structure and shingle-frequency profile are the base corpus's,
  * repeated. An organic corpus instead GROWS the way a crawl does:
  * every document is newly assembled, cross-document repetition arises
  * from sampling collisions (so duplicated-span volume and shingle
  * document frequencies drift upward with corpus size, not in
  * lockstep), and near-duplicates appear at a constant RATE, not as
  * copies of the base pairs.
  *
  * Construction — a passage-level bootstrap of the base corpus:
  *
  *  - the base corpus is flattened to one positional token stream
  *    (document order, then token order);
  *  - synthetic doc `i` concatenates `2 + h(i)%5` chunks, each a
  *    contiguous `chunkLen`-token window of the stream starting at a
  *    hash-derived position — local n-gram structure (stopword runs,
  *    phrase shapes, language profile) is REAL text, while the
  *    document-level token mix is fresh;
  *  - every 20th doc instead re-samples its predecessor's windows with
  *    ONE token mutated — a planted near-duplicate at a constant 5%
  *    rate, the q46 workload. Planted pairs are forced to ≥ 4 chunks,
  *    so the single mutation costs ≤ 3 of ≥ 53 distinct shingles:
  *    J ≥ 0.89, robustly above the 0.8 dedup threshold even on
  *    formulaic base text;
  *  - every 7th SOURCE doc (copies inherit it, keeping planted pairs
  *    symmetric) appends one FIXED window of the stream — organic
  *    boilerplate whose document frequency grows linearly with corpus
  *    size, the q48 DF-cut / q58 span workload;
  *  - chunks are newline-joined (each chunk is one LINE of the doc),
  *    so the fixed boilerplate window is also a cross-document
  *    duplicated LINE — the line-dedup (q70) / funnel `line_dedup`
  *    stage workload. Newline is whitespace to every tokenizer in the
  *    engine, so shingle/token statistics are unchanged vs a
  *    space-joined assembly;
  *  - `source` is a 20-way hash stratum, mirroring the base table's
  *    stratification for the mix/datasheet stages.
  *
  * Everything is xxhash64-derived from `(tag, doc id, chunk index)` —
  * fully deterministic, no RNG state, so factor-1 and factor-10 runs
  * through the same generator differ ONLY in volume.
  *
  * Scale shape of the generator itself: the only non-embarrassingly-
  * parallel steps are one small window over per-document token counts
  * (base-doc-count rows) to build stream offsets, and one shuffle join
  * of (synthetic position → stream position) against the stream —
  * both linear in corpus size.
  */
object OrganicCorpus {

  /** Deterministic 63-bit positive hash of the parts. */
  private def h(parts: org.apache.spark.sql.Column*) =
    abs(xxhash64(parts: _*))

  /** Generate `factor * (base doc count)` fresh documents
    * `(doc_id, source, text)` from the base corpus's token stream.
    * Ids are dense `0 .. N-1`: the `< baseCount` prefix is the SAME
    * document set at every factor (the fixed-eval-slice property the
    * scale harness needs). */
  def generate(base: DataFrame, factor: Int, chunkLen: Int = 15,
      tag: String = "organic"): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = base.sparkSession

    // ---- positional token stream with global positions ----------------
    // per-doc offsets via a window over DOC rows (base-doc-count rows,
    // not tokens — tiny); global_pos = doc offset + within-doc position
    val toks = base.filter(col("text").isNotNull)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
    val counts = toks.select(col("doc_id"), size(col("toks")).as("n"))
    val offsets = counts.withColumn("off",
      coalesce(sum("n").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val stream = toks.join(offsets.select("doc_id", "off"), "doc_id")
      .select(posexplode(col("toks")).as(Seq("p", "token")),
        (col("off") + col("p")).as("pos"))
      .select("pos", "token")
      .localCheckpoint() // read once per synthetic-position join
    val streamLen = stream.count()
    require(streamLen > chunkLen * 2L,
      s"base corpus too small: $streamLen tokens")

    val baseCount = base.count()
    val n = baseCount * factor

    // ---- document specs ----------------------------------------------
    // doc i: chunks hash-varied 2..6 (planted pairs forced to 4..6);
    // near-dup docs (i % 20 == 19) reuse doc i-1's windows with one
    // token mutated; boilerplate (src % 7 == 0, copies inherit)
    // appends the FIXED window at stream position 0
    val ids = spark.range(n).select(col("id").as("doc_id"))
      .withColumn("src_id",
        when(col("doc_id") % 20 === 19, col("doc_id") - 1)
          .otherwise(col("doc_id")))
      .withColumn("mut",
        when(col("doc_id") % 20 === 19, lit(1L)).otherwise(lit(0L)))
      .withColumn("n_chunks",
        when(col("src_id") % 20 === 18, lit(4L) + h(lit(tag), col("src_id")) % 3L)
          .otherwise(lit(2L) + h(lit(tag), col("src_id")) % 5L))
    val specs = ids
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk"),
        col("src_id"), col("mut"))
      .withColumn("start",
        h(lit(tag), col("src_id"), col("chunk")) % (streamLen - chunkLen))
    val boiler = ids.filter(col("src_id") % 7 === 0)
      .select(col("doc_id"), lit(1000000L).as("chunk"),
        col("src_id"), lit(0L).as("mut"), lit(0L).as("start"))
    // ---- assemble -----------------------------------------------------
    val placed = specs.unionByName(boiler)
      .select(col("doc_id"), col("chunk"), col("start"), col("mut"),
        explode(sequence(lit(0), lit(chunkLen - 1))).as("o"))
      .select(col("doc_id"), col("chunk"), col("o"), col("mut"),
        (col("start") + col("o")).as("pos"))
    // assemble chunk → line, then lines → doc (newline-joined): two
    // hash-agg shuffles on (doc,chunk) then doc, both corpus-linear
    val lines = placed.join(stream, "pos")
      // the planted mutation: one token of chunk 0 gets a suffix —
      // kills at most 3 distinct shingles of the ≥ 4-chunk pair
      .withColumn("token",
        when(col("mut") === 1 && col("chunk") === 0 && col("o") === 7,
          concat(col("token"), lit("zq"))).otherwise(col("token")))
      .groupBy("doc_id", "chunk")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("o"), col("token")))),
        s => s.getField("token")), " ").as("line"))
    lines.groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk"), col("line")))),
        s => s.getField("line")), "\n").as("text"))
      .withColumn("source",
        concat(lit("src"), (h(lit(tag), col("doc_id"), lit("s")) % 20)
          .cast("string")))
      .select("doc_id", "source", "text")
  }

  /** Boilerplate line the bench seeds into single-line corpora (the
    * driver's `documents` text has NO newlines, so the funnel's
    * `line_dedup` stage can never fire on it unseeded — it would time
    * the stage's overhead but not its work). 9 tokens → at k=8 span
    * width the line alone never forms a cross-doc duplicated span, so
    * the token delta it produces is attributable to line dedup alone. */
  val BoilerplateLine: String =
    "subscribe to our newsletter for daily updates and offers"

  /** Append [[BoilerplateLine]] as a trailing LINE to every `every`-th
    * document — the seeded line-dedup workload for corpora without
    * natural line structure. Deterministic, id-derived, payload-local
    * (one projection, no shuffle). */
  def seedBoilerplate(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", every: Int = 7): DataFrame = {
    require(every >= 1, s"every must be >= 1, got $every")
    docs.withColumn(textCol,
      when(col(idCol) % every === 0 && col(textCol).isNotNull,
        concat(col(textCol), lit("\n" + BoilerplateLine)))
        .otherwise(col(textCol)))
  }
}
