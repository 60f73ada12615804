package graft.ops

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import scala.jdk.CollectionConverters._

import graft.SparkSpec

class CurateStreamCliSpec extends SparkSpec {
  import spark.implicits._

  private def jsonRow(id: Long, t: String, ts: String) =
    s"""{"doc_id":$id,"ts":"$ts","text":"$t"}"""

  private def jsonRowSrc(id: Long, src: String, t: String, ts: String) =
    s"""{"doc_id":$id,"ts":"$ts","text":"$t","source":"$src"}"""

  test("e2e with --quality-pct-table: below-calibration doc dropped, unknown source passes") {
    val in = Files.createTempDirectory("cscli-pct-in").toString
    val base = Files.createTempDirectory("cscli-pct").toString
    // calibration corpus for source A: quality_e6 = 4000·tokens +
    // 600000 (one "the" per 5 tokens pins the stopword cap; no punct) —
    // at the 50th percentile the threshold lands at the 30-token doc
    def calDoc(id: Long, nTok: Int) =
      (id, "A", (0 until nTok).map(i =>
        if (i % 5 == 0) "the" else s"c${id}x$i").mkString(" "))
    Seq(calDoc(101L, 40), calDoc(102L, 30), calDoc(103L, 20), calDoc(104L, 10))
      .toDF("doc_id", "source", "text").write.parquet(s"$base/cal_src")
    graft.text.TextAnalysis.qualityPctThresholds(
        spark.read.parquet(s"$base/cal_src"), "doc_id", "text", "source",
        pctPpm = 500000L)
      .write.parquet(s"$base/pct")
    // threshold for A = quality of the 30-token doc (rank 3 of 4,
    // pct 666666): 4000·30 + 600000 = 720000
    val th = spark.read.parquet(s"$base/pct")
      .as[(String, Long)].collect().toMap
    assert(th == Map("A" -> 720000L), s"calibration snapshot: $th")
    val cfg = CurateStreamCli.StreamConfig(
      input = in, output = s"$base/landing", candidates = s"$base/cands",
      checkpoint = s"$base/cp",
      curate = CurateCli.Config(minQuality = 0.0, languages = Set("en"),
        jaccardThreshold = 0.5),
      qualityPctTablePath = Some(s"$base/pct"))
    // arriving docs: source-A doc ABOVE the bar (35 tokens → 740000),
    // source-A doc BELOW it (12 tokens → 648000), unknown source (no
    // calibration row → passes regardless of quality)
    def streamDoc(id: Long, nTok: Int) = (0 until nTok).map(i =>
      if (i % 5 == 0) "the" else s"s${id}x$i").mkString(" ")
    val b0 = Paths.get(s"$in/b0.json")
    Files.writeString(b0, Seq(
      jsonRowSrc(1, "A", streamDoc(1, 35), "2024-01-01T10:00:00Z"),
      jsonRowSrc(2, "A", streamDoc(2, 12), "2024-01-01T10:00:01Z"),
      jsonRowSrc(3, "B", streamDoc(3, 8), "2024-01-01T10:00:02Z")
    ).mkString("\n"))
    Files.setLastModifiedTime(b0,
      FileTime.fromMillis(System.currentTimeMillis() - 60000))
    val s1 = CurateStreamCli.run(spark, cfg)
    val landed = spark.read.parquet(cfg.output)
      .select("doc_id").as[Long].collect().toSet
    assert(landed == Set(1L, 3L),
      s"above-bar A and unknown-source B land; below-bar A drops: $landed")
    assert(s1.landed == 2)
    // the landing zone carries the source column through
    assert(spark.read.parquet(cfg.output).columns.contains("source"))
  }

  test("parseArgs: contract errors and full round-trip") {
    assert(CurateStreamCli.parseArgs(Array("--input", "a")).isLeft)
    assert(CurateStreamCli.parseArgs(Array("--frobnicate", "x")).isLeft)
    assert(CurateStreamCli.parseArgs(Array("--input")).isLeft) // missing value
    assert(CurateStreamCli.parseArgs(Array("--input", "a", "--output", "b",
      "--candidates", "c", "--checkpoint", "d", "--threshold", "NaNope")).isLeft)
    val ok = CurateStreamCli.parseArgs(Array(
      "--input", "in", "--output", "out", "--candidates", "cand",
      "--checkpoint", "cp", "--min-quality", "0.4", "--languages", "en,fr",
      "--threshold", "0.5", "--shingle-k", "2", "--watermark", "2 hours",
      "--max-per-bucket", "10", "--state-ttl-ms", "5000", "--eval", "ev",
      "--decontaminate-k", "6", "--decontaminate-min-hits", "2",
      "--state-store", "rocksdb"))
    assert(ok.exists(c => c.input == "in" && c.curate.minQuality == 0.4 &&
      c.curate.languages == Set("en", "fr") && c.curate.jaccardThreshold == 0.5 &&
      c.curate.shingleK == 2 && c.watermark == "2 hours" &&
      c.maxPerBucket == 10 && c.stateTtlMs == 5000L &&
      c.evalPath.contains("ev") && c.curate.decontaminateK == 6 &&
      c.curate.decontaminateMinHits == 2 && c.stateStore.contains("rocksdb")))
    // the perplexity gate needs BOTH halves: a model without a
    // threshold (or vice versa) is a config error, not a silent no-op
    val req = Array("--input", "a", "--output", "b",
      "--candidates", "c", "--checkpoint", "d")
    assert(CurateStreamCli.parseArgs(req :+ "--bigram-model" :+ "m").isLeft)
    assert(CurateStreamCli.parseArgs(
      req :+ "--max-bigram-xent-micro" :+ "100").isLeft)
    val okLm = CurateStreamCli.parseArgs(req ++ Array(
      "--bigram-model", "m", "--max-bigram-xent-micro", "3450000"))
    assert(okLm.exists(c => c.bigramModelPath.contains("m") &&
      c.curate.maxBigramXentMicro == 3450000L))
  }

  test("e2e with --bigram-model: improbable-bigram doc never lands, fluent doc does") {
    val in = Files.createTempDirectory("cscli-lm-in").toString
    val base = Files.createTempDirectory("cscli-lm").toString
    val fluent = "the cat sat on the mat and the dog ran in the garden"
    // the reference LM snapshot — a bounded clean corpus, built batch-
    // side and handed to the stream as parquet
    (1L to 10L).map(i => (i, fluent)).toDF("doc_id", "text")
      .write.parquet(s"$base/refmodel_src")
    graft.text.TextAnalysis.bigramLmModel(
        spark.read.parquet(s"$base/refmodel_src"), "text")
      .write.parquet(s"$base/model")
    val cfg = CurateStreamCli.StreamConfig(
      input = in, output = s"$base/landing", candidates = s"$base/cands",
      checkpoint = s"$base/cp",
      curate = CurateCli.Config(minQuality = 0.0, languages = Set("en"),
        jaccardThreshold = 0.5, maxBigramXentMicro = 2000000L),
      bigramModelPath = Some(s"$base/model"))
    // same vocabulary (so language ID still says en and every PREFIX is
    // known) but scrambled order: every bigram is unseen → per-bigram
    // nll ≈ ln(c1+V) − ln(1), far above the fluent doc's
    val scrambled = "garden the ran and mat dog sat cat the on in the"
    val b0 = Paths.get(s"$in/b0.json")
    Files.writeString(b0, Seq(
      jsonRow(1, fluent, "2024-01-01T10:00:00Z"),
      jsonRow(2, scrambled, "2024-01-01T10:00:01Z")).mkString("\n"))
    val now = System.currentTimeMillis()
    Files.setLastModifiedTime(b0, FileTime.fromMillis(now - 120000))
    val s1 = CurateStreamCli.run(spark, cfg)
    assert(s1.landed == 1, s"only the fluent doc may land, got $s1")
    assert(spark.read.parquet(cfg.output)
      .select("doc_id").as[Long].collect().toSet == Set(1L))
    // run 2: a near-dup of the LANDED fluent doc still lands (its two
    // extra bigrams average away) and flags against doc 1 — while
    // nothing ever references the gate-dropped doc 2 (it streams from
    // the landing zone, so it never entered LSH state)
    val b1 = Paths.get(s"$in/b1.json")
    Files.writeString(b1, Seq(
      jsonRow(3, fluent + " again today", "2024-01-01T10:01:00Z")).mkString("\n"))
    Files.setLastModifiedTime(b1, FileTime.fromMillis(now))
    val s2 = CurateStreamCli.run(spark, cfg)
    val landed2 = spark.read.parquet(cfg.output)
      .select("doc_id").as[Long].collect().toSet
    assert(landed2 == Set(1L, 3L), s"landing zone after run 2: $landed2")
    val flagged = spark.read.parquet(cfg.candidates)
      .select("doc_id", "dup_of").as[(String, String)].collect().toSet
    assert(!flagged.exists(p => p._1 == "2" || p._2 == "2"),
      s"the gate-dropped doc must never appear in candidates: $flagged")
    assert(flagged.contains(("3", "1")),
      s"the cross-run near-dup among LANDED docs must flag: $flagged")
  }

  test("RocksDB state store: cross-run near-dup flagged from restored RocksDB state") {
    val in = Files.createTempDirectory("cscli-rdb-in").toString
    val base = Files.createTempDirectory("cscli-rdb").toString
    val cfg = CurateStreamCli.StreamConfig(
      input = in, output = s"$base/landing", candidates = s"$base/cands",
      checkpoint = s"$base/cp",
      curate = CurateCli.Config(minQuality = 0.4, languages = Set("en"),
        jaccardThreshold = 0.5, shingleK = 2),
      stateStore = Some("rocksdb"))
    val baseDoc = "the quick brown fox jumps over the lazy dog near the river bank today"
    val nearDoc = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    val b0 = Paths.get(s"$in/b0.json")
    Files.writeString(b0, jsonRow(1, baseDoc, "2024-01-01T10:00:00Z"))
    val now = System.currentTimeMillis()
    Files.setLastModifiedTime(b0, FileTime.fromMillis(now - 120000))
    assert(CurateStreamCli.run(spark, cfg) == CurateStreamCli.Summary(1, 0))
    // the provider choice must not leak into the shared session (the
    // conf key resolves to Spark's HDFS-backed default after restore —
    // getOption surfaces defaults, so assert on the value, not on unset)
    assert(!spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
    // run 2 restarts the checkpoint: the near-dup of run 1's doc must be
    // flagged from state RESTORED by the RocksDB provider
    val b1 = Paths.get(s"$in/b1.json")
    Files.writeString(b1, jsonRow(4, nearDoc, "2024-01-01T10:01:00Z"))
    Files.setLastModifiedTime(b1, FileTime.fromMillis(now))
    assert(CurateStreamCli.run(spark, cfg) == CurateStreamCli.Summary(2, 1))
    val flagged = spark.read.parquet(cfg.candidates)
      .select("doc_id", "dup_of").as[(String, String)].collect().toSet
    assert(flagged == Set(("4", "1")), s"candidates: $flagged")
    // and the state dir really is RocksDB-format (zip/changelog uploads,
    // no HDFS-provider .delta files)
    val stateDir = Paths.get(s"$base/cp/candidates/state")
    assert(Files.exists(stateDir), "state dir must exist")
    val names = java.nio.file.Files.walk(stateDir).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(names.exists(n => n.endsWith(".zip") || n.endsWith(".changelog")),
      s"expected RocksDB snapshot artifacts in state dir, got $names")
    assert(!names.exists(_.endsWith(".delta")),
      s"HDFS-provider .delta files mean RocksDB was NOT used: $names")
  }

  test("e2e with --eval: contaminated docs never land NOR enter near-dup state") {
    val in = Files.createTempDirectory("cscli-ev-in").toString
    val base = Files.createTempDirectory("cscli-ev").toString
    val leaked = "the hidden answer to the secret benchmark question is forty two"
    val clean2 = "a completely clean document about the weather in the hills today"
    Seq((900L, leaked)).toDF("doc_id", "text")
      .write.parquet(s"$base/eval")
    val cfg = CurateStreamCli.StreamConfig(
      input = in, output = s"$base/landing", candidates = s"$base/cands",
      checkpoint = s"$base/cp",
      curate = CurateCli.Config(minQuality = 0.0, languages = Set("en"),
        jaccardThreshold = 0.5),
      evalPath = Some(s"$base/eval"))
    val b0 = Paths.get(s"$in/b0.json")
    Files.writeString(b0, Seq(
      jsonRow(1, leaked + " plus some trailing words here", "2024-01-01T10:00:00Z"),
      jsonRow(2, clean2, "2024-01-01T10:00:01Z")
    ).mkString("\n"))
    val now = System.currentTimeMillis()
    Files.setLastModifiedTime(b0, FileTime.fromMillis(now - 120000))
    val s1 = CurateStreamCli.run(spark, cfg)
    assert(s1.landed == 1, s"only the clean doc may land, got $s1")
    assert(spark.read.parquet(cfg.output)
      .select("doc_id").as[Long].collect().toSet == Set(2L))

    // run 2: doc 3 is CLEAN (one word changed inside every eval-matching
    // 8-gram window) but a trigram near-dup of the never-landed doc 1 —
    // if contaminated docs leaked into LSH state, (3, dup_of=1) would be
    // flagged and batch survivorship would silently drop doc 3, losing
    // the content entirely; doc 4 is a near-dup of the LANDED doc 2 and
    // must still flag, proving the clean path works cross-run
    val b1 = Paths.get(s"$in/b1.json")
    Files.writeString(b1, Seq(
      jsonRow(3, "the hidden answer to a secret benchmark question is forty two plus some trailing words here",
        "2024-01-01T10:01:00Z"),
      jsonRow(4, clean2 + " and tomorrow", "2024-01-01T10:01:01Z")
    ).mkString("\n"))
    Files.setLastModifiedTime(b1, FileTime.fromMillis(now))
    val s2 = CurateStreamCli.run(spark, cfg)
    val landed2 = spark.read.parquet(cfg.output)
      .select("doc_id").as[Long].collect().toSet
    assert(landed2 == Set(2L, 3L, 4L), s"landing zone after run 2: $landed2")
    val flagged = spark.read.parquet(cfg.candidates)
      .select("doc_id", "dup_of").as[(String, String)].collect().toSet
    assert(!flagged.exists(p => p._1 == "1" || p._2 == "1"),
      s"a never-landed contaminated doc must not appear in candidates: $flagged")
    assert(flagged.contains(("4", "2")),
      s"the cross-run near-dup among LANDED docs must still flag: $flagged")
    assert(s2.flagged == flagged.size.toLong)
  }

  test("run refuses an output dir written by the other landing-sink mode") {
    val base = Files.createTempDirectory("cscli-mix").toString
    val in = Files.createTempDirectory("cscli-mix-in").toString
    Files.writeString(Paths.get(s"$in/b0.json"),
      jsonRow(1, "the cat sat on the mat and it was a fine day for all of us",
        "2024-01-01T10:00:00Z"))
    // non---eval run creates the streaming-sink _spark_metadata log
    val plain = CurateStreamCli.StreamConfig(
      input = in, output = s"$base/landing", candidates = s"$base/cands",
      checkpoint = s"$base/cp",
      curate = CurateCli.Config(minQuality = 0.0, languages = Set("en")))
    CurateStreamCli.run(spark, plain)
    Seq((900L, "totally unrelated eval text here")).toDF("doc_id", "text")
      .write.parquet(s"$base/eval")
    val ex = intercept[IllegalStateException] {
      CurateStreamCli.run(spark,
        plain.copy(checkpoint = s"$base/cp2", evalPath = Some(s"$base/eval")))
    }
    assert(ex.getMessage.contains("_spark_metadata"))
  }

  test("e2e: drain, restart on new files, cross-RUN near-dup flagged from checkpointed state") {
    val in = Files.createTempDirectory("cscli-in").toString
    val base = Files.createTempDirectory("cscli").toString
    val cfg = CurateStreamCli.StreamConfig(
      input = in, output = s"$base/landing", candidates = s"$base/cands",
      checkpoint = s"$base/cp",
      curate = CurateCli.Config(minQuality = 0.4, languages = Set("en"),
        jaccardThreshold = 0.5, shingleK = 2))

    val baseDoc = "the quick brown fox jumps over the lazy dog near the river bank today"
    val nearDoc = "the quick brown fox jumps over the lazy dog near the river bank tonight"

    // ---- run 1: one good doc, one exact dup (dropped), one junk ----
    val b0 = Paths.get(s"$in/b0.json")
    Files.writeString(b0, Seq(
      jsonRow(1, baseDoc, "2024-01-01T10:00:00Z"),
      jsonRow(2, baseDoc, "2024-01-01T10:00:01Z"),
      jsonRow(3, "x!!! ??? ,,, ;;; :::", "2024-01-01T10:00:02Z")
    ).mkString("\n"))
    val now = System.currentTimeMillis()
    Files.setLastModifiedTime(b0, FileTime.fromMillis(now - 120000))

    val s1 = CurateStreamCli.run(spark, cfg)
    assert(s1 == CurateStreamCli.Summary(1, 0),
      s"run 1 must land only doc 1 and flag nothing, got $s1")

    // ---- run 2 (restart): a near-dup of run 1's doc + a fresh doc ----
    val b1 = Paths.get(s"$in/b1.json")
    Files.writeString(b1, Seq(
      jsonRow(4, nearDoc, "2024-01-01T10:01:00Z"),
      jsonRow(5, "a completely different story about columnar query engines today",
        "2024-01-01T10:01:01Z")
    ).mkString("\n"))
    Files.setLastModifiedTime(b1, FileTime.fromMillis(now))

    val s2 = CurateStreamCli.run(spark, cfg)
    // doc 4 and 5 both pass the gates (landing accumulates 1+2); doc 4 is
    // flagged against doc 1 — which was seen in the PREVIOUS invocation,
    // so the LSH bucket state must have come back from the checkpoint
    assert(s2 == CurateStreamCli.Summary(3, 1),
      s"run 2 must land docs 4,5 and flag the cross-run near-dup, got $s2")
    val landed = spark.read.parquet(cfg.output)
      .select("doc_id").as[Long].collect().toSet
    assert(landed == Set(1L, 4L, 5L), s"landing zone: $landed")
    val flagged = spark.read.parquet(cfg.candidates)
      .select("doc_id", "dup_of").as[(String, String)].collect().toSet
    assert(flagged == Set(("4", "1")), s"candidates: $flagged")

    // ---- run 3: nothing new → both queries drain zero rows, no dup rows ----
    val s3 = CurateStreamCli.run(spark, cfg)
    assert(s3 == CurateStreamCli.Summary(3, 1), s"idempotent re-drain, got $s3")
  }

  // both providers: the LSH bucket state's crash replay lives in
  // per-version .delta files (HDFS default) vs snapshot zip +
  // changelog (RocksDB) — exactly-once must hold on each
  for (provider <- Seq(None, Some("rocksdb")))
  test("HARD CRASH between runs" + provider.fold("")(p => s" under $p") +
    ": torn WAL commits on both queries replay " +
    "exactly-once — landing and near-dup state match the no-crash run") {
    val baseDoc = "the quick brown fox jumps over the lazy dog near the river bank today"
    val nearDoc = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    val otherDoc = "a completely different story about columnar query engines today"
    def mkCfg(): CurateStreamCli.StreamConfig = {
      val in = Files.createTempDirectory("cscli-crash-in").toString
      val base = Files.createTempDirectory("cscli-crash").toString
      CurateStreamCli.StreamConfig(
        input = in, output = s"$base/landing", candidates = s"$base/cands",
        checkpoint = s"$base/cp",
        curate = CurateCli.Config(minQuality = 0.4, languages = Set("en"),
          jaccardThreshold = 0.5, shingleK = 2),
        stateStore = provider)
    }
    def stage(cfg: CurateStreamCli.StreamConfig, name: String,
        rows: Seq[String], mtime: Long): Unit = {
      val p = Paths.get(s"${cfg.input}/$name")
      Files.writeString(p, rows.mkString("\n"))
      Files.setLastModifiedTime(p, FileTime.fromMillis(mtime))
    }
    def tearNewestCommit(cpSub: String): Unit = {
      val commits = Paths.get(cpSub, "commits")
      val newest = Files.list(commits).iterator().asScala.toSeq
        .filter(_.getFileName.toString.forall(_.isDigit))
        .maxBy(_.getFileName.toString.toLong)
      Files.delete(newest)
      Files.deleteIfExists(
        newest.resolveSibling("." + newest.getFileName.toString + ".crc"))
    }
    def landed(cfg: CurateStreamCli.StreamConfig): Set[Long] =
      spark.read.parquet(cfg.output).select("doc_id").as[Long].collect().toSet
    def flagged(cfg: CurateStreamCli.StreamConfig): Set[(String, String)] =
      spark.read.parquet(cfg.candidates)
        .select("doc_id", "dup_of").as[(String, String)].collect().toSet
    val now = System.currentTimeMillis()
    val half1 = Seq(jsonRow(1, baseDoc, "2024-01-01T10:00:00Z"))
    val half2 = Seq(jsonRow(4, nearDoc, "2024-01-01T10:01:00Z"),
      jsonRow(5, otherDoc, "2024-01-01T10:01:01Z"))

    // no-crash reference
    val cfgR = mkCfg()
    stage(cfgR, "b0.json", half1, now - 120000)
    CurateStreamCli.run(spark, cfgR)
    stage(cfgR, "b1.json", half2, now)
    val sR = CurateStreamCli.run(spark, cfgR)
    assert(sR == CurateStreamCli.Summary(3, 1))

    // crash run: drain half 1, then simulate kill -9 in the torn
    // window on BOTH queries (a dying JVM tears whatever was in
    // flight): each query's newest WAL commit + .crc vanish while its
    // sink metadata and state-store versions survive. The restart must
    // replay that batch against state version N−1 — in particular the
    // LSH bucket state must NOT double-insert doc 1, or doc 4 would
    // flag twice / against a phantom — then chain the new files.
    val cfgC = mkCfg()
    stage(cfgC, "b0.json", half1, now - 120000)
    CurateStreamCli.run(spark, cfgC)
    tearNewestCommit(s"${cfgC.checkpoint}/landing")
    tearNewestCommit(s"${cfgC.checkpoint}/candidates")
    stage(cfgC, "b1.json", half2, now)
    val sC = CurateStreamCli.run(spark, cfgC)
    assert(sC == CurateStreamCli.Summary(3, 1), s"crash run summary: $sC")
    assert(landed(cfgC) == landed(cfgR) && landed(cfgC) == Set(1L, 4L, 5L),
      s"landing diverged: ${landed(cfgC)} vs ${landed(cfgR)}")
    assert(flagged(cfgC) == flagged(cfgR) &&
      flagged(cfgC) == Set(("4", "1")),
      s"candidates diverged: ${flagged(cfgC)} vs ${flagged(cfgR)}")
  }
}
