package graft.ops

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The streaming event-census launcher end-to-end: JSON event files in,
  * closed-session + verdict parquet out, CROSS-RUN session chaining
  * through the checkpointed state (an open session from run 1 extends
  * with run-2 events), and batch-parity rollups printed after the
  * drain. */
class SessionCensusCliSpec extends SparkSpec {
  import spark.implicits._

  private val s = 1000000L // µs per second

  // epoch-µs → the UTC timestamp string the JSON reader parses
  private def iso(us: Long): String =
    java.time.Instant.ofEpochSecond(us / 1000000L,
      (us % 1000000L) * 1000L).toString

  private def row(u: Long, id: Long, us: Long, ty: String) =
    s"""{"user_id":$u,"event_id":$id,"ts":"${iso(us)}","event_type":"$ty"}"""

  test("e2e: cross-run session chaining, verdicts, batch-parity rollups") {
    val in = Files.createTempDirectory("scc-in").toString
    val base = Files.createTempDirectory("scc").toString
    val cfg = SessionCensusCli.CensusConfig(
      input = in, sessions = s"$base/sessions",
      checkpoint = s"$base/cp",
      gapSec = 10L, watermark = "0 seconds",
      verdicts = Some(s"$base/verdicts"),
      fromType = "view", toType = "purchase", windowSec = 5L,
      funnels = Some(s"$base/funnels"),
      funnelSteps = Seq("view", "purchase"),
      growth = Some(s"$base/growth"),
      paths = Some(s"$base/paths"),
      transitions = Some(s"$base/transitions"))

    val B = 1000L * s
    // run 1: u1 view + view 4 s apart — an OPEN session (close point
    // B+14 s is past the drain watermark B+4 s), so nothing may emit
    Files.writeString(Paths.get(s"$in/b0.json"), Seq(
      row(1L, 10L, B, "view"),
      row(1L, 11L, B + 4 * s, "view")).mkString("\n"))
    val s1 = SessionCensusCli.run(spark, cfg)
    assert(s1 == SessionCensusCli.Summary(0L, 0L, 0L),
      s"run 1 must close nothing: $s1")

    // run 2: a purchase at B+8 s CHAINS into the run-1 session (gap
    // 4 s ≤ 10 s — state restored from the checkpoint); the sentinel
    // sits on epoch day 3 so the watermark passes every session close
    // point AND completes u1's active day (the growth census ripens at
    // DAY grain — a same-day sentinel would leave it empty)
    Files.writeString(Paths.get(s"$in/b1.json"), Seq(
      row(1L, 12L, B + 8 * s, "purchase"),
      row(99L, 990L, 3L * 86400000000L, "purchase")).mkString("\n"))
    val s2 = SessionCensusCli.run(spark, cfg)
    assert(s2.closedSessions == 1L, s"one fused session closes: $s2")

    val sess = spark.read.parquet(cfg.sessions)
      .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    assert(sess == Set((1L, B, B + 8 * s, 3L, 8 * s, "view")),
      s"the session spans BOTH runs with its run-1 entry: $sess")

    // verdicts: view@B abandoned (purchase at B+8 s is outside its
    // 5 s budget), view@B+4 s rescued (B+8 s is inside (B+4, B+9])
    val v = spark.read.parquet(s"$base/verdicts")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(v == Set((1L, 10L, B, true), (1L, 11L, B + 4 * s, false)),
      s"verdicts: $v")
    assert(s2.verdictCount == 2L)

    // the rollups over the accumulated tables equal the batch censuses
    val bounce = graft.analytics.StreamingAnalytics.sessionBounceRollup(
      spark.read.parquet(cfg.sessions))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(bounce == Seq(("view", 1L, 0L, 0L)))
    val abd = graft.analytics.StreamingAnalytics.abandonmentRollup(
      spark.read.parquet(s"$base/verdicts"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(abd == Seq((2L, 1L, 500000L, 1L)))

    // the funnel census: the fused session advances view -> purchase
    // (both strictly ordered), so max_step = 2 of the 2-step funnel
    val fu = spark.read.parquet(s"$base/funnels")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(fu == Set((1L, B, B + 8 * s, 3L, 2L, false)),
      s"funnel sessions: $fu")
    assert(s2.funnelSessions == 1L)
    val funnelReport = graft.analytics.StreamingAnalytics
      .sessionFunnelRollup(spark.read.parquet(s"$base/funnels"),
        Seq("view", "purchase"))
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(funnelReport ==
      Seq((1, "view", 1L, 0L), (2, "purchase", 1L, 0L)))

    // the growth census: u1's single active day (all events share the
    // sentinel-ripened epoch day) is "new"; its churn-out lands the day
    // after — dropped by the day-spine (nobody active then); the
    // sentinel user's day stays unripe (open watermark frontier)
    val growthReport = graft.analytics.StreamingAnalytics.growthRollup(
      spark.read.parquet(s"$base/growth")
        .filter(col("user_id") =!= 99L))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(growthReport == Seq((B / 86400000000L, 1L, 0L, 0L, 0L)),
      s"growth report: $growthReport")
    assert(s2.growthEvents >= 1L)

    // the paths census: the fused session renders its full journey
    val pathsTop = graft.analytics.StreamingAnalytics.sessionPathsRollup(
      spark.read.parquet(s"$base/paths"))
      .as[(String, Long)].collect().toSeq
    assert(pathsTop == Seq(("view>view>purchase", 1L)), s"$pathsTop")
    assert(s2.pathSessions == 1L)
    // the transition matrix: two edges from the three-event journey
    val trans = graft.analytics.StreamingAnalytics.transitionsRollup(
      spark.read.parquet(s"$base/transitions")
        .filter(col("user_id") =!= 99L))
      .as[(String, String, Long)].collect().toSeq
    assert(trans == Seq(("view", "purchase", 1L), ("view", "view", 1L)),
      s"$trans")
    assert(s2.transitionEdges >= 2L)

    // run 3 with no new files: a pure no-op drain must not re-emit
    val s3 = SessionCensusCli.run(spark, cfg)
    assert(s3.closedSessions == 1L && s3.verdictCount == 2L &&
      s3.funnelSessions == 1L, s"idempotent re-drain: $s3")
  }

  test("RocksDB state store: cross-run chain restores from RocksDB state") {
    val in = Files.createTempDirectory("scc-rdb-in").toString
    val base = Files.createTempDirectory("scc-rdb").toString
    val cfg = SessionCensusCli.CensusConfig(
      input = in, sessions = s"$base/sessions",
      checkpoint = s"$base/cp",
      gapSec = 10L, watermark = "0 seconds",
      stateStore = Some("rocksdb"))
    val B = 1000L * s
    Files.writeString(Paths.get(s"$in/b0.json"),
      row(1L, 10L, B, "view"))
    assert(SessionCensusCli.run(spark, cfg) ==
      SessionCensusCli.Summary(0L, 0L))
    // the provider choice must not leak into the shared session
    assert(!spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB")))
    // run 2: chains into the RocksDB-restored open session, then the
    // sentinel ripens it
    Files.writeString(Paths.get(s"$in/b1.json"), Seq(
      row(1L, 11L, B + 6 * s, "view"),
      row(99L, 990L, B + 500 * s, "view")).mkString("\n"))
    assert(SessionCensusCli.run(spark, cfg).closedSessions == 1L)
    val sess = spark.read.parquet(cfg.sessions)
      .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    assert(sess == Set((1L, B, B + 6 * s, 2L, 6 * s, "view")),
      s"cross-run chain through RocksDB state: $sess")
    // the state dir really is RocksDB-format (zip/changelog uploads,
    // no HDFS-provider .delta files)
    import scala.jdk.CollectionConverters._
    val stateDir = Paths.get(s"$base/cp/sessions/state")
    assert(Files.exists(stateDir), "state dir must exist")
    val names = Files.walk(stateDir).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(names.exists(n => n.endsWith(".zip") || n.endsWith(".changelog")),
      s"expected RocksDB snapshot artifacts, got $names")
    assert(!names.exists(_.endsWith(".delta")),
      s"HDFS-provider .delta files mean RocksDB was NOT used: $names")
  }

  // the torn-commit matrix runs over BOTH state-store providers: the
  // HDFS-backed default and RocksDB differ exactly where crash replay
  // lives (per-version .delta files vs snapshot zip + changelog
  // replay), so exactly-once proven on one does not transfer to the
  // other
  for (provider <- Seq(None, Some("rocksdb")))
  test("HARD CRASH on the stateful path" +
    provider.fold("")(p => s" under $p") +
    ": a torn WAL commit between runs " +
    "replays the flatMapGroupsWithState batch exactly-once — no " +
    "duplicated or lost closed sessions") {
    import scala.jdk.CollectionConverters._
    val B = 1000L * s
    val half1 = Seq(row(1L, 10L, B, "view"), row(1L, 11L, B + 4 * s, "view"))
    val half2 = Seq(row(1L, 12L, B + 8 * s, "purchase"),
      row(2L, 20L, B + 30 * s, "view"),
      row(99L, 990L, B + 500 * s, "view"))
    def mkCfg(): (String, SessionCensusCli.CensusConfig) = {
      val in = Files.createTempDirectory("scc-crash-in").toString
      val base = Files.createTempDirectory("scc-crash").toString
      (in, SessionCensusCli.CensusConfig(
        input = in, sessions = s"$base/sessions",
        checkpoint = s"$base/cp", gapSec = 10L, watermark = "0 seconds",
        stateStore = provider))
    }
    def sessionsOf(cfg: SessionCensusCli.CensusConfig) =
      spark.read.parquet(cfg.sessions)
        .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
        .sorted

    // no-crash reference: two incremental drains
    val (inR, cfgR) = mkCfg()
    Files.writeString(Paths.get(s"$inR/b0.json"), half1.mkString("\n"))
    SessionCensusCli.run(spark, cfgR)
    Files.writeString(Paths.get(s"$inR/b1.json"), half2.mkString("\n"))
    SessionCensusCli.run(spark, cfgR)
    val want = sessionsOf(cfgR)
    assert(want.nonEmpty)

    // crash run: drain half 1, then tear the newest WAL commit (+ its
    // .crc — a real kill loses both, and the state store's version for
    // that batch plus the sink's _spark_metadata entry survive); the
    // restart must REPLAY that micro-batch against state version N−1
    // and the idempotent sink, then chain half 2 — append-mode
    // flatMapGroupsWithState's exactly-once under the same torn window
    // CdcPipelineSpec proves for the foreachBatch merge path
    val (inC, cfgC) = mkCfg()
    Files.writeString(Paths.get(s"$inC/b0.json"), half1.mkString("\n"))
    SessionCensusCli.run(spark, cfgC)
    val commits = Paths.get(s"${cfgC.checkpoint}/sessions/commits")
    val newest = Files.list(commits).iterator().asScala.toSeq
      .filter(_.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    Files.delete(newest)
    Files.deleteIfExists(
      newest.resolveSibling("." + newest.getFileName.toString + ".crc"))
    Files.writeString(Paths.get(s"$inC/b1.json"), half2.mkString("\n"))
    SessionCensusCli.run(spark, cfgC)
    assert(sessionsOf(cfgC) == want,
      s"torn-commit replay diverged: ${sessionsOf(cfgC)} vs $want")
  }

  test("StateStores: a custom provider class keeps its casing") {
    // the pre-fix per-CLI copies lowercased BEFORE matching and
    // returned the lowercased binding — corrupting any fully-qualified
    // class into an unloadable all-lowercase name
    assert(StateStores.providerClass("com.example.MyStateStoreProvider")
      == "com.example.MyStateStoreProvider")
    assert(StateStores.providerClass("RocksDB")
      .endsWith("RocksDBStateStoreProvider")) // aliases case-insensitive
    assert(StateStores.providerClass("HDFS")
      .endsWith("HDFSBackedStateStoreProvider"))
  }

  test("legacy 5-column --funnels dir refused at startup; rollup " +
      "surfaces capped sessions as n_truncated, never as exact census") {
    val base = Files.createTempDirectory("census-legacy").toString
    // a pre-upgrade funnel output: no `truncated` column — appending
    // 6-column files would make old rows read truncated as null and
    // get silently dropped by filters downstream
    Seq((1L, 0L, 10L, 3L, 1L))
      .toDF("user_id", "session_start", "session_end", "n_events",
        "max_step")
      .write.parquet(s"$base/funnels")
    assert(SessionCensusCli.legacyFunnelDir(spark, s"$base/funnels"))
    assert(!SessionCensusCli.legacyFunnelDir(spark, s"$base/absent"))
    val empty = Files.createTempDirectory("census-empty").toString
    assert(!SessionCensusCli.legacyFunnelDir(spark, empty)) // fresh dir
    val cfg = SessionCensusCli.parseArgs(Array("--input", s"$base/in",
      "--sessions", s"$base/sess", "--checkpoint", s"$base/ck",
      "--funnels", s"$base/funnels", "--funnel-steps", "a,b"))
      .toOption.get
    // refused BEFORE any query starts or checkpoint mutates
    intercept[SessionCensusCli.LegacyFunnelDirException] {
      SessionCensusCli.run(spark, cfg)
    }
    assert(!Files.exists(Paths.get(s"$base/ck")))

    // rollup: u1 capped at max_step=1 (lower bound) of a 3-step
    // funnel, u2 genuinely finished. Steps 2-3's true census is in
    // [sessions, sessions + n_truncated]; the capped session is never
    // silently folded in or out without the marker.
    val closed = Seq((1L, 0L, 10L, 5L, 1L, true),
        (2L, 0L, 10L, 5L, 3L, false))
      .toDF("user_id", "session_start", "session_end", "n_events",
        "max_step", "truncated")
    val rep = graft.analytics.StreamingAnalytics
      .sessionFunnelRollup(closed, Seq("a", "b", "c"))
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(rep == Seq((1, "a", 2L, 0L), (2, "b", 1L, 1L),
      (3, "c", 1L, 1L)))
    // pre-cap (5-column) input reads as all-untruncated
    val old = graft.analytics.StreamingAnalytics.sessionFunnelRollup(
        spark.read.parquet(s"$base/funnels"), Seq("a", "b"))
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(old == Seq((1, "a", 1L, 0L), (2, "b", 0L, 0L)))
  }

  test("parseArgs: contract errors and round-trip") {
    import SessionCensusCli.parseArgs
    assert(parseArgs(Array("--input", "a")).isLeft) // missing required
    assert(parseArgs(Array("--frobnicate", "x")).isLeft) // unknown flag
    assert(parseArgs(Array("--input")).isLeft) // missing value
    val req = Array("--input", "a", "--sessions", "b", "--checkpoint", "c")
    assert(parseArgs(req :+ "--gap-sec" :+ "0").isLeft) // bad gap
    assert(parseArgs(req :+ "--gap-sec" :+ "abc").isLeft) // non-numeric
    assert(parseArgs(req ++ Array("--verdicts", "v", "--from", "x",
      "--to", "x")).isLeft) // from == to
    assert(parseArgs(req ++ Array("--funnels", "f")).isLeft) // no steps
    assert(parseArgs(req ++ Array("--funnels", "f", "--funnel-steps",
      "a,a")).isLeft) // duplicate steps
    assert(parseArgs(req ++ Array("--funnel-steps", "a,b")).isLeft) // no dir
    assert(parseArgs(req :+ "--max-stamps" :+ "0").isLeft) // cap must be >= 1
    // an over-ceiling cap must fail HERE ([config]/exit-10), not as a
    // raw require mid-launch after the sessions query started
    assert(parseArgs(req :+ "--max-stamps" :+
      (graft.analytics.StreamingAnalytics.MaxStampsCeiling + 1).toString).isLeft)
    assert(parseArgs(req :+ "--max-stamps" :+
      graft.analytics.StreamingAnalytics.MaxStampsCeiling.toString).isRight)
    val ok = parseArgs(req ++ Array("--gap-sec", "60", "--watermark",
      "5 minutes", "--verdicts", "v", "--from", "a", "--to", "b",
      "--window-sec", "120", "--funnels", "f", "--funnel-steps", "a,b",
      "--growth", "g", "--paths", "p", "--transitions", "t",
      "--state-store", "rocksdb", "--max-stamps", "5000"))
    assert(ok == Right(SessionCensusCli.CensusConfig("a", "b", "c", 60L,
      "5 minutes", Some("v"), "a", "b", 120L, Some("f"), Seq("a", "b"),
      Some("g"), Some("p"), Some("t"), Some("rocksdb"), 5000)))
  }
}
