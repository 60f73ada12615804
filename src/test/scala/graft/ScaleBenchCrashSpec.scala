package graft

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[ScaleBench.crashRecoveryCounts]] — the machinery behind the
  * `census_crash_wall`/`census_crash_match` decade rows: a clean drain
  * and a crash-torn drain (stop after 2 committed batches, delete the
  * newest WAL commit + its `.crc`, restart) of the SAME chronological
  * corpus must close identical session counts. The provider is set to
  * RocksDB exactly as the ScaleBench probe does, so the replayed batch
  * restores through snapshot+changelog, not per-version .delta files. */
class ScaleBenchCrashSpec extends SparkSpec {

  test("crashRecoveryCounts: torn-commit recovery equals the clean run " +
    "under RocksDB (census_crash_match == 1 at fixture scale)") {
    val s = 1000000L
    val B = 1000L * s
    // 8 users × 3-event gapped sessions + a far-future sentinel that
    // ripens everything: enough files (8 parts) that stopping after 2
    // batches leaves a real remainder for the post-crash restart
    val rows = (1L to 8L).flatMap { u =>
      Seq((u, u * 100L, B + u * s, "view"),
        (u, u * 100L + 1L, B + u * s + 2 * s, "click"),
        (u, u * 100L + 2L, B + u * s + 4 * s, "purchase"))
    } :+ ((99L, 990L, B + 5000L * s, "view"))
    import spark.implicits._
    val ev = rows.toDF("user_id", "event_id", "__us", "event_type")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("__us")).as("ts"), col("event_type"))
    val inDir = Files.createTempDirectory("sbcrash-in").toString
    ops.JsonStage.stageFrame(ev, inDir, orderBy = "ts", parts = 8)

    val scratch = Files.createTempDirectory("sbcrash-run").toString
    val providerConf = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerConf)
    spark.conf.set(providerConf, ops.StateStores.providerClass("rocksdb"))
    try {
      val (clean, recovered) = ScaleBench.crashRecoveryCounts(spark,
        inDir, scratch, gapUs = 10L * s, watermark = "0 seconds")
      assert(clean == 8L, s"clean run must close the 8 sessions: $clean")
      assert(recovered == clean,
        s"torn-commit recovery diverged: recovered=$recovered clean=$clean")
      // the crash checkpoint really ran RocksDB (zip/changelog
      // artifacts) — otherwise this proves the wrong provider
      import scala.jdk.CollectionConverters._
      val state = java.nio.file.Paths.get(s"$scratch/ckCrash/state")
      assert(Files.exists(state), "crash-run state dir must exist")
      val names = Files.walk(state).iterator().asScala
        .map(_.getFileName.toString).toSet
      assert(names.exists(n => n.endsWith(".zip") || n.endsWith(".changelog")),
        s"expected RocksDB artifacts in crash checkpoint, got $names")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerConf, v)
        case None => spark.conf.unset(providerConf)
      }
    }
  }
}
