package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming abandonment verdicts (q241's streaming counterpart):
  * per-fromType verdicts emitted exactly once when the budget window
  * ripens below the watermark, and
  * [[StreamingAnalytics.abandonmentRollup]] over the emitted set
  * equals the batch [[Analytics.abandonmentCensus]] on the same ripe
  * events. */
class StreamingAbandonmentSpec extends SparkSpec {
  import spark.implicits._

  private val windowUs = 10000000L // 10 s budget
  private val s = 1000000L
  private val B = 1000 * s // base offset: keep every event past epoch 0

  private def mkEvents(input: MemoryStream[(Long, Long, Long, String)]) =
    input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_id"), col("_4").as("event_type"))

  test("abandonmentStream: verdicts at budget ripening; rollup equals batch q241") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = StreamingAnalytics.abandonmentStream(mkEvents(input),
      "user_id", "event_type", "ts", "event_id", "view", "purchase",
      windowUs, watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("abd_test").start()
    def verdicts(): Set[(Long, Long, Long, Boolean)] =
      spark.table("abd_test")
        .as[(Long, Long, Long, Boolean)].collect().toSet

    // u1: rescued view then an abandoned view; u2: rescue EXACTLY at
    // the budget boundary (B+1 → B+11, inclusive); u3: same-timestamp
    // rescue via the id tiebreak; u4: never converts. A click rides
    // along to prove the two-type filter.
    val live = Seq(
      (1L, B, 10L, "view"), (1L, B + 5 * s, 11L, "purchase"),
      (1L, B + 20 * s, 12L, "view"),
      (2L, B + 1 * s, 20L, "view"), (2L, B + 11 * s, 21L, "purchase"),
      (3L, B + 2 * s, 30L, "view"), (3L, B + 2 * s, 31L, "purchase"),
      (4L, B + 3 * s, 40L, "view"),
      (4L, B + 4 * s, 41L, "click"))
    input.addData(live: _*)
    q.processAllAvailable()
    // sentinel (toType only — contributes no verdict) pushes the
    // watermark past every budget; the drain fires the timeouts
    input.addData((99L, B + 500 * s, 990L, "purchase"))
    q.processAllAvailable()
    val want = Set(
      (1L, 10L, B, false), (1L, 12L, B + 20 * s, true),
      (2L, 20L, B + 1 * s, false),
      (3L, 30L, B + 2 * s, false),
      (4L, 40L, B + 3 * s, true))
    assert(verdicts() == want)

    // exactly-once under a further trigger
    input.addData((99L, B + 501 * s, 991L, "purchase"))
    q.processAllAvailable()
    assert(verdicts() == want)

    // census parity with the batch q241 operator on the same
    // (non-sentinel) events
    val streamCensus = StreamingAnalytics.abandonmentRollup(
      spark.table("abd_test"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    val batch = Analytics.abandonmentCensus(
      live.toDF("user_id", "__us", "event_id", "event_type")
        .select(col("user_id"), timestamp_micros(col("__us")).as("ts"),
          col("event_id"), col("event_type")),
      "user_id", "event_type", "ts", "event_id", "view", "purchase",
      windowUs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamCensus == batch)
    assert(batch == Seq((5L, 2L, 400000L, 2L)))
    q.stop()
  }

  test("abandonmentStream: a late in-watermark rescue flips nothing — it lands first") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = StreamingAnalytics.abandonmentStream(mkEvents(input),
      "user_id", "event_type", "ts", "event_id", "view", "purchase",
      windowUs, watermark = "60 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("abd_ooo").start()

    // both views arrive first; u1's rescue arrives a BATCH LATER (late
    // in processing order, inside the 60 s watermark, inside the
    // budget) — the verdict must wait for ripening and come out clean
    input.addData((1L, B, 10L, "view"), (2L, B, 20L, "view"))
    q.processAllAvailable()
    input.addData((1L, B + 8 * s, 11L, "purchase"))
    q.processAllAvailable()
    input.addData((99L, B + 500 * s, 990L, "purchase"))
    q.processAllAvailable()
    input.addData((99L, B + 501 * s, 991L, "purchase"))
    q.processAllAvailable()
    val got = spark.table("abd_ooo")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 10L, B, false), (2L, 20L, B, true)))
    q.stop()
  }
}
