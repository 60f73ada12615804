package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming session funnel (q186's streaming counterpart): closed
  * sessions carry the greedy-fold furthest step, emitted exactly once
  * at watermark ripening, and
  * [[StreamingAnalytics.sessionFunnelRollup]] equals the batch
  * [[Analytics.sessionFunnel]] report on the same ripe events. */
class StreamingSessionFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val gapUs = 10000000L // 10 s
  private val s = 1000000L
  private val B = 1000 * s
  private val steps = Seq("view", "click", "purchase")

  test("sessionFunnelStream: greedy fold at close; rollup equals batch q186") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)] // (user, µs, type)
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_type"))
    val q = StreamingAnalytics.sessionFunnelStream(events, "user_id",
      "event_type", "ts", steps, gapUs, watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_test").start()
    def closed(): Set[(Long, Long, Long, Long, Long, Boolean)] =
      spark.table("funnel_test")
        .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSet

    // u1: the full ordered funnel (a non-step 'signup' rides along —
    // it chains the session but must not disturb the fold);
    // u2: purchase BEFORE view — order gates the fold at step 1;
    // u3: view and click at the SAME instant — no strictly-later
    // advance, step stays 1; u4: no step events at all → step 0
    val live = Seq(
      (1L, B, "view"), (1L, B + 2 * s, "signup"),
      (1L, B + 4 * s, "click"), (1L, B + 8 * s, "purchase"),
      (2L, B + 1 * s, "purchase"), (2L, B + 5 * s, "view"),
      (3L, B + 2 * s, "view"), (3L, B + 2 * s, "click"),
      (4L, B + 3 * s, "signup"))
    input.addData(live: _*)
    q.processAllAvailable()
    input.addData((99L, B + 500 * s, "signup"))
    q.processAllAvailable()
    val want = Set(
      (1L, B, B + 8 * s, 4L, 3L, false),
      (2L, B + 1 * s, B + 5 * s, 2L, 1L, false),
      (3L, B + 2 * s, B + 2 * s, 2L, 1L, false),
      (4L, B + 3 * s, B + 3 * s, 1L, 0L, false))
    assert(closed() == want)

    // exactly-once
    input.addData((99L, B + 501 * s, "signup"))
    q.processAllAvailable()
    assert(closed() == want)

    // report parity with the batch q186 operator on the same
    // (non-sentinel) events
    val fullReport = StreamingAnalytics.sessionFunnelRollup(
      spark.table("funnel_test"), steps)
      .as[(Int, String, Long, Long)].collect().toSeq
    // no session hit the cap here, so every step's unknown-count is 0
    // and the sessions column is the EXACT batch census
    assert(fullReport.forall(_._4 == 0L), s"n_truncated: $fullReport")
    val streamReport = fullReport.map(r => (r._1, r._2, r._3))
    val batch = Analytics.sessionFunnel(
      live.zipWithIndex.map { case ((u, t, ty), i) => (u, t, i.toLong, ty) }
        .toDF("user_id", "__us", "event_id", "event_type")
        .select(col("user_id"), timestamp_micros(col("__us")).as("ts"),
          col("event_id"), col("event_type")),
      "user_id", "event_type", "ts", "event_id", steps, gapUs)
      .as[(Int, String, Long)].collect().toSeq
    assert(streamReport == batch)
    assert(batch == Seq((1, "view", 3L), (2, "click", 1L),
      (3, "purchase", 1L)))
    q.stop()
  }

  test("sessionFunnelStream: a late in-watermark step completes the fold") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_type"))
    val q = StreamingAnalytics.sessionFunnelStream(events, "user_id",
      "event_type", "ts", steps, gapUs, watermark = "60 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_ooo").start()

    // view and purchase arrive first; the BRIDGING click (late in
    // processing order, in-watermark, strictly between them) must
    // complete the fold to step 3 — an eager per-batch fold would have
    // locked the session at step 1
    input.addData((1L, B, "view"), (1L, B + 8 * s, "purchase"))
    q.processAllAvailable()
    input.addData((1L, B + 4 * s, "click"))
    q.processAllAvailable()
    input.addData((99L, B + 500 * s, "signup"))
    q.processAllAvailable()
    input.addData((99L, B + 501 * s, "signup"))
    q.processAllAvailable()
    val got = spark.table("funnel_ooo")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, B, B + 8 * s, 3L, 3L, false)))
    q.stop()
  }

  test("sessionFunnelStream: maxStamps bounds a never-gapping key's " +
    "step buffer; the fold becomes the documented prefix fold") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_type"))
    val q = StreamingAnalytics.sessionFunnelStream(events, "user_id",
      "event_type", "ts", steps, gapUs, watermark = "0 seconds",
      maxStamps = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_cap").start()

    // u1 never gaps and emits 6 step events across two micro-batches
    // (past the 2x amortization threshold); the close-time fold runs
    // over the (t, idx)-least 2 (view@0, click@2), so it reaches step
    // 2 — the prefix fold's exact state after the kept events, a lower
    // bound on the true step 3, SURFACED by truncated=true
    input.addData((1L, B, "view"), (1L, B + 2 * s, "click"),
      (1L, B + 4 * s, "purchase"))
    q.processAllAvailable()
    input.addData((1L, B + 6 * s, "view"), (1L, B + 8 * s, "click"),
      (1L, B + 10 * s, "purchase"))
    q.processAllAvailable()
    input.addData((99L, B + 500 * s, "signup"))
    q.processAllAvailable()
    input.addData((99L, B + 501 * s, "signup"))
    q.processAllAvailable()
    val got = spark.table("funnel_cap")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSet
    // n_events still counts all 6; max_step is the prefix fold's 2,
    // and the cap says so in the truncated column
    assert(got == Set((1L, B, B + 10 * s, 6L, 2L, true)))
    q.stop()
  }

  test("capped stream rollup == batch sessionFunnelCapped (q251's " +
    "operator), and the bound brackets the uncapped truth") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_type"))
    val q = StreamingAnalytics.sessionFunnelStream(events, "user_id",
      "event_type", "ts", steps, gapUs, watermark = "0 seconds",
      maxStamps = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_cap_parity").start()

    // u1: 5 step events — past the 2·maxStamps = 4 amortized-cut
    // threshold, so the cut fires: prefix-2 fold reaches 2, the true
    // fold reaches 3, truncated=true; u2: 2 step events (exact fold,
    // step 2, no cut); u3: one step event (exact, step 1)
    val live = Seq(
      (1L, B, "view"), (1L, B + 1 * s, "click"),
      (1L, B + 2 * s, "purchase"), (1L, B + 3 * s, "view"),
      (1L, B + 4 * s, "click"),
      (2L, B, "view"), (2L, B + 2 * s, "click"),
      (3L, B + 1 * s, "view"))
    input.addData(live: _*)
    q.processAllAvailable()
    input.addData((99L, B + 500 * s, "signup"))
    q.processAllAvailable()

    val streamed = StreamingAnalytics.sessionFunnelRollup(
      spark.table("funnel_cap_parity"), steps)
      .as[(Int, String, Long, Long)].collect().toSeq
    val batchEvents = live.zipWithIndex
      .map { case ((u, t, ty), i) => (u, t, i.toLong, ty) }
      .toDF("user_id", "__us", "event_id", "event_type")
      .select(col("user_id"), timestamp_micros(col("__us")).as("ts"),
        col("event_id"), col("event_type"))
    val batch = StreamingAnalytics.sessionFunnelRollup(
      Analytics.sessionFunnelCapped(batchEvents, "user_id",
        "event_type", "ts", "event_id", steps, gapUs, maxStamps = 2),
      steps).as[(Int, String, Long, Long)].collect().toSeq
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    // the split itself: u1 truncated below step 3 => n_truncated = 1
    // there; u1+u2 reach step 2 exactly
    assert(streamed == Seq((1, "view", 3L, 0L), (2, "click", 2L, 0L),
      (3, "purchase", 0L, 1L)))
    // bound property vs the UNCAPPED batch truth: at every step,
    // capped sessions <= true sessions <= capped + n_truncated
    val uncapped = Analytics.sessionFunnel(batchEvents, "user_id",
      "event_type", "ts", "event_id", steps, gapUs)
      .as[(Int, String, Long)].collect().toSeq
    streamed.zip(uncapped).foreach { case ((st, _, lo, unk), (st2, _, tru)) =>
      assert(st == st2)
      assert(lo <= tru && tru <= lo + unk,
        s"step $st: bound [$lo, ${lo + unk}] must bracket $tru")
    }
    q.stop()
  }
}
