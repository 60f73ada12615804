package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming session paths (q197's streaming counterpart): closed
  * sessions carry their full ordered path, emitted exactly once at
  * watermark ripening, and [[StreamingAnalytics.sessionPathsRollup]]
  * equals the batch [[Analytics.sessionPaths]] top-k census on the
  * same ripe events. */
class StreamingSessionPathsSpec extends SparkSpec {
  import spark.implicits._

  private val gapUs = 10000000L // 10 s
  private val s = 1000000L
  private val B = 1000 * s

  test("sessionPathsStream: ordered paths at close; rollup equals batch q197") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_id"), col("_4").as("event_type"))
    val q = StreamingAnalytics.sessionPathsStream(events, "user_id",
      "event_type", "ts", "event_id", gapUs, watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("paths_test").start()
    def closed(): Set[(Long, Long, Long, Long, String)] =
      spark.table("paths_test")
        .as[(Long, Long, Long, Long, String)].collect().toSet

    // u1 and u2 share the view>click>purchase path; u3 bounces; u1's
    // SECOND session (40 s later) is view alone
    val live = Seq(
      (1L, B, 10L, "view"), (1L, B + 3 * s, 11L, "click"),
      (1L, B + 6 * s, 12L, "purchase"),
      (1L, B + 50 * s, 13L, "view"),
      (2L, B + 1 * s, 20L, "view"), (2L, B + 4 * s, 21L, "click"),
      (2L, B + 7 * s, 22L, "purchase"),
      (3L, B + 2 * s, 30L, "error"))
    input.addData(live: _*)
    q.processAllAvailable()
    input.addData((99L, B + 500 * s, 990L, "view"))
    q.processAllAvailable()
    val want = Set(
      (1L, B, B + 6 * s, 3L, "view>click>purchase"),
      (1L, B + 50 * s, B + 50 * s, 1L, "view"),
      (2L, B + 1 * s, B + 7 * s, 3L, "view>click>purchase"),
      (3L, B + 2 * s, B + 2 * s, 1L, "error"))
    assert(closed() == want)

    // exactly-once
    input.addData((99L, B + 501 * s, 991L, "view"))
    q.processAllAvailable()
    assert(closed() == want)

    // top-k parity with the batch operator on the same events
    val streamTop = StreamingAnalytics.sessionPathsRollup(
      spark.table("paths_test"), k = 3)
      .as[(String, Long)].collect().toSeq
    val batch = Analytics.sessionPaths(
      live.toDF("user_id", "__us", "event_id", "event_type")
        .select(col("user_id"), timestamp_micros(col("__us")).as("ts"),
          col("event_id"), col("event_type")),
      "user_id", "event_type", "ts", "event_id", gapUs, k = 3)
      .as[(String, Long)].collect().toSeq
    assert(streamTop == batch)
    assert(batch == Seq(("view>click>purchase", 2L), ("error", 1L),
      ("view", 1L)))
    q.stop()
  }

  test("sessionPathsStream: a late in-watermark event inserts into the path middle") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_id"), col("_4").as("event_type"))
    val q = StreamingAnalytics.sessionPathsStream(events, "user_id",
      "event_type", "ts", "event_id", gapUs, watermark = "60 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("paths_ooo").start()

    // view and purchase arrive first; the MIDDLE click lands a batch
    // later — the rendered path must read view>click>purchase, which
    // an eager per-batch concat could never produce
    input.addData((1L, B, 10L, "view"), (1L, B + 8 * s, 12L, "purchase"))
    q.processAllAvailable()
    input.addData((1L, B + 4 * s, 11L, "click"))
    q.processAllAvailable()
    input.addData((99L, B + 500 * s, 990L, "view"))
    q.processAllAvailable()
    input.addData((99L, B + 501 * s, 991L, "view"))
    q.processAllAvailable()
    val got = spark.table("paths_ooo")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got == Set((1L, B, B + 8 * s, 3L, "view>click>purchase")))
    q.stop()
  }

  test("sessionPathsStream: maxStamps bounds a never-gapping key's state; " +
    "path is the deterministic prefix with an explicit >… marker") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_id"), col("_4").as("event_type"))
    val q = StreamingAnalytics.sessionPathsStream(events, "user_id",
      "event_type", "ts", "event_id", gapUs, watermark = "0 seconds",
      maxStamps = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("paths_cap").start()

    // u1 never gaps: 10 events 1 s apart (gap is 10 s), fed across
    // THREE micro-batches so the cap must hold through state merges,
    // not just within one batch's fold
    val tys = "abcdefghij".map(_.toString)
    def ev(i: Int) = (1L, B + i * s, 100L + i, tys(i))
    input.addData((0 until 4).map(ev): _*)
    q.processAllAvailable()
    input.addData((4 until 7).map(ev): _*)
    q.processAllAvailable()
    input.addData((7 until 10).map(ev): _*)
    q.processAllAvailable()
    // ripen: a sentinel far past end + gap
    input.addData((99L, B + 500 * s, 990L, "view"))
    q.processAllAvailable()
    input.addData((99L, B + 501 * s, 991L, "view"))
    q.processAllAvailable()
    val got = spark.table("paths_cap")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    // n_events counts all 10; the path is the render-order PREFIX of
    // the 4 kept stamps plus the explicit truncation marker
    assert(got == Set((1L, B, B + 9 * s, 10L, "a>b>c>d>…")))
    q.stop()
  }

  test("sessionPathsStream: a late in-watermark middle event enters the " +
    "capped prefix deterministically (smallest-k is merge-stable)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_id"), col("_4").as("event_type"))
    val q = StreamingAnalytics.sessionPathsStream(events, "user_id",
      "event_type", "ts", "event_id", gapUs, watermark = "60 seconds",
      maxStamps = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("paths_cap_ooo").start()

    // t=0,2,4,6,8 arrive first (5 > 2×cap, so the amortized cut fires:
    // keep a,b); then t=1 and t=3 land LATE but in-watermark — x(1)
    // belongs INSIDE the final prefix, so the rendered head must be
    // the two (t,id,ty)-least of ALL seven events: a(0), x(1)
    input.addData((1L, B, 10L, "a"), (1L, B + 2 * s, 12L, "b"),
      (1L, B + 4 * s, 14L, "c"), (1L, B + 6 * s, 16L, "d"),
      (1L, B + 8 * s, 18L, "e"))
    q.processAllAvailable()
    input.addData((1L, B + 1 * s, 11L, "x"), (1L, B + 3 * s, 13L, "y"))
    q.processAllAvailable()
    input.addData((99L, B + 500 * s, 990L, "view"))
    q.processAllAvailable()
    input.addData((99L, B + 501 * s, 991L, "view"))
    q.processAllAvailable()
    val got = spark.table("paths_cap_ooo")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got == Set((1L, B, B + 8 * s, 7L, "a>x>…")))
    q.stop()
  }

  test("sessionPathsStream: the capped prefix is IDENTICAL under " +
    "arbitrary arrival orders and batch splits (merge-stability, " +
    "property-style over seeded permutations)") {
    implicit val sqlCtx = spark.sqlContext
    // nine events, cap 3: the truth is always the three (t, id, ty)-
    // least events rendered in order plus the marker, no matter how
    // arrival interleaves or where the amortized cut fires
    val events = (0 until 9).map(i =>
      (1L, B + i * s, 10L + i, ('a' + i).toChar.toString))
    val want = Set((1L, B, B + 8 * s, 9L, "a>b>c>…"))
    for (seed <- 0 until 4) {
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(events)
      val batches = shuffled.grouped(3).toSeq // three 3-event batches
      val input = MemoryStream[(Long, Long, Long, String)]
      val df = input.toDF()
        .select(col("_1").as("user_id"),
          timestamp_micros(col("_2")).as("ts"),
          col("_3").as("event_id"), col("_4").as("event_type"))
      val q = StreamingAnalytics.sessionPathsStream(df, "user_id",
        "event_type", "ts", "event_id", gapUs, watermark = "60 seconds",
        maxStamps = 3)
        .writeStream.outputMode("append")
        .format("memory").queryName(s"paths_perm_$seed").start()
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      input.addData((99L, B + 500 * s, 990L, "view"))
      q.processAllAvailable()
      input.addData((99L, B + 501 * s, 991L, "view"))
      q.processAllAvailable()
      val got = spark.table(s"paths_perm_$seed")
        .as[(Long, Long, Long, Long, String)].collect().toSet
      assert(got == want, s"seed $seed (arrival ${shuffled.map(_._4)}): $got")
      q.stop()
    }
  }
}
