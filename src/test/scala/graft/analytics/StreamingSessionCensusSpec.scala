package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming session census (q236's streaming counterpart): closed
  * sessions carry their ENTRY type, emitted exactly once on watermark
  * ripening, and [[StreamingAnalytics.sessionBounceRollup]] over the
  * emitted set equals the batch [[Analytics.sessionBounceRate]] on the
  * same ripe events.
  *
  * Times sit on a base offset — the initial watermark is epoch 0, and
  * an event AT the watermark is dropped as late (the
  * StreamingSessionSpec convention). */
class StreamingSessionCensusSpec extends SparkSpec {
  import spark.implicits._

  private val gapUs = 10000000L // 10 s
  private val s = 1000000L // µs per second
  private val B = 1000 * s // base offset: keep every event past epoch 0

  private def stream(input: MemoryStream[(Long, Long, Long, String)]) = {
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_id"), col("_4").as("event_type"))
    StreamingAnalytics.sessionCensusStream(events, "user_id",
      "event_type", "ts", "event_id", gapUs, watermark = "0 seconds")
  }

  test("sessionCensusStream: entry tracked across batches; rollup equals batch q236") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = stream(input).writeStream.outputMode("append")
      .format("memory").queryName("census_test").start()
    def closed(): Set[(Long, Long, Long, Long, Long, String)] =
      spark.table("census_test")
        .as[(Long, Long, Long, Long, Long, String)].collect().toSet

    // u1: view then purchase 5 s apart (one session, entry = view);
    // u2: a lone click (a bounce); u3: purchase then view 40 s later
    // (TWO sessions, both bounces, entries purchase and view)
    val live = Seq(
      (1L, B, 10L, "view"), (1L, B + 5 * s, 11L, "purchase"),
      (2L, B + 2 * s, 20L, "click"),
      (3L, B + 1 * s, 30L, "purchase"), (3L, B + 41 * s, 31L, "view"))
    input.addData(live: _*)
    q.processAllAvailable()
    // sentinel pushes the watermark past every close point; the drain's
    // follow-up batch fires the event-time timeouts
    input.addData((99L, B + 500 * s, 990L, "view"))
    q.processAllAvailable()
    val want = Set(
      (1L, B, B + 5 * s, 2L, 5 * s, "view"),
      (2L, B + 2 * s, B + 2 * s, 1L, 0L, "click"),
      (3L, B + 1 * s, B + 1 * s, 1L, 0L, "purchase"),
      (3L, B + 41 * s, B + 41 * s, 1L, 0L, "view"))
    assert(closed() == want)

    // exactly-once: another sentinel trigger must re-emit nothing
    input.addData((99L, B + 501 * s, 991L, "view"))
    q.processAllAvailable()
    assert(closed() == want)

    // the census fold over the emitted set equals the batch q236 on
    // the same (non-sentinel) events — column for column
    val streamCensus = StreamingAnalytics.sessionBounceRollup(
      spark.table("census_test"))
      .as[(String, Long, Long, Long)].collect().toSeq
    val batch = Analytics.sessionBounceRate(
      live.toDF("user_id", "__us", "event_id", "event_type")
        .select(col("user_id"), timestamp_micros(col("__us")).as("ts"),
          col("event_id"), col("event_type")),
      "user_id", "event_type", "ts", "event_id", gapUs)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(streamCensus == batch)
    assert(batch == Seq(("click", 1L, 1L, 1000000L),
      ("purchase", 1L, 1L, 1000000L), ("view", 2L, 1L, 500000L)))
    q.stop()
  }

  test("sessionCensusStream: a late in-watermark event takes over the entry") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_id"), col("_4").as("event_type"))
    val q = StreamingAnalytics.sessionCensusStream(events, "user_id",
      "event_type", "ts", "event_id", gapUs, watermark = "60 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("census_ooo").start()

    // the purchase arrives FIRST; the session-opening view arrives a
    // batch later (late but inside the 60 s watermark) and, being
    // (t, id)-least, must take over as the entry; a second late event
    // BRIDGES toward the purchase so all three fuse into one session
    input.addData((1L, B + 8 * s, 12L, "purchase"))
    q.processAllAvailable()
    input.addData((1L, B, 10L, "view"), (1L, B + 4 * s, 11L, "click"))
    q.processAllAvailable()
    // push the watermark far past the close point, then trigger again
    input.addData((99L, B + 500 * s, 990L, "view"))
    q.processAllAvailable()
    input.addData((99L, B + 501 * s, 991L, "view"))
    q.processAllAvailable()
    val got = spark.table("census_ooo")
      .as[(Long, Long, Long, Long, Long, String)].collect().toSet
    assert(got == Set((1L, B, B + 8 * s, 3L, 8 * s, "view")))
    q.stop()
  }
}
