package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming journey transitions (q137's streaming counterpart): edges
  * emitted exactly once when their TO event ripens, carry survives
  * across micro-batches and silences, and
  * [[StreamingAnalytics.transitionsRollup]] equals the batch
  * [[Analytics.eventTransitions]] matrix on the same ripe events. */
class StreamingTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private val s = 1000000L
  private val B = 1000 * s

  test("transitionsStream: cross-batch carry; rollup equals batch q137") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_id"), col("_4").as("event_type"))
    val q = StreamingAnalytics.transitionsStream(events, "user_id",
      "event_type", "ts", "event_id", watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_test").start()
    def edges(): Set[(Long, String, String, Long, Long)] =
      spark.table("trans_test")
        .as[(Long, String, String, Long, Long)].collect().toSet

    // u1: view → click in batch 1; the click → purchase edge CROSSES
    // batches (the carry); u2: a lone event — no edge
    input.addData((1L, B, 10L, "view"), (1L, B + 2 * s, 11L, "click"),
      (2L, B + 1 * s, 20L, "view"))
    q.processAllAvailable()
    input.addData((1L, B + 60 * s, 12L, "purchase"))
    q.processAllAvailable()
    input.addData((99L, B + 500 * s, 990L, "view"))
    q.processAllAvailable()
    val want = Set(
      (1L, "view", "click", B + 2 * s, 11L),
      (1L, "click", "purchase", B + 60 * s, 12L))
    assert(edges() == want)

    // exactly-once
    input.addData((99L, B + 501 * s, 991L, "view"))
    q.processAllAvailable()
    assert(edges() == want)

    // matrix parity with the batch operator on the same
    // (non-sentinel) events
    val live = Seq(
      (1L, B, 10L, "view"), (1L, B + 2 * s, 11L, "click"),
      (2L, B + 1 * s, 20L, "view"), (1L, B + 60 * s, 12L, "purchase"))
    val streamMatrix = StreamingAnalytics.transitionsRollup(
      spark.table("trans_test"))
      .as[(String, String, Long)].collect().toSeq
    val batch = Analytics.eventTransitions(
      live.toDF("user_id", "__us", "event_id", "event_type")
        .select(col("user_id"), timestamp_micros(col("__us")).as("ts"),
          col("event_id"), col("event_type")),
      "user_id", "event_type", "ts", "event_id")
      .as[(String, String, Long)].collect().toSeq
    assert(streamMatrix == batch)
    assert(batch == Seq(("click", "purchase", 1L), ("view", "click", 1L)))
    q.stop()
  }

  test("transitionsStream: in-watermark disorder restores the true adjacency") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String)]
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_id"), col("_4").as("event_type"))
    val q = StreamingAnalytics.transitionsStream(events, "user_id",
      "event_type", "ts", "event_id", watermark = "60 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_ooo").start()

    // view and purchase arrive first; the MIDDLE click arrives a batch
    // later (in-watermark): the emitted edges must be view→click and
    // click→purchase — an eager fold would have locked view→purchase
    input.addData((1L, B, 10L, "view"), (1L, B + 8 * s, 12L, "purchase"))
    q.processAllAvailable()
    input.addData((1L, B + 4 * s, 11L, "click"))
    q.processAllAvailable()
    input.addData((99L, B + 500 * s, 990L, "view"))
    q.processAllAvailable()
    input.addData((99L, B + 501 * s, 991L, "view"))
    q.processAllAvailable()
    val got = spark.table("trans_ooo")
      .as[(Long, String, String, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, "view", "click", B + 4 * s, 11L),
      (1L, "click", "purchase", B + 8 * s, 12L)))
    q.stop()
  }
}
