package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming last-touch attribution (flatMapGroupsWithState +
  * event-time timeout): credits carried ACROSS micro-batches, emitted
  * exactly once when the watermark passes the conversion, in-watermark
  * disorder re-ordered before any credit is decided, and the emitted
  * credits equal to the batch [[Analytics.attributionLastTouch]] rollup
  * over the same events.
  *
  * Times sit on a base offset (initial watermark is epoch 0; an event
  * at the watermark is dropped as late), and `processAllAvailable`
  * drains the timeout batches a watermark advance fires. */
class StreamingAttributionSpec extends SparkSpec {
  import spark.implicits._

  private val s = 1000000L // µs per second
  private val B = 1000 * s // base offset: keep every event past epoch 0

  // (user, epoch µs, event id, type, value)
  private def stream() = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String, Double)]
    val events = input.toDF()
      .select(col("_1").as("user_id"), timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_id"), col("_4").as("event_type"),
        col("_5").as("value"))
    (input, events)
  }

  test("attributionStream: cross-batch carry, disorder-safe, exactly-once") {
    val (input, events) = stream()
    val q = StreamingAnalytics.attributionStream(events, "user_id",
        "event_type", "ts", "event_id", "value", watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_test").start()
    def got(): Set[(Long, Long, String, Double)] =
      spark.table("attr_test")
        .as[(Long, Long, String, Double)].collect().toSet

    // batch 1: u1's touches only; u2 converts with NO prior touch.
    // The conversion at B+3 ripens only when the watermark passes it —
    // the sentinel (user 99) pushes it to B+50.
    input.addData(
      (1L, B + 1 * s, 1L, "view", 0.0),
      (1L, B + 5 * s, 2L, "click", 0.0),
      (2L, B + 3 * s, 1L, "purchase", 7.5),
      (99L, B + 50 * s, 1L, "view", 0.0))
    q.processAllAvailable()
    assert(got() == Set((2L, 1L, "direct", 7.5)),
      "touchless conversion credits 'direct'; u1 has no conversion yet")

    // batch 2 (all above the B+50 watermark — anything below it is
    // dropped as late upstream): u1 converts at B+60, crediting the
    // CLICK CARRIED FROM BATCH 1; then an IN-BATCH DISORDERED view —
    // arriving AFTER the B+75 purchase but timestamped B+68 — must be
    // that purchase's credited touch (event time decides, not arrival
    // order). Sentinel ripens all three.
    input.addData(
      (1L, B + 60 * s, 3L, "purchase", 10.0),
      (1L, B + 75 * s, 5L, "purchase", 4.0),
      (1L, B + 68 * s, 4L, "view", 0.0),
      (99L, B + 200 * s, 2L, "view", 0.0))
    q.processAllAvailable()
    val want = Set(
      (2L, 1L, "direct", 7.5),
      (1L, 3L, "click", 10.0), // batch 1's click carried across batches
      (1L, 5L, "view", 4.0))   // the disordered B+68 view, not the click
    assert(got() == want)

    // batch 3: sentinel only — nothing re-emits (exactly-once)
    input.addData((99L, B + 201 * s, 3L, "view", 0.0))
    q.processAllAvailable()
    assert(got() == want, "a credited conversion must emit exactly once")

    // batch parity: the streamed credits, rolled up, equal the batch
    // operator's rollup over the same (non-sentinel) events
    val batch = Analytics.attributionLastTouch(
      Seq((1L, B + 1 * s, 1L, "view", 0.0), (1L, B + 5 * s, 2L, "click", 0.0),
        (2L, B + 3 * s, 1L, "purchase", 7.5),
        (1L, B + 60 * s, 3L, "purchase", 10.0),
        (1L, B + 68 * s, 4L, "view", 0.0), (1L, B + 75 * s, 5L, "purchase", 4.0))
        .toDF("user_id", "__us", "event_id", "event_type", "value")
        .select(col("user_id"), timestamp_micros(col("__us")).as("ts"),
          col("event_id"), col("event_type"), col("value")),
      "user_id", "event_type", "ts", "event_id", "value")
      .as[(String, Long, Double)].collect().toSet
    val streamedRollup = got().toSeq.groupBy(_._3).map { case (t, rows) =>
      (t, rows.size.toLong, rows.map(_._4).sum)
    }.toSet
    assert(streamedRollup == batch)
    q.stop()
  }

  test("attributionStream: silent user's buffered conversion ripens by timeout") {
    val (input, events) = stream()
    val q = StreamingAnalytics.attributionStream(events, "user_id",
        "event_type", "ts", "event_id", "value", watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_timeout_test").start()
    def got(): Set[(Long, Long, String, Double)] =
      spark.table("attr_timeout_test")
        .as[(Long, Long, String, Double)].collect().toSet

    // u1's touch + conversion land, then u1 goes silent forever; only
    // the sentinel advances the watermark. The event-time timeout must
    // ripen u1's buffer without any further u1 data.
    input.addData(
      (1L, B + 1 * s, 1L, "signup", 0.0),
      (1L, B + 2 * s, 2L, "purchase", 3.0))
    q.processAllAvailable()
    assert(got().isEmpty, "nothing ripens before the watermark moves")
    input.addData((99L, B + 60 * s, 1L, "view", 0.0))
    q.processAllAvailable()
    assert(got() == Set((1L, 2L, "signup", 3.0)))
    q.stop()
  }

  test("attributionLinearStream: segment credits equal the batch operator on the ripe prefix") {
    val (input, events) = stream()
    val q = StreamingAnalytics.attributionLinearStream(events, "user_id",
        "event_type", "ts", "event_id", "value", watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("linear_test").start()
    def got(): Set[(Long, Long, String, Long, Long)] =
      spark.table("linear_test")
        .as[(Long, Long, String, Long, Long)].collect().toSet

    // batch 1: u1 builds a 3-touch segment (2 views + 1 click) and
    // converts at value 10.0 -> per-touch floor(10e6/3) = 3333333;
    // u2 converts touchless (dropped — no path to credit). An in-batch
    // DISORDERED view (arrives after the conversion, timestamped
    // before) must still join the segment. Sentinel u99 ripens all.
    input.addData(
      (1L, B + 1 * s, 1L, "view", 0.0),
      (1L, B + 5 * s, 3L, "click", 0.0),
      (1L, B + 9 * s, 4L, "purchase", 10.0),
      (1L, B + 2 * s, 2L, "view", 0.0), // disordered: before the click
      (2L, B + 3 * s, 1L, "purchase", 7.5),
      (99L, B + 50 * s, 1L, "view", 0.0))
    q.processAllAvailable()
    val seg1 = Set(
      (1L, 4L, "view", 2L, 2L * 3333333L),
      (1L, 4L, "click", 1L, 3333333L))
    assert(got() == seg1,
      "3-way floored split; touchless conversion dropped")

    // batch 2: the next segment STARTS FRESH (batch 1's touches were
    // consumed by conversion 4) and carries across micro-batches — one
    // touch here, conversion in batch 3
    input.addData(
      (1L, B + 60 * s, 5L, "signup", 0.0),
      (99L, B + 100 * s, 2L, "view", 0.0))
    q.processAllAvailable()
    assert(got() == seg1, "an open segment emits nothing")

    input.addData(
      (1L, B + 120 * s, 6L, "purchase", 4.0),
      (99L, B + 200 * s, 3L, "view", 0.0))
    q.processAllAvailable()
    val want = seg1 + ((1L, 6L, "signup", 1L, 4000000L))
    assert(got() == want, "the carried touch credits the new conversion")

    // exactly-once: a further watermark advance re-emits nothing
    input.addData((99L, B + 201 * s, 4L, "view", 0.0))
    q.processAllAvailable()
    assert(got() == want)

    // batch parity: rolling the streamed credits up by touch type
    // equals Analytics.attributionLinear over the same ripe events
    val batch = Analytics.attributionLinear(
      Seq((1L, B + 1 * s, 1L, "view", 0.0), (1L, B + 2 * s, 2L, "view", 0.0),
        (1L, B + 5 * s, 3L, "click", 0.0), (1L, B + 9 * s, 4L, "purchase", 10.0),
        (2L, B + 3 * s, 1L, "purchase", 7.5),
        (1L, B + 60 * s, 5L, "signup", 0.0),
        (1L, B + 120 * s, 6L, "purchase", 4.0))
        .toDF("user_id", "__us", "event_id", "event_type", "value")
        .select(col("user_id"), timestamp_micros(col("__us")).as("ts"),
          col("event_id"), col("event_type"), col("value")),
      "user_id", "event_type", "ts", "event_id", "value")
      .as[(String, Long, Long)].collect().toSet
    val rollup = got().toSeq.groupBy(_._3).map { case (ty, rows) =>
      (ty, rows.map(_._4).sum, rows.map(_._5).sum)
    }.toSet
    assert(rollup == batch)
    q.stop()
  }

  test("attributionLinearStream: silent user's segment ripens by timeout") {
    val (input, events) = stream()
    val q = StreamingAnalytics.attributionLinearStream(events, "user_id",
        "event_type", "ts", "event_id", "value", watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("linear_timeout_test").start()
    def got(): Set[(Long, Long, String, Long, Long)] =
      spark.table("linear_timeout_test")
        .as[(Long, Long, String, Long, Long)].collect().toSet

    input.addData(
      (1L, B + 1 * s, 1L, "view", 0.0),
      (1L, B + 2 * s, 2L, "purchase", 3.0))
    q.processAllAvailable()
    assert(got().isEmpty, "nothing ripens before the watermark moves")
    input.addData((99L, B + 60 * s, 1L, "view", 0.0))
    q.processAllAvailable()
    assert(got() == Set((1L, 2L, "view", 1L, 3000000L)))
    q.stop()
  }
}
