package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming TWAP (flatMapGroupsWithState + event-time timeout): closed
  * holding intervals emitted exactly once when their right endpoint
  * ripens, the open left endpoint carried across micro-batches, and the
  * emitted increments summing to EXACTLY the batch
  * [[Analytics.timeWeightedAverage]] on the same ripe prefix.
  *
  * Times sit on a base offset (initial watermark is epoch 0; an event
  * at the watermark is dropped as late), and `processAllAvailable`
  * drains the timeout batches a watermark advance fires. */
class StreamingTwapSpec extends SparkSpec {
  import spark.implicits._

  private val s = 1000000L // µs per second
  private val B = 1000 * s // base offset: keep every event past epoch 0

  // (user, epoch µs, event id, value)
  private def stream() = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, Double)]
    val events = input.toDF()
      .select(col("_1").as("user_id"), timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_id"), col("_4").as("value"))
    (input, events)
  }

  test("twapStream: intervals close exactly once, endpoint carries across batches") {
    val (input, events) = stream()
    val q = StreamingAnalytics.twapStream(events, "user_id", "value",
        "ts", "event_id", watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("twap_test").start()
    // the sentinel user's own samples close intervals too (TWAP has no
    // never-emitting event type) — assertions look at u1 only
    def got(): Set[(Long, Long, Long, Long)] =
      spark.table("twap_test")
        .as[(Long, Long, Long, Long)].collect().toSet.filter(_._1 != 99L)

    // batch 1: u1 holds 2.5 for 4 s then 7.0 (open — its interval needs
    // a successor); an IN-BATCH DISORDERED sample (arrives last,
    // timestamped between) must split the hold (event time decides).
    // Sentinel u99 ripens everything below B+50.
    input.addData(
      (1L, B + 1 * s, 1L, 2.5),
      (1L, B + 9 * s, 3L, 7.0),
      (1L, B + 5 * s, 2L, 4.0), // disordered: lands between 1 and 3
      (99L, B + 50 * s, 1L, 0.0))
    q.processAllAvailable()
    val closed1 = Set(
      (1L, B + 1 * s, 2500000L, 4 * s),
      (1L, B + 5 * s, 4000000L, 4 * s))
    assert(got() == closed1,
      "disorder re-ordered before any interval closes; last sample stays open")

    // batch 2: the carried endpoint (7.0 at B+9) closes against the
    // next sample — ACROSS micro-batches
    input.addData(
      (1L, B + 60 * s, 4L, 1.0),
      (99L, B + 100 * s, 2L, 0.0))
    q.processAllAvailable()
    val closed2 = closed1 + ((1L, B + 9 * s, 7000000L, 51 * s))
    assert(got() == closed2)

    // exactly-once: watermark advance alone re-emits nothing
    input.addData((99L, B + 101 * s, 3L, 0.0))
    q.processAllAvailable()
    assert(got() == closed2)

    // batch parity: Σ(vmic·dur) / Σdur over the emitted intervals
    // equals the batch TWAP on the same ripe (non-sentinel) events —
    // the increments ARE the batch statistic's terms
    val batch = Analytics.timeWeightedAverage(
      Seq((1L, B + 1 * s, 1L, 2.5), (1L, B + 5 * s, 2L, 4.0),
        (1L, B + 9 * s, 3L, 7.0), (1L, B + 60 * s, 4L, 1.0))
        .toDF("user_id", "__us", "event_id", "value")
        .select(col("user_id"), timestamp_micros(col("__us")).as("ts"),
          col("event_id"), col("value")),
      "user_id", "value", "ts", "event_id")
      .as[(Long, Long, Long)].collect().toSet
    val streamed = got().toSeq.groupBy(_._1).map { case (u, rows) =>
      val span = rows.map(_._4).sum
      val num = rows.map(r => BigInt(r._3) * BigInt(r._4)).sum
      // floored division, exactly the batch fdiv
      val twap = ((num - num.mod(BigInt(span))) / BigInt(span)).toLong
      (u, span, twap)
    }.toSet
    assert(streamed == batch)
    q.stop()
  }

  test("twapStream: silent user's buffered interval closes by timeout") {
    val (input, events) = stream()
    val q = StreamingAnalytics.twapStream(events, "user_id", "value",
        "ts", "event_id", watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("twap_timeout_test").start()
    def got(): Set[(Long, Long, Long, Long)] =
      spark.table("twap_timeout_test")
        .as[(Long, Long, Long, Long)].collect().toSet

    input.addData(
      (1L, B + 1 * s, 1L, 5.0),
      (1L, B + 3 * s, 2L, 6.0))
    q.processAllAvailable()
    assert(got().isEmpty, "nothing closes before the watermark moves")
    input.addData((99L, B + 60 * s, 1L, 0.0))
    q.processAllAvailable()
    assert(got() == Set((1L, B + 1 * s, 5000000L, 2 * s)))
    q.stop()
  }
}
