package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming session type-sets (q218's streaming counterpart): closed
  * sessions carry their distinct type set, emitted exactly once on
  * watermark ripening, and [[StreamingAnalytics.sessionPairLiftRollup]]
  * over the emitted set equals the batch [[Analytics.sessionPairLift]]
  * on the same ripe events — column for column, ppm for ppm. */
class StreamingSessionTypesSpec extends SparkSpec {
  import spark.implicits._

  private val gapUs = 10000000L // 10 s
  private val s = 1000000L // µs per second
  private val B = 1000 * s // base offset: keep every event past epoch 0

  test("sessionTypesStream: set union across batches; rollup equals batch q218") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)] // (user, µs, type)
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_type"))
    val q = StreamingAnalytics.sessionTypesStream(events, "user_id",
      "event_type", "ts", gapUs, watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("types_test").start()
    def closed(): Set[(Long, Long, Long, Long, Seq[String])] =
      spark.table("types_test")
        .as[(Long, Long, Long, Long, Seq[String])].collect().toSet

    // u1 session 1: view+click+view (set {click, view}); u1 session 2
    // (40 s later): purchase alone; u2: view+purchase in one session
    val live = Seq(
      (1L, B, "view"), (1L, B + 4 * s, "click"), (1L, B + 8 * s, "view"),
      (1L, B + 48 * s, "purchase"),
      (2L, B + 2 * s, "view"), (2L, B + 9 * s, "purchase"))
    input.addData(live: _*)
    q.processAllAvailable()
    // sentinel pushes the watermark past every close point
    input.addData((99L, B + 500 * s, "view"))
    q.processAllAvailable()
    val want = Set(
      (1L, B, B + 8 * s, 3L, Seq("click", "view")),
      (1L, B + 48 * s, B + 48 * s, 1L, Seq("purchase")),
      (2L, B + 2 * s, B + 9 * s, 2L, Seq("purchase", "view")))
    assert(closed() == want)

    // exactly-once under a further trigger
    input.addData((99L, B + 501 * s, "view"))
    q.processAllAvailable()
    assert(closed() == want)

    // association-statistics parity with the batch q218 operator on
    // the same (non-sentinel) events: one co-occurring pair
    // ({purchase, view} in u2's session) plus {click, view} in u1's —
    // supports, confidences, and lift must match exactly
    val streamStats = StreamingAnalytics.sessionPairLiftRollup(
      spark.table("types_test"))
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    val batch = Analytics.sessionPairLift(
      live.zipWithIndex.map { case ((u, t, ty), i) => (u, t, i.toLong, ty) }
        .toDF("user_id", "__us", "event_id", "event_type")
        .select(col("user_id"), timestamp_micros(col("__us")).as("ts"),
          col("event_id"), col("event_type")),
      "user_id", "event_type", "ts", "event_id", gapUs)
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(streamStats == batch)
    // 3 sessions total; view appears in 2, click in 1, purchase in 2:
    // (click, view): support 1/3, conf 1/1 and 1/2, lift 3/(1·2)
    // (purchase, view): support 1/3, conf 1/2 both ways, lift 3/(2·2)
    assert(batch == Seq(
      ("click", "view", 1L, 333333L, 1000000L, 500000L, 1500000L),
      ("purchase", "view", 1L, 333333L, 500000L, 500000L, 750000L)))
    q.stop()
  }

  test("sessionTypesStream: late in-watermark events union into the set") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"),
        col("_3").as("event_type"))
    val q = StreamingAnalytics.sessionTypesStream(events, "user_id",
      "event_type", "ts", gapUs, watermark = "60 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("types_ooo").start()

    // two fragments 20 s apart — NOT chainable on their own; the late
    // bridging event fuses them and its type joins the union
    input.addData((1L, B, "view"), (1L, B + 20 * s, "purchase"))
    q.processAllAvailable()
    input.addData((1L, B + 10 * s, "click"))
    q.processAllAvailable()
    input.addData((99L, B + 500 * s, "view"))
    q.processAllAvailable()
    input.addData((99L, B + 501 * s, "view"))
    q.processAllAvailable()
    val got = spark.table("types_ooo")
      .as[(Long, Long, Long, Long, Seq[String])].collect().toSet
    assert(got == Set(
      (1L, B, B + 20 * s, 3L, Seq("click", "purchase", "view"))))
    q.stop()
  }
}
