package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming daily growth accounting (q219's streaming counterpart):
  * per-(user, day) classifications + churn-outs emitted exactly once at
  * day completion, and [[StreamingAnalytics.growthRollup]] equals the
  * batch [[Analytics.growthAccounting]] report on the same ripe
  * events. */
class StreamingGrowthSpec extends SparkSpec {
  import spark.implicits._

  private val DAY = 86400000000L

  private def mkEvents(input: MemoryStream[(Long, Long)]) =
    input.toDF()
      .select(col("_1").as("user_id"), timestamp_micros(col("_2")).as("ts"))

  test("growthAccountingStream: classes + churn at day completion; rollup equals batch q219") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (user, epoch µs)
    val q = StreamingAnalytics.growthAccountingStream(mkEvents(input),
      "user_id", "ts", watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("growth_test").start()
    def got(): Set[(Long, Long, String)] =
      spark.table("growth_test")
        .as[(Long, Long, String)].collect().toSet

    // u1 active days 10, 11, 13 (same-day repeats collapse); u2 day 11;
    // u3 day 12
    val live = Seq(
      (1L, 10 * DAY + 5L), (1L, 10 * DAY + 9L), (1L, 11 * DAY + 1L),
      (1L, 13 * DAY + 2L),
      (2L, 11 * DAY + 3L),
      (3L, 12 * DAY + 4L))
    input.addData(live: _*)
    q.processAllAvailable()
    // sentinel far ahead ripens every day and every churn-out point
    input.addData((99L, 100 * DAY))
    q.processAllAvailable()
    val want = Set(
      (1L, 10L, "new"), (1L, 11L, "retained"), (1L, 12L, "churned"),
      (1L, 13L, "resurrected"), (1L, 14L, "churned"),
      (2L, 11L, "new"), (2L, 12L, "churned"),
      (3L, 12L, "new"), (3L, 13L, "churned"))
    assert(got() == want)

    // exactly-once under a further trigger
    input.addData((99L, 101 * DAY))
    q.processAllAvailable()
    assert(got() == want)

    // report parity: the rollup (day-spine-restricted, like batch)
    // equals the batch operator on the same (non-sentinel) events.
    // u1's churn@14 must be dropped by BOTH (day 14 is nobody's
    // active day)
    val streamReport = StreamingAnalytics.growthRollup(
      spark.table("growth_test").filter(col("user_id") =!= 99L))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val batch = Analytics.growthAccounting(
      live.toDF("user_id", "__us")
        .select(col("user_id"), timestamp_micros(col("__us")).as("ts")),
      "user_id", "ts")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(streamReport == batch)
    assert(batch == Seq(
      (10L, 1L, 0L, 0L, 0L),
      (11L, 1L, 1L, 0L, 0L),
      (12L, 1L, 0L, 0L, 2L),
      (13L, 0L, 0L, 1L, 1L)))
    q.stop()
  }

  test("growthAccountingStream: resurrection after an emitted churn never re-churns that gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = StreamingAnalytics.growthAccountingStream(mkEvents(input),
      "user_id", "ts", watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("growth_rechurn").start()

    // u1 active day 10; a mid sentinel completes day 11 with no
    // activity — churn@11 emits via the SILENCE arm
    input.addData((1L, 10 * DAY + 1L), (98L, 12 * DAY + DAY / 2))
    q.processAllAvailable()
    input.addData((98L, 12 * DAY + DAY / 2 + 1L))
    q.processAllAvailable()
    val mid = spark.table("growth_rechurn")
      .filter(col("user_id") === 1L)
      .as[(Long, Long, String)].collect().toSet
    assert(mid == Set((1L, 10L, "new"), (1L, 11L, "churned")),
      s"silence churn must ripen mid-stream: $mid")

    // u1 returns on day 13 (ahead of the watermark, so it arrives):
    // the GAP arm must see churnEmitted and NOT re-churn day 11 —
    // only the resurrection (and, later, the next churn-out at 14)
    input.addData((1L, 13 * DAY + DAY - 1L))
    q.processAllAvailable()
    input.addData((99L, 100 * DAY))
    q.processAllAvailable()
    input.addData((99L, 101 * DAY))
    q.processAllAvailable()
    val fin = spark.table("growth_rechurn")
      .filter(col("user_id") === 1L)
      .as[(Long, Long, String)].collect().toList
    assert(fin.count(e => e._3 == "churned" && e._2 == 11L) == 1,
      s"the day-11 churn must emit exactly once: $fin")
    assert(fin.toSet == Set((1L, 10L, "new"), (1L, 11L, "churned"),
      (1L, 13L, "resurrected"), (1L, 14L, "churned")), s"$fin")
    q.stop()
  }
}
