package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming PSI drift monitor: windowed bin counts against a FROZEN
  * baseline bin spec, emitted exactly once per closed window with
  * cross-batch count merging, clamping for out-of-range serving values,
  * and the batch [[Analytics.psiAgainstBaseline]] finisher scoring each
  * window — identical halves score exactly 0, a regime shift scores
  * positive. */
class StreamingPsiSpec extends SparkSpec {
  import spark.implicits._

  private val s = 1000000L  // µs per second
  private val H = 3600 * s  // tumbling window width used throughout

  private def stream() = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Double)]
    val events = input.toDF()
      .select(col("_1").as("event_type"), timestamp_micros(col("_2")).as("ts"),
        col("_3").as("value"))
    (input, events)
  }

  // baseline: type a, values 1..4 -> lo = 1e6, width = (3e6+10)//10 =
  // 300001; bins land at 0, 3, 6, 9
  private def baseline = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0))
    .toDF("event_type", "value")

  test("psiDriftStream: cross-batch merge, clamp, exactly-once, fold parity") {
    val spec = Analytics.psiBinSpec(baseline, "event_type", "value")
    val specRows = spec.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2))).toSeq
    assert(specRows == Seq(("a", 1000000L, 300001L)))

    val (input, events) = stream()
    val q = StreamingAnalytics.psiDriftStream(events, "event_type", "ts",
        "value", spec, bins = 10, windowDur = "1 hour",
        watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("psi_test").start()
    def got(): Set[(String, Long, Long, Long)] =
      spark.table("psi_test")
        .select(col("event_type"), unix_micros(col("window_start")),
          col("__b"), col("n"))
        .as[(String, Long, Long, Long)].collect().toSet

    // window 0 gets HALF the baseline distribution — nothing may emit
    // (the watermark is still inside window 0)
    input.addData(("a", 0 * H + 1 * s, 1.0), ("a", 0 * H + 2 * s, 2.0))
    q.processAllAvailable()
    assert(got().isEmpty, "no window is ripe yet")

    // the other half of window 0 arrives in a LATER micro-batch
    // together with window 1's far-out-of-range values (clamp to bin
    // 9) AND a type the calibration never saw (sentinel bin 10 — a
    // novel type must surface, never be dropped by the spec join):
    // the agg must MERGE window 0's two partials, and the advancing
    // watermark then closes window 0 complete
    input.addData(("a", 0 * H + 3 * s, 3.0), ("a", 0 * H + 4 * s, 4.0),
      ("a", 1 * H + 1 * s, 100.0), ("a", 1 * H + 2 * s, 100.0),
      ("a", 1 * H + 3 * s, 100.0), ("a", 1 * H + 4 * s, 100.0),
      ("ghost", 1 * H + 5 * s, 9.9), ("ghost", 1 * H + 6 * s, 1.1),
      ("ghost", 1 * H + 7 * s, 5.0))
    q.processAllAvailable()
    val w0 = Set(
      ("a", 0 * H, 0L, 1L), ("a", 0 * H, 3L, 1L),
      ("a", 0 * H, 6L, 1L), ("a", 0 * H, 9L, 1L))
    assert(got() == w0,
      "window 0 closes complete (cross-batch merge); window 1 still open")

    // a far event ripens window 1; its own window stays open
    input.addData(("a", 3 * H + 1 * s, 2.0))
    q.processAllAvailable()
    val closed = w0 + (("a", 1 * H, 9L, 4L)) + (("ghost", 1 * H, 10L, 3L))
    assert(got() == closed,
      "one row per (window, observed bin), clamped; novel type in the " +
        "sentinel bin")

    // exactly-once: a further watermark advance re-emits nothing
    input.addData(("a", 3 * H + 2 * s, 2.0))
    q.processAllAvailable()
    assert(got() == closed)
    q.stop()

    // finisher parity: window 0 replays the baseline distribution ->
    // PSI exactly 0; window 1 is a total regime shift -> positive;
    // the never-calibrated ghost type scores loudly from the sentinel
    val current = got().toSeq.toDF("event_type", "window_start", "__b", "n")
    val base = Analytics.psiBinCounts(baseline, "event_type", "value", spec)
    val scored = Analytics.psiAgainstBaseline(current, base, bins = 10,
        extraKeys = Seq("window_start"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(scored.map(t => (t._1, t._2, t._3, t._4)) ==
      Seq(("a", 0L, 4L, 4L), ("a", H, 4L, 4L), ("ghost", H, 0L, 3L)))
    assert(scored(0)._5 == 0L, s"identical window must score 0: $scored")
    assert(scored(1)._5 > 250000L,
      s"regime-shift window must clear the drift threshold: $scored")
    assert(scored(2)._5 > 250000L,
      s"a novel type must score loud drift, not vanish: $scored")

    // streaming counts are bit-identical to a batch re-bin of the same
    // ripe events (the clamp convention is shared)
    val ripe = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0))
      .toDF("event_type", "value")
    val batchBins = Analytics.psiBinCounts(ripe, "event_type", "value", spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(batchBins ==
      got().filter(_._2 == 0L).map(t => (t._1, t._3, t._4)))
  }
}
