package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming gap sessionization (flatMapGroupsWithState + event-time
  * timeout): sessions built ACROSS micro-batches, emitted exactly once
  * when the watermark passes their close point, state removed with
  * them, and the closed set equal to the batch [[Analytics.sessionize]]
  * answer on the same events.
  *
  * Times sit on a base offset — the initial watermark is epoch 0, and
  * an event AT the watermark is dropped as late, so an epoch-0 fixture
  * would silently lose its first event. `processAllAvailable` drains
  * follow-up batches too, so a data batch that advances the watermark
  * fires the resulting timeouts within the same call. */
class StreamingSessionSpec extends SparkSpec {
  import spark.implicits._

  private val gapUs = 10000000L // 10 s
  private val s = 1000000L // µs per second
  private val B = 1000 * s // base offset: keep every event past epoch 0

  test("sessionizeStream: cross-batch state, timeout-driven close, exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (user, epoch µs)
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"))
    val q = StreamingAnalytics
      .sessionizeStream(events, "user_id", "ts", gapUs, watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_test").start()
    def closed(): Set[(Long, Long, Long, Long, Long)] =
      spark.table("sessions_test")
        .as[(Long, Long, Long, Long, Long)].collect().toSet

    // batch 1: u1 two events 5 s apart (one session), u2 one event.
    // Watermark reaches B+5 s — before any close point (earliest is
    // B+12 s), so nothing may emit.
    input.addData((1L, B), (1L, B + 5 * s), (2L, B + 2 * s))
    q.processAllAvailable()
    assert(closed().isEmpty, "nothing closes before the watermark moves")

    // batch 2: u1 event at B+30 s — 25 s > gap, so it OPENS A SECOND
    // session; a sentinel user pushes the watermark to B+100 s, and the
    // drain's follow-up batch fires the EVENT-TIME TIMEOUTS (u1 and u2
    // send no further data): all three earlier sessions close; the
    // sentinel's own stays open (B+110 s is ahead of the watermark).
    input.addData((1L, B + 30 * s), (99L, B + 100 * s))
    q.processAllAvailable()
    val want = Set(
      (1L, B, B + 5 * s, 2L, 5 * s),
      (1L, B + 30 * s, B + 30 * s, 1L, 0L),
      (2L, B + 2 * s, B + 2 * s, 1L, 0L))
    assert(closed() == want)

    // batch 3: another sentinel trigger — closed sessions left the
    // state store with their emission, so nothing re-emits
    input.addData((99L, B + 101 * s))
    q.processAllAvailable()
    assert(closed() == want, "a closed session must emit exactly once")

    // batch parity: the closed streaming sessions equal the batch
    // sessionize answer over the same (non-sentinel) events
    val batch = Analytics.sessionize(
      Seq((1L, B), (1L, B + 5 * s), (2L, B + 2 * s), (1L, B + 30 * s))
        .toDF("user_id", "__us")
        .select(col("user_id"), timestamp_micros(col("__us")).as("ts")),
      "user_id", "ts", gapUs)
      .select(col("user_id"), col("session_start_us"), col("session_end_us"),
        col("n_events"), col("duration_us"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(closed() == batch)
    q.stop()
  }

  test("sessionizeStream: late in-watermark events bridge open fragments") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"))
    val q = StreamingAnalytics
      .sessionizeStream(events, "user_id", "ts", gapUs,
        watermark = "60 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_ooo").start()

    // two fragments 30 s apart — NOT chainable (30 s > 10 s gap)
    input.addData((1L, B), (1L, B + 30 * s))
    q.processAllAvailable()
    // the bridging events arrive LATE but inside the 60 s watermark:
    // gaps become 10/10/10 s (<= gap, inclusive) — ONE fused session
    input.addData((1L, B + 10 * s), (1L, B + 20 * s))
    q.processAllAvailable()
    // drive the watermark far past the close point and trigger again
    input.addData((99L, B + 200 * s))
    q.processAllAvailable()
    input.addData((99L, B + 201 * s))
    q.processAllAvailable()
    val got = spark.table("sessions_ooo")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, B, B + 30 * s, 4L, 30 * s)))
    q.stop()
  }

  test("sessionizeStream: the MaxOpenSessions tripwire fails loud on a " +
    "PERSISTENT pile-up, and lets a transient backfill spike through") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF()
      .select(col("_1").as("user_id"),
        timestamp_micros(col("_2")).as("ts"))
    // a watermark delay orders of magnitude above the gap — the
    // misconfiguration (or corrupt-event-time) shape under which open
    // sessions genuinely cannot ripen and state would grow forever
    val q = StreamingAnalytics
      .sessionizeStream(events, "user_id", "ts", gapUs,
        watermark = "36500 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_tripwire").start()

    // batch 1: one key, 10 001 mutually-gapped sessions. This alone
    // must NOT throw — a coarse backfill batch can transiently hold
    // this many genuinely-gapped sessions open purely because the
    // watermark lags one micro-batch, and those ripen at the next
    // advance. The overflow is stored once.
    val pileup = (0 to StreamingAnalytics.MaxOpenSessions)
      .map(i => (7L, B + i * 20 * s))
    input.addData(pileup: _*)
    q.processAllAvailable() // no exception: transient spikes pass

    // batch 2: the key is touched again and the pile-up has NOT
    // ripened (the huge delay pins the watermark at zero) — the stored
    // list was over the cap AND is still over it after this ripening
    // opportunity: now the fold must fail loud instead of letting the
    // state-store entry compound forever
    input.addData((7L, B + 10002L * 20 * s))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(ex).exists(c =>
      c.getMessage != null && c.getMessage.contains("MaxOpenSessions")))
    q.stop()
  }
}
