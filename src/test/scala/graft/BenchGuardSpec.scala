package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-query stall guard's artifact parser — the piece that decides
  * whether a bench min gets a rerun. It must read BOTH artifact forms
  * (plain JSON maps and the escaped-quote `tail` fragments the driver
  * commits) and take the MIN across artifacts, so one stalled round
  * cannot raise the guard threshold. */
class BenchGuardSpec extends AnyFunSuite {

  test("parseArtifactMins: escaped + plain forms, min across artifacts") {
    val plain = """{"queries":{"q1_pricing":0.5,"q90_bm25":12.0},"metric":"total"}"""
    // the committed-artifact shape: the map survives only inside an
    // escaped tail string, and this round was stalled (q1 inflated 8x)
    val escaped = """{"n":12,"tail":"\"q1_pricing\":4.0,\"q90_bm25\":11.5,"}"""
    val got = Bench.parseArtifactMins(Seq(plain, escaped))
    assert(got("q1_pricing") == 0.5) // the stalled 4.0 must not win
    assert(got("q90_bm25") == 11.5) // min picks the faster round
  }

  test("contentionAdjustedSec: the arithmetic behind cdc_eps_adj") {
    // (batchId, addBatchMs, rows) — rows are irrelevant to the math
    def b(rows: (Long, Long)*): Seq[(Long, Long, Long)] =
      rows.map { case (id, ms) => (id, ms, 100L) }
    val ref = b(0L -> 1000L, 1L -> 1000L, 2L -> 1000L)
    // the reference run itself: zero excess, adjusts to its own wall
    assert(Bench.contentionAdjustedSec(3.5, ref, ref) == 3.5)
    // a contended run: batches 1+2 carry 2.0 s of excess over the
    // clean run → 10.0 s wall adjusts to 8.0 s
    val slow = b(0L -> 1000L, 1L -> 2000L, 2L -> 2000L)
    assert(Bench.contentionAdjustedSec(10.0, slow, ref) == 8.0)
    // a batch FASTER than the reference never gains time back
    val mixed = b(0L -> 500L, 1L -> 2000L, 2L -> 1000L)
    assert(Bench.contentionAdjustedSec(10.0, mixed, ref) == 9.0)
    // main + DLQ queries share batch ids: same-id times sum per run
    // BEFORE differencing (0: 800+700 vs 1000 → 500 ms excess)
    val dlq = b(0L -> 800L, 0L -> 700L)
    assert(Bench.contentionAdjustedSec(4.0, dlq, b(0L -> 1000L)) == 3.5)
    // ids the reference never saw contribute nothing
    assert(Bench.contentionAdjustedSec(5.0, b(9L -> 9999L), ref) == 5.0)
    // inferred excess beyond the wall floors at 1% of it, never <= 0
    val huge = b(0L -> 99000L)
    assert(Bench.contentionAdjustedSec(2.0, huge, b(0L -> 100L)) == 0.02)
  }

  test("clampedAdjEps: never exceeds the best raw events/s") {
    def b(rows: (Long, Long)*): Seq[(Long, Long, Long)] =
      rows.map { case (id, ms) => (id, ms, 100L) }
    val ref = b(0L -> 600L)
    val n = 1000000L
    // the round-19 pathology: a run whose inferred excess exceeds its
    // wall floors contentionAdjustedSec at 1% of wall (0.61 s for a
    // 61 s run) and the unclamped rate fabricates ~100x raw. With the
    // fastest run at 20 s (bestRawEps = 50,000), the clamp holds.
    val contended = b(0L -> 97656L)
    val best = n / 20L // 50,000 eps from the fastest run
    val adj = Bench.clampedAdjEps(n, 61.0, contended, ref, best)
    assert(adj == best, s"eps_adj $adj must clamp at best raw eps $best")
    // an uncontended run stays below the clamp and keeps its estimate
    assert(Bench.clampedAdjEps(n, 25.0, b(0L -> 1600L), ref, best) ==
      (n / 24.0).toLong)
    // degenerate inputs: zero wall or no reference → 0
    assert(Bench.clampedAdjEps(n, 0.0, ref, ref, best) == 0L)
    assert(Bench.clampedAdjEps(n, 5.0, ref, Nil, best) == 0L)
  }

  test("parseArtifactMins: zeros and non-query keys dropped, junk safe") {
    val txt = """{"queries":{"q2_x":0.0,"q3_y":1.25},"value":99.0,"runs":5}"""
    val got = Bench.parseArtifactMins(Seq(txt))
    assert(got == Map("q3_y" -> 1.25)) // q2's 0 is no reference; scalars ignored
    assert(Bench.parseArtifactMins(Seq("not json at all")) == Map.empty)
  }

  test("parseArtifactMins: round-16 cdc telemetry rows cannot pollute the baseline") {
    // the per-run breakdown fields (sec/eps/batches/add_batch_ms/...)
    // carry no q-prefix, so none of them may register as a query min —
    // a polluted map would hand the stall guard fictitious references
    // incl. the round-18 nested batch_rows objects (id/add_batch_ms/rows)
    val txt = """{"cdc_replicate_runs":[{"sec":55.079,"eps":18155,""" +
      """"batches":8,"add_batch_ms":61287,"wal_commit_ms":2170,""" +
      """"trigger_ms":64888,"non_trigger_ms":0,""" +
      """"batch_rows":[{"id":0,"add_batch_ms":9000,"rows":12000},""" +
      """{"id":1,"add_batch_ms":8000,"rows":13000}],"steal_pct":2.441,""" +
      """"cpu_pct":27.73,"iowait_pct":0.012}],""" +
      """"cdc_slow_note":"slowest run 55.079 s: dominant term addBatch""" +
      """ (61287 of 64888 ms wall, iowait 0.012 pct); front-loaded""" +
      """ (first 2 batches carry 72 pct of addBatch => residual warm-up)",""" +
      """"q1_pricing":0.5}"""
    assert(Bench.parseArtifactMins(Seq(txt)) == Map("q1_pricing" -> 0.5))
  }

  test("parseFunnelMins: headline fields + bare keys, min across texts") {
    // round-artifact headline form (the _sec scalars)...
    val artifact = """{"curate_funnel_sec":3.1,"curate_funnel_full_sec":14.5}"""
    // ...and BENCH_QUERIES.json's bare keys; also the escaped-tail form
    val queries = """{"curate_funnel":2.8,"curate_funnel_full":9.7}"""
    val escaped = """{"tail":"\"curate_funnel_sec\":3.6,"}"""
    val got = Bench.parseFunnelMins(Seq(artifact, queries, escaped))
    assert(got == Map("curate_funnel" -> 2.8, "curate_funnel_full" -> 9.7))
    // the _med fields must NOT feed the min (they are not minima)
    val med = """{"curate_funnel_med":1.0}"""
    assert(Bench.parseFunnelMins(Seq(med)) == Map.empty)
    assert(Bench.parseFunnelMins(Seq("junk")) == Map.empty)
  }

  test("fileSf: sf tag extracted; untagged legacy files pass the gate") {
    assert(Bench.fileSf("""{"metric":"query_mins","sf":"/root/testdata/sf0.1","q1":0.5}""")
      .contains("/root/testdata/sf0.1"))
    // legacy (pre-tag) baseline: no sf field → None → forall(_ == sf)
    // treats it as usable, which is right for the transition round
    assert(Bench.fileSf("""{"metric":"query_mins","q1":0.5}""").isEmpty)
    // the round artifacts' headline sf field parses the same way
    assert(Bench.fileSf(""","host_busy":{},"sf":"/root/testdata/sf0.1"}""")
      .contains("/root/testdata/sf0.1"))
    // the driver-committed wrapper form: the headline survives only as
    // an ESCAPED tail string (its own "sf" is a bare number, not the
    // scale dir) — the gate must read the escaped tag or a
    // different-sf artifact silently feeds the guard minima
    assert(Bench.fileSf(
      """{"n":14,"sf": 0.1,"tail":"...,\"sf\":\"/root/testdata/sf0.1\"}"}""")
      .contains("/root/testdata/sf0.1"))
  }

  test("fileSf gate: the committed round artifacts carry a readable sf tag") {
    val files = Option(new java.io.File(".").listFiles()).getOrElse(Array())
      .filter(_.getName.matches("BENCH_r\\d+\\.json")).toSeq
      .sortBy(_.getName).takeRight(2)
    assume(files.nonEmpty)
    files.foreach { f =>
      val src = scala.io.Source.fromFile(f)
      val txt = try src.mkString finally src.close()
      assert(Bench.fileSf(txt).exists(_.contains("sf0.1")),
        s"${f.getName}: the sf gate must see the escaped headline tag")
    }
  }

  test("the committed BENCH_QUERIES.json covers the whole suite") {
    val f = new java.io.File("BENCH_QUERIES.json")
    assume(f.isFile)
    val src = scala.io.Source.fromFile(f)
    val txt = try src.mkString finally src.close()
    val mins = Bench.parseArtifactMins(Seq(txt))
    // the r13 failure mode: the guard's baseline covered only the ~51
    // queries surviving in artifact tails and q111 shipped 6.4x
    // inflated — the committed full map must cover (almost) every
    // registered query, not a truncated subset
    val missing = SparkEntry.queries.keySet -- mins.keySet
    assert(missing.size <= 3,
      s"baseline must cover the suite; missing: $missing")
    val funnels = Bench.parseFunnelMins(Seq(txt))
    assert(funnels.contains("curate_funnel") &&
      funnels.contains("curate_funnel_full"),
      s"funnel stall refs must derive from the committed file: $funnels")
  }

  test("the committed round artifacts actually parse to usable references") {
    val files = Option(new java.io.File(".").listFiles()).getOrElse(Array())
      .filter(_.getName.matches("BENCH_r\\d+\\.json")).toSeq
    assume(files.nonEmpty)
    val texts = files.map { f =>
      val src = scala.io.Source.fromFile(f)
      try src.mkString finally src.close()
    }
    val mins = Bench.parseArtifactMins(texts)
    assert(mins.size > 100,
      s"expected per-query refs for most of the suite, got ${mins.size}")
    assert(mins.values.forall(v => v > 0 && v < 600))
  }
}
