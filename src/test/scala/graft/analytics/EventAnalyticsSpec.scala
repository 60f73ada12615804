package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Funnel conversion and retention cohorts — ordered-sequence
  * semantics pinned against hand-computed fixtures, including the
  * cases a naive unconditional-min pivot gets wrong. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  test("eventFunnel: order matters, strictly-after matters, repeats don't") {
    val events = Seq(
      // u1 completes in order
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2 clicked BEFORE viewing: click must not count; no purchase
      (2L, "click", 5L), (2L, "view", 10L),
      // u3 views and clicks at the SAME instant: strict > rejects it
      (3L, "view", 10L), (3L, "click", 10L),
      // u4 re-views late, then clicks: the EARLIEST view anchors, so
      // the click (after first view) counts
      (4L, "view", 10L), (4L, "view", 100L), (4L, "click", 50L),
      // u5 irrelevant event types only
      (5L, "error", 1L), (5L, "signup", 2L))
      .toDF("user_id", "event_type", "ts")
    val got = Analytics.eventFunnel(events, "user_id", "event_type", "ts", steps)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("eventFunnel: unreached steps report 0; result is partitioning-invariant") {
    val events = Seq((1L, "view", 1L), (2L, "view", 2L))
      .toDF("user_id", "event_type", "ts")
    val got = Analytics.eventFunnel(events, "user_id", "event_type", "ts", steps)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(got == Seq((1, 2L), (2, 0L), (3, 0L)))
    val big = (1 to 100).flatMap(u => Seq(
      (u.toLong, "view", u.toLong), (u.toLong, "click", u.toLong + 1),
      (u.toLong, "purchase", u.toLong + 2)))
      .toDF("user_id", "event_type", "ts")
    val a = Analytics.eventFunnel(big, "user_id", "event_type", "ts", steps)
      .collect().toSeq
    val b = Analytics.eventFunnel(big.repartition(13), "user_id",
      "event_type", "ts", steps).collect().toSeq
    assert(a == b)
  }

  test("retentionCohorts: integral day arithmetic on epoch micros") {
    val day = 86400000000L
    val base = 1704067200000000L // 2024-01-01, representative epoch µs
    val events = Seq(
      (1L, base + 1L), (1L, base + day + 5L), (1L, base + 3 * day),
      (2L, base + day), (2L, base + day + 7L), // same day twice → one row
      (3L, base + 2 * day))
      .toDF("user_id", "ts").withColumn("event_type", lit("view"))
    val got = Analytics.retentionCohorts(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val d0 = base / day
    assert(got == Seq(
      (d0, 0L, 1L), (d0, 1L, 1L), (d0, 3L, 1L),
      (d0 + 1, 0L, 1L), (d0 + 2, 0L, 1L)))
  }

  test("debounce: burst collapses to its first event; boundary gap kept") {
    val gap = 1000000L // 1 s
    val events = Seq(
      // user 1 / click: burst at 0, +0.4s, +0.8s (chained sub-gap), then
      // +1.8s (exactly 1s after the last burst member → kept)
      (1L, "click", 10L, 0L), (1L, "click", 11L, 400000L),
      (1L, "click", 12L, 800000L), (1L, "click", 13L, 1800000L),
      // same user, different type: independent chain
      (1L, "view", 20L, 100000L),
      // user 2: tie on ts → event id orders; second of the tie dropped
      (2L, "click", 30L, 0L), (2L, "click", 31L, 0L),
      (2L, "click", 32L, 5000000L))
      .toDF("user_id", "event_type", "event_id", "ts")
    def run(parts: Int) = StreamingAnalytics.debounce(
        events.repartition(parts), Seq("user_id", "event_type"),
        "ts", "event_id", gap)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val want = Set((1L, 10L), (1L, 13L), (1L, 20L), (2L, 30L), (2L, 32L))
    assert(run(1) == want)
    assert(run(7) == want)
  }

  test("eventTransitions: adjacent pairs per user, first event feeds none") {
    val events = Seq(
      (1L, "view", 10L, 100L), (1L, "click", 11L, 200L),
      (1L, "view", 12L, 300L), (1L, "click", 13L, 400L),
      (2L, "view", 20L, 100L), (2L, "purchase", 21L, 150L),
      // user 3: tie on ts → event id orders (view before click)
      (3L, "view", 30L, 500L), (3L, "click", 31L, 500L),
      (4L, "view", 40L, 999L)) // single event → no transition
      .toDF("user_id", "event_type", "event_id", "ts")
    def run(parts: Int) = Analytics.eventTransitions(
        events.repartition(parts), "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val want = Map(
      ("view", "click") -> 3L, ("click", "view") -> 1L,
      ("view", "purchase") -> 1L)
    assert(run(1) == want)
    assert(run(5) == want)
  }

  test("ohlc: open/close by (ts, id) order, exact volume, day buckets") {
    val day = 86400000000L
    val events = Seq(
      // day 0: open = id-ordered first at the tied earliest ts
      (10L, day - day, 5.0), (11L, 0L, 3.0),       // both at ts 0; id 10 first
      (12L, 1000L, 9.5), (13L, 2000L, 1.5),        // high 9.5, low 1.5
      // day 2 (day 1 empty — absent from output): one event
      (20L, 2 * day + 5L, 7.25))
      .map { case (id, t, v) => (id, t, v, "x") }
      .toDF("event_id", "ts", "value", "event_type")
    def run(parts: Int) = Analytics.ohlc(events.repartition(parts),
        "ts", "event_id", "value", day)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getDouble(6))).toMap
    val want = Map(
      0L -> ((5.0, 9.5, 1.5, 1.5, 4L, 19.0)),
      2L -> ((7.25, 7.25, 7.25, 7.25, 1L, 7.25)))
    assert(run(1) == want)
    assert(run(6) == want)
  }

  test("spearman: perfect concordance, perfect inversion, ties, degenerate n") {
    def run(pairs: Seq[(Long, Long)], parts: Int = 1): Option[Long] = {
      val r = Analytics.spearman(
        pairs.toDF("x", "y").repartition(parts), "x", "y").head()
      if (r.isNullAt(1)) None else Some(r.getLong(1))
    }
    // monotone (ties aligned) → ρ = 1
    assert(run(Seq((10L, 1L), (20L, 2L), (20L, 2L), (30L, 4L))) ==
      Some(1000000L))
    // strict inversion → ρ = −1
    assert(run(Seq((10L, 4L), (20L, 3L), (25L, 2L), (30L, 1L))) ==
      Some(-1000000L))
    // hand-computed tie case: doubled ranks x (3,3,6), y (2,4,6) →
    // Σd² = 2 → ρ_ppm = 1e6 − 6e6/48 = 875000
    assert(run(Seq((1L, 5L), (1L, 6L), (2L, 7L))) == Some(875000L))
    assert(run(Seq((1L, 5L), (1L, 6L), (2L, 7L)), parts = 4) ==
      Some(875000L))
    // n ≤ 1: no ordering to correlate
    assert(run(Seq((1L, 1L))).isEmpty)
  }

  test("eventGaps: reports each silence at-or-over the threshold") {
    val events = Seq(
      (1L, 10L, 0L), (1L, 11L, 50L), (1L, 12L, 1050L), // gaps 50, 1000
      (2L, 20L, 0L))                                    // single event
      .toDF("user_id", "event_id", "ts")
    val got = Analytics.eventGaps(events, "user_id", "ts", "event_id", 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq((1L, 50L, 1050L, 1000L))) // boundary gap included
  }

  test("columnProfile: counts, nulls, exact distincts, native-ordered extrema") {
    val df = Seq(
      (1L, Some("b"), Some(100L)),
      (2L, Some("a"), None),
      (3L, None, Some(9L)), // native min 9 would be string-max "9"
      (4L, Some("a"), Some(100L)))
      .toDF("id", "s", "v")
    val got = Analytics.columnProfile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
    // native numeric ordering: min is 9, not "100"
    assert(got("v") == ((4L, 1L, 2L, "9", "100")))
  }

  test("randomized events: debounce/transitions/gaps/ohlc equal in-memory references") {
    val rnd = new scala.util.Random(42)
    val gap = 1000L
    val bucket = 5000L
    for (trial <- 1 to 3) {
      val n = 200 + rnd.nextInt(200)
      val evs = (0 until n).map { i =>
        (1L + rnd.nextInt(6), // user
          Seq("view", "click", "buy")(rnd.nextInt(3)),
          i.toLong, // unique id
          rnd.nextInt(50000).toLong, // ts µs
          math.rint(rnd.nextDouble() * 100) / 100) // 2dp value
      }
      val df = evs.toDF("user_id", "event_type", "event_id", "ts", "value")
        .repartition(7)
      def byKey[K](key: ((Long, String, Long, Long, Double)) => K) =
        evs.groupBy(key).map { case (k, g) =>
          k -> g.sortBy(e => (e._4, e._3))
        }
      // transitions reference
      val refTrans = byKey(_._1).values.flatMap(g =>
        g.sliding(2).collect { case Seq(a, b) => (a._2, b._2) })
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val gotTrans = Analytics.eventTransitions(df, "user_id",
          "event_type", "ts", "event_id")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(gotTrans == refTrans, s"transitions diverge (trial $trial)")
      // debounce reference (gap vs previous event of the key)
      val refKept = byKey(e => (e._1, e._2)).values.flatMap { g =>
        g.zip(None +: g.map(Some(_))).collect {
          case (e, None) => e._3
          case (e, Some(p)) if e._4 - p._4 >= gap => e._3
        }
      }.toSet
      val gotKept = StreamingAnalytics.debounce(df,
          Seq("user_id", "event_type"), "ts", "event_id", gap)
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(gotKept == refKept, s"debounce diverges (trial $trial)")
      // gaps reference (per user, any type)
      val refGaps = byKey(_._1).values.flatMap(g =>
        g.sliding(2).collect {
          case Seq(a, b) if b._4 - a._4 >= gap => (a._4, b._4)
        }).toVector.sorted
      val gotGaps = Analytics.eventGaps(df, "user_id", "ts", "event_id", gap)
        .select("gap_start_us", "gap_end_us")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toVector.sorted
      assert(gotGaps == refGaps, s"gaps diverge (trial $trial)")
      // ohlc reference
      val refOhlc = evs.groupBy(e => e._4 / bucket).map { case (b, g) =>
        val s = g.sortBy(e => (e._4, e._3))
        b -> (s.head._5, g.map(_._5).max, g.map(_._5).min, s.last._5,
          g.size.toLong,
          g.map(e => BigDecimal(e._5)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      }
      val gotOhlc = Analytics.ohlc(df, "ts", "event_id", "value", bucket)
        .collect().map(r => r.getLong(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
            r.getLong(5), r.getDouble(6))).toMap
      assert(gotOhlc == refOhlc, s"ohlc diverges (trial $trial)")
    }
  }

  test("randomized spearman equals an independent in-memory midrank model") {
    val rnd = new scala.util.Random(7)
    def localRho(pairs: Seq[(Long, Long)]): Long = {
      def rank2(vs: Seq[Long]): Map[Long, Long] = {
        val counts = vs.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
        val sorted = counts.keys.toSeq.sorted
        var prefix = 0L
        sorted.map { v =>
          val r = 2L * prefix + counts(v) + 1L; prefix += counts(v); v -> r
        }.toMap
      }
      val rx = rank2(pairs.map(_._1)); val ry = rank2(pairs.map(_._2))
      val sd2 = pairs.map { case (x, y) =>
        val d = BigInt(rx(x) - ry(y)); d * d
      }.sum
      val n = BigInt(pairs.size)
      (BigInt(1000000) - (BigInt(3) * sd2 * 1000000) /
        (BigInt(2) * n * (n * n - 1))).toLong
    }
    for (trial <- 1 to 5) {
      // small value domains force heavy ties — the midrank path
      val pairs = (0 until 50 + rnd.nextInt(100)).map(_ =>
        (rnd.nextInt(8).toLong, rnd.nextInt(8).toLong))
      val got = Analytics.spearman(
        pairs.toDF("x", "y").repartition(5), "x", "y").head().getLong(1)
      assert(got == localRho(pairs), s"spearman diverges (trial $trial)")
    }
  }

  test("benfordProfile: digit counts exact, zero-count digits present, sub-1 excluded") {
    // values 10-19 → digit 1 (x10), 25.5 → 2, 0.3 excluded, null excluded
    val vals = (10 to 19).map(_.toDouble) ++ Seq(25.5, 0.3)
    val df = (vals.map(Option(_)) :+ None).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Analytics.benfordProfile(df, "v")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(got.keySet == (1 to 9).toSet) // all digits, even zero-count
    assert(got(1)._1 == 10L && got(2)._1 == 1L && got(3)._1 == 0L)
    // observed ppm: 10/11 and 1/11, floor
    assert(got(1)._2 == 909090L && got(2)._2 == 90909L)
    assert(got(1)._3 == 909090L - Analytics.BenfordPpm(1)) // delta
    assert(got(9) == ((0L, 0L, Analytics.BenfordPpm(9))))
  }

  test("movingDailyRevenue: RANGE frame honors calendar gaps in the divisor") {
    val day = 86400000000L
    val orders = Seq(
      (1L, 0L, 10.0), (2L, 0L, 20.0),   // day 0: 30
      (3L, day, 40.0),                  // day 1: 40
      (4L, 5 * day, 100.0))             // day 5: 100
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val got = Analytics.movingDailyRevenue(orders, windowDays = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // 3-day frames: day0 [−2..0] → {0}; day1 [−1..1] → {0,1};
    // day5 [3..5] → {5} only (gap days shrink the frame to 1 day)
    assert(got == Map(
      0L -> ((2L, 30.0, 30.0)),
      1L -> ((1L, 40.0, 35.0)),
      5L -> ((1L, 100.0, 100.0))))
  }

  test("frequentItemPairs: per-order dedup, canonical pairs, support floor") {
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 20L), // dup line: one basket membership
      (2L, 20L), (2L, 10L),            // order matters not: pair (10,20)
      (3L, 10L), (3L, 30L),
      (4L, 40L))                       // single-item basket: no pairs
      .toDF("l_orderkey", "l_partkey")
    val got = Analytics.frequentItemPairs(li, minSupport = 2L, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((10L, 20L, 2L))) // (10,30) support 1 floors out
    val all = Analytics.frequentItemPairs(li, minSupport = 1L, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(all == Seq((10L, 20L, 2L), (10L, 30L, 1L)))
  }

  test("revenueAnomalies: spike flagged, steady days normal, short history abstains") {
    val day = 86400000000L
    // days 0-5 steady at 100.00, day 6 spikes to 200.00; minPriorDays=5
    val orders = ((0 to 5).map(i => (i.toLong, i * day, 100.0)) :+
      (6L, 6 * day, 200.0))
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val got = Analytics.revenueAnomalies(orders, windowDays = 30,
        sigmas = 2, minPriorDays = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getString(4)))
      .toMap
    // days 0-4: < 5 prior days → abstain; day 5: zero-variance window,
    // x == mean → (nx−S)² = 0 > 0 false → normal; day 6: spike over a
    // zero-variance window → anomaly
    (0 to 4).foreach(d =>
      assert(got(d.toLong)._2 == "insufficient_history", got(d.toLong)))
    assert(got(5L) == ((5L, "normal")))
    assert(got(6L) == ((6L, "anomaly")))
  }

  test("retentionCohorts: pre-1970 timestamps floor, not truncate") {
    // ts = -1 µs is 1969-12-31 → day -1; bare `div` would truncate it
    // to day 0, collapsing the cohort boundary
    val events = Seq((1L, -1L), (1L, 1L))
      .toDF("user_id", "ts").withColumn("event_type", lit("view"))
    val got = Analytics.retentionCohorts(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((-1L, 0L, 1L), (-1L, 1L, 1L)))
  }

  test("forecastRevenue: band edges in, strict bounds out, non-hundredth rejected") {
    val li = Seq(
      ("1996-06-01", 0.05, 10.0, 1000.0), // in: 50
      ("1996-06-01", 0.04, 10.0, 1000.0), // band low edge in: 40
      ("1996-06-01", 0.06, 23.0, 100.0),  // band high edge in: 6
      ("1996-06-01", 0.03, 10.0, 1000.0), // below band
      ("1996-06-01", 0.07, 10.0, 1000.0), // above band
      ("1995-12-31", 0.05, 10.0, 1000.0), // before window
      ("1997-01-01", 0.05, 10.0, 1000.0), // window end is exclusive
      ("1996-06-01", 0.05, 24.0, 1000.0)) // quantity cap is strict
      .toDF("__d", "l_discount", "l_quantity", "l_extendedprice")
      .withColumn("l_shipdate", to_date(col("__d")))
    val got = Analytics.forecastRevenue(li, "1996-01-01", "1997-01-01",
      0.05, 24.0).collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(96.0))
    // empty match coalesces to 0, not null
    val none = Analytics.forecastRevenue(li, "1970-01-01", "1971-01-01",
      0.05, 24.0).collect().map(_.getDouble(0)).toSeq
    assert(none == Seq(0.0))
    // a discount off the hundredths grid fails loudly, never silently snaps
    intercept[IllegalArgumentException] {
      Analytics.forecastRevenue(li, "1996-01-01", "1997-01-01", 0.055, 24.0)
    }
  }

  test("disjunctiveRevenue: per-branch conjunction, not the cross of slices") {
    val part = Seq(
      (1L, "B1", 3), (2L, "B2", 8), (3L, "B3", 8))
      .toDF("p_partkey", "p_brand", "p_size")
    val li = Seq(
      (1L, 5.0, 100.0, 0.0),  // branch 1: qty in [1,10] → 100
      (2L, 12.0, 200.0, 0.5), // branch 2: qty in [5,15] → 100
      (1L, 12.0, 400.0, 0.0), // B1 slice but branch-2 qty only → OUT
      (3L, 5.0, 800.0, 0.0))  // qty in envelope, brand in no slice → OUT
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val got = Analytics.disjunctiveRevenue(part, li,
      Seq(("B1", 1, 5, 1.0, 10.0), ("B2", 6, 10, 5.0, 15.0)))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(200.0))
  }

  test("waitingSuppliers: sole-late on multi-supplier finished orders only") {
    val nation = Seq((1, "N1"), (2, "N2")).toDF("n_nationkey", "n_name")
    val supplier = Seq(
      (10L, "S10", 1), (11L, "S11", 1), (12L, "S12", 1),
      (13L, "S13", 2)) // other nation — never reported
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val orders = Seq(
      (1L, "2024-01-01", "F"), // s10 late alone → counts for S10
      (2L, "2024-01-01", "F"), // both late → nl=2, nobody counts
      (3L, "2024-01-01", "F"), // single-supplier order → ns=1, excluded
      (4L, "2024-01-01", "O"), // not finished → excluded
      (5L, "2024-01-01", "F")) // s13 (nation 2) late alone → filtered by nation
      .toDF("o_orderkey", "__d", "o_orderstatus")
      .withColumn("o_orderdate", to_date(col("__d")))
    val li = Seq(
      (1L, 10L, "2024-02-01"), (1L, 11L, "2024-01-05"),
      (2L, 10L, "2024-02-01"), (2L, 11L, "2024-02-01"),
      (3L, 10L, "2024-02-01"),
      (4L, 10L, "2024-02-01"), (4L, 11L, "2024-01-05"),
      (5L, 13L, "2024-02-01"), (5L, 10L, "2024-01-05"))
      .toDF("l_orderkey", "l_suppkey", "__d")
      .withColumn("l_shipdate", to_date(col("__d")))
    val got = Analytics.waitingSuppliers(supplier, li, orders, nation,
      "N1", 10, 20).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("S10", 1L)))
  }

  test("associationRules: Apriori pruning is result-invariant; ppm exact") {
    // baskets: 1:{A,B} 2:{A,B} 3:{A,B,C,D} 4:{C}; A=1,B=2,C=3,D=4
    // pair AB appears 3x; AC/BC/AD/BD/CD once — pruned/filtered at
    // minSupport=2 (D itself is infrequent: the pre-pair semi-join cut)
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 2L), // in-basket duplicate collapses
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (3L, 3L), (3L, 4L),
      (4L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val got = Analytics.associationRules(li, 2L, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // conf(A→B) = 3/3 = 1e6 ppm; lift = 3·4/(3·3) = 1333333 ppm (floored)
    assert(got == Seq(
      (1L, 2L, 3L, 1000000L, 1333333L),
      (2L, 1L, 3L, 1000000L, 1333333L)))
  }

  test("revenueRollup: 3 grouping sets, ALL labels, level column") {
    val li = Seq(
      ("1996-03-01", "A", 10.0), ("1996-05-01", "R", 20.0),
      ("1997-03-01", "A", 30.0))
      .toDF("__d", "l_returnflag", "l_extendedprice")
      .withColumn("l_shipdate", to_date(col("__d")))
      .withColumn("l_discount", lit(0.0))
    val got = Analytics.revenueRollup(li)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      ("1996", "A", 0L, 1L, 10.0), ("1996", "R", 0L, 1L, 20.0),
      ("1997", "A", 0L, 1L, 30.0),
      ("1996", "ALL", 1L, 2L, 30.0), ("1997", "ALL", 1L, 1L, 30.0),
      ("ALL", "ALL", 2L, 3L, 60.0)))
  }

  test("sessionize: gap boundary inclusive, ties share a session, per-user seq") {
    // gap = 100 µs: a gap of EXACTLY 100 stays in-session, 101 opens one
    val events = Seq((1L, 0L), (1L, 50L), (1L, 150L), (1L, 251L),
      (2L, 5L), (3L, 7L), (3L, 7L))
      .toDF("user_id", "ts")
    val got = Analytics.sessionize(events, "user_id", "ts", gapUs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      (1L, 1L, 0L, 150L, 3L, 150L), (1L, 2L, 251L, 251L, 1L, 0L),
      (2L, 1L, 5L, 5L, 1L, 0L), (3L, 1L, 7L, 7L, 2L, 0L)))
    intercept[IllegalArgumentException] {
      Analytics.sessionize(events, "user_id", "ts", gapUs = 0L)
    }
  }

  test("activityStreaks: islands, tie→earliest, pre-1970 days floor") {
    val day = 86400000000L
    val events = Seq(
      // u1: days 0,1,2 then 5,6 → best 3 from day 0 (dup events collapse)
      (1L, 0L), (1L, day + 3L), (1L, day + 9L), (1L, 2 * day), (1L, 5 * day),
      (1L, 6 * day),
      // u2: two length-2 streaks → tie broken to the EARLIER start
      (2L, 3 * day), (2L, 4 * day), (2L, 7 * day), (2L, 8 * day),
      // u3: ts=-1 is day -1 (floor, not truncation) → streak {-1, 0}
      (3L, -1L), (3L, 1L))
      .toDF("user_id", "ts")
    val got = Analytics.activityStreaks(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 3L, 0L), (2L, 2L, 3L), (3L, 2L, -1L)))
  }

  test("peakConcurrency: inclusive ends overlap, adjacent intervals don't") {
    val iv = Seq((0L, 10L), (5L, 20L), (10L, 12L), (30L, 40L))
      .toDF("s", "e")
    val got = Analytics.peakConcurrency(iv, "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((3L, 10L))) // all three overlap at t=10 exactly
    // end 9 and start 10 are adjacent closed intervals — never concurrent
    val adj = Seq((0L, 9L), (10L, 20L)).toDF("s", "e")
    val got2 = Analytics.peakConcurrency(adj, "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2 == Seq((1L, 0L)))
    assert(Analytics.peakConcurrency(iv.limit(0), "s", "e").count() == 0L)
  }

  test("scd2Intervals: equal-value collapse, null-safe, id tiebreak, open tail") {
    val events = Seq(
      (1L, 1L, 0L, Some(1.0)), (1L, 2L, 10L, Some(1.0)), // collapse
      (1L, 3L, 20L, Some(2.0)), (1L, 4L, 30L, Some(2.0)),
      (1L, 5L, 40L, Some(1.0)), // back to 1.0 — a NEW version
      (2L, 6L, 0L, None), (2L, 7L, 10L, None), // null == null collapses
      (2L, 8L, 20L, Some(5.0)),
      // u3: same ts, id order decides: id 9 (3.0) then id 10 (4.0)
      (3L, 9L, 0L, Some(3.0)), (3L, 10L, 0L, Some(4.0)))
      .toDF("user_id", "event_id", "ts", "value")
    val got = Analytics.scd2Intervals(events, "user_id", "ts", "value",
        "event_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        r.getLong(2), if (r.isNullAt(3)) null else r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 1.0, 0L, 20L, 1L), (1L, 2.0, 20L, 40L, 2L),
      (1L, 1.0, 40L, null, 3L),
      (2L, null, 0L, 20L, 1L), (2L, 5.0, 20L, null, 2L),
      (3L, 3.0, 0L, 0L, 1L), (3L, 4.0, 0L, null, 2L)))
  }

  test("rfmSegments: scores equal Spark's native ntile over the same order") {
    // 37 customers (non-divisible by 5 → the remainder buckets matter)
    val orders = (1 to 111).map { i =>
      val c = (i % 37) + 1L
      (c, s"2024-0${i % 9 + 1}-1${i % 3}", 100.0 + (i * 7 % 53))
    }.toDF("o_custkey", "__d", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("__d")))
    val got = Analytics.rfmSegments(orders, "o_custkey", "o_orderdate",
        "o_totalprice", k = 5)
      .collect().map(r => (r.getLong(0), (r.getInt(4), r.getInt(5),
        r.getInt(6), r.getInt(7)))).toMap
    // independent model: Spark's own ntile windows over the rollup
    val w1 = org.apache.spark.sql.expressions.Window
      .orderBy("last_order_day", "__c")
    val w2 = org.apache.spark.sql.expressions.Window
      .orderBy("frequency", "__c")
    val w3 = org.apache.spark.sql.expressions.Window
      .orderBy("monetary_cents", "__c")
    val want = orders.groupBy(col("o_custkey").as("__c"))
      .agg(max(expr("(unix_micros(cast(o_orderdate as timestamp)) - " +
        "pmod(unix_micros(cast(o_orderdate as timestamp)), 86400000000)) " +
        "div 86400000000")).as("last_order_day"),
        count(lit(1)).as("frequency"),
        sum((col("o_totalprice").cast(org.apache.spark.sql.types
          .DecimalType(18, 2)) * 100).cast("long")).as("monetary_cents"))
      .withColumn("r", ntile(5).over(w1))
      .withColumn("f", ntile(5).over(w2))
      .withColumn("m", ntile(5).over(w3))
      .collect().map(r => (r.getLong(0), (r.getInt(4), r.getInt(5),
        r.getInt(6), r.getInt(4) * 100 + r.getInt(5) * 10 + r.getInt(6))))
      .toMap
    assert(got == want)
  }

  test("coPurchaseTriangles: support floor, census counts, hub without triangles") {
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L),
      (4L, 2L), (4L, 3L),
      (5L, 1L), (5L, 3L),
      (6L, 3L), (6L, 4L), (7L, 3L), (7L, 4L), // edge 3-4, no closure
      (8L, 4L), (8L, 5L)) // support 1 → below the floor
      .toDF("l_orderkey", "l_partkey")
    val got = Analytics.coPurchaseTriangles(li, minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((4L, 4L, 1L))) // nodes {1,2,3,4}, edges {12,13,23,34}
    // star: hub 1 connected to 2,3,4 with no rim edges → zero triangles
    val star = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 1L), (4L, 3L),
      (5L, 1L), (5L, 4L), (6L, 1L), (6L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val got2 = Analytics.coPurchaseTriangles(star, minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got2 == Seq((4L, 3L, 0L)))
  }

  test("paretoClasses: inclusive-cum cuts, revenue ties rank by part id") {
    val li = Seq(
      (1L, 80.0), (2L, 10.0), (3L, 5.0), (4L, 5.0)) // 3 and 4 tie
      .toDF("l_partkey", "l_extendedprice")
      .withColumn("l_discount", lit(0.0))
    val got = Analytics.paretoClasses(li, aPct = 80, bPct = 95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(got == Seq(
      (1L, 80000000L, 1L, 80000000L, "A"), // cum 80% INCLUSIVE is A
      (2L, 10000000L, 2L, 90000000L, "B"),
      (3L, 5000000L, 3L, 95000000L, "B"),  // 95% inclusive is B
      (4L, 5000000L, 4L, 100000000L, "C")))
  }

  test("rollingActiveUsers: window covers trailing days, user counted once") {
    val day = 86400000000L
    val events = Seq(
      (1L, 0L), (1L, 5L), (1L, 2 * day), // u1 twice on day 0 → once
      (2L, 1L))
      .toDF("user_id", "ts")
    val got = Analytics.rollingActiveUsers(events, "user_id", "ts",
        windowDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // day 0: both active; day 2: only u1 active, but both in the window
    assert(got == Seq((0L, 2L, 2L), (2L, 1L, 2L)))
    // windowDays = 1 degenerates to DAU
    val got1 = Analytics.rollingActiveUsers(events, "user_id", "ts",
        windowDays = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got1 == Seq((0L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("monthlyGrowth: signed ppm floors toward -inf, first month null") {
    val orders = Seq(
      ("2024-01-15", 100.0), ("2024-02-15", 50.0), ("2024-03-15", 75.0),
      ("2024-04-15", 33.34)) // (3334-7500)·1e6/7500 = -555466.67 → -555467
      .toDF("__d", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("__d")))
    val got = Analytics.monthlyGrowth(orders)
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toSeq
    assert(got == Seq(
      ("2024-01", 10000L, null, null),
      ("2024-02", 5000L, 10000L, -500000L),
      ("2024-03", 7500L, 5000L, 500000L),
      ("2024-04", 3334L, 7500L, -555467L)))
  }

  test("modalPriority: dominant priority, count ties to the smaller string") {
    val customer = Seq((1L, "SEG_A"), (2L, "SEG_B"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (1L, "2-HIGH"), (1L, "2-HIGH"), (1L, "1-URGENT"), (1L, "1-URGENT"),
      (2L, "3-MEDIUM"), (2L, "3-MEDIUM"), (2L, "3-MEDIUM"), (2L, "1-URGENT"))
      .toDF("o_custkey", "o_orderpriority")
    val got = Analytics.modalPriority(orders, customer)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("SEG_A", "1-URGENT", 2L), ("SEG_B", "3-MEDIUM", 3L)))
  }

  test("chiSquareIndependence: uniform table scores zero, marginals exact") {
    val customer = Seq((1L, "S1"), (2L, "S2"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = (1 to 5).flatMap(_ => Seq(
      (1L, "P1"), (1L, "P2"), (2L, "P1"), (2L, "P2")))
      .toDF("o_custkey", "o_orderpriority")
    val got = Analytics.chiSquareIndependence(orders, customer)
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getDouble(4))).toSeq
    val cells = got.filter(_._1 != "TOTAL")
    assert(cells.size == 4)
    assert(cells.forall { case (_, _, obs, exp, chi) =>
      obs == 5L && exp == 5000000L && chi == 0.0 })
    val total = got.filter(_._1 == "TOTAL")
    assert(total == Seq(("TOTAL", "TOTAL", -1L, -1L, 0.0)))
  }

  test("keySkewProfile: exact ppm shares and skew-vs-mean, top-k order") {
    val df = (Seq.fill(8)(("hot")) ++ Seq("b", "c")).toDF("k")
    val got = Analytics.keySkewProfile(df, "k", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // hot: 8/10 = 800000 ppm; mean = 10/3 → skew = 8·3·1e6/10 = 2400000
    assert(got == Seq(("hot", 8L, 800000L, 2400000L),
      ("b", 1L, 100000L, 300000L)))
  }

  test("brandSkyline: dominance within brand, equal points co-survive") {
    val part = Seq(
      // brand X: 3 and 5 tie on (price 5, size 5) — both kept; they
      // dominate 1 (cheaper, same size); 1 dominates 2 (same price,
      // bigger size); 4 survives on size alone
      (1L, "X", "p1", 10.0, 5), (2L, "X", "p2", 10.0, 3),
      (3L, "X", "p3", 5.0, 5), (5L, "X", "p5", 5.0, 5),
      (4L, "X", "p4", 20.0, 9),
      // brand Y: alone, trivially on the frontier
      (6L, "Y", "p6", 99.0, 1))
      .toDF("p_partkey", "p_brand", "p_name", "p_retailprice", "p_size")
    val got = Analytics.brandSkyline(part)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((3L, "X"), (5L, "X"), (4L, "X"), (6L, "Y")))
  }

  test("minCostSupplier: regional scope, cost ties to smaller suppkey") {
    val region = Seq((0L, "R1"), (1L, "R2")).toDF("r_regionkey", "r_name")
    val nation = Seq((10L, "N_IN", 0L), (11L, "N_OUT", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq(
      (1L, "SA", 10L, 100.0), (2L, "SB", 10L, 50.0),
      (3L, "SC", 11L, 999.0)) // out of region — its cheap offer must lose
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val part = Seq(
      (100L, "pn", "B1", 5, "T"), (200L, "pm", "B2", 5, "T"),
      (300L, "px", "B1", 9, "T")) // wrong size — excluded
      .toDF("p_partkey", "p_name", "p_brand", "p_size", "p_type")
    val lineitem = Seq(
      // part 100: SA min 8.0 across two lines, SB 8.0 → tie, SA (key 1)
      (100L, 1L, 10.0), (100L, 1L, 8.0), (100L, 2L, 8.0),
      // SC is cheapest but outside the region
      (100L, 3L, 1.0),
      (200L, 2L, 5.0),
      (300L, 1L, 2.0))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val got = Analytics.minCostSupplier(part, supplier, nation, region,
        lineitem, regionName = "R1", size = 5, partType = "T")
      .collect().map(r => (r.getDouble(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(6))).toSeq
    assert(got == Seq(
      (100.0, "SA", "N_IN", 100L, 8.0),
      (50.0, "SB", "N_IN", 200L, 5.0)))
  }

  test("supplierClassCount: distinct pairs, deficit/brand/type/size exclusions") {
    val part = Seq(
      (1L, "B1", "T1", 5), (2L, "B1", "T1", 5),
      (3L, "BX", "T1", 5),      // excluded brand
      (4L, "B1", "PROMO-X", 5), // excluded type prefix
      (5L, "B1", "T1", 9))      // excluded size
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val supplier = Seq((1L, 10.0), (2L, -5.0), (3L, 1.0))
      .toDF("s_suppkey", "s_acctbal")
    val lineitem = Seq(
      (1L, 1L), (1L, 1L), // duplicate line: one distinct pair
      (1L, 2L),           // deficit supplier — must not count
      (2L, 1L), (2L, 3L), // class (B1,T1,5) sees suppliers {1, 3}
      (3L, 1L), (4L, 1L), (5L, 1L))
      .toDF("l_partkey", "l_suppkey")
    val got = Analytics.supplierClassCount(part, supplier, lineitem,
        excludeBrand = "BX", excludeTypePrefix = "PROMO", sizes = Seq(5))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3))).toSeq
    assert(got == Seq(("B1", "T1", 5, 2L)))
  }

  test("dominantSuppliers: strict majority share, window and scope pruned") {
    val part = Seq((1L, "red thing"), (2L, "blue thing"), (3L, "red other"))
      .toDF("p_partkey", "p_name")
    val supplier = Seq((1L, "S1", 10L), (2L, "S2", 10L), (3L, "S3", 10L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nation = Seq((10L, "N")).toDF("n_nationkey", "n_name")
    val lineitem = Seq(
      // part 1: S1 60%, S2 40% in-window → S1 dominant
      (1L, 1L, 6.0, "2020-06-01"), (1L, 2L, 4.0, "2020-06-02"),
      // S3's huge out-of-window shipment must not count
      (1L, 3L, 100.0, "2019-06-01"),
      // part 2 is out of the name scope entirely
      (2L, 2L, 100.0, "2020-06-01"),
      // part 3: exact 50/50 — strict > keeps both out
      (3L, 2L, 5.0, "2020-06-01"), (3L, 3L, 5.0, "2020-06-02"))
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
      .withColumn("l_shipdate", to_timestamp($"l_shipdate"))
    val got = Analytics.dominantSuppliers(part, supplier, nation, lineitem,
        namePrefix = "red", fromDate = "2020-01-01", toDate = "2021-01-01",
        thresholdPpm = 500000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((1L, "S1", "N")))
  }

  test("cusumShift: level shift accumulates, single-day spikes don't flip it") {
    // six days, 10→22 dollars at day 4 — a sustained +12 shift; two
    // same-day orders must collapse into one series point first.
    // Hand-computed: dev' = 6x−9600 → P = −3600,−7200,−10800,−7200,
    // −3600,0; cusum⁺ = 0,0,0,600,1200,1800; cusum⁻ = 0,600,1200,600,0,0
    val orders = Seq(
      ("2024-01-01", 4.0), ("2024-01-01", 6.0), // collapse to $10
      ("2024-01-02", 10.0), ("2024-01-03", 10.0),
      ("2024-01-04", 22.0), ("2024-01-05", 22.0), ("2024-01-06", 22.0))
      .toDF("__d", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("__d")))
    val got = Analytics.cusumShift(orders, thresholdCents = 1000L)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(got == Seq(
      ("2024-01-01", 10.0, 0L, 0L, "ok"),
      ("2024-01-02", 10.0, 0L, 600L, "ok"),
      ("2024-01-03", 10.0, 0L, 1200L, "shift_down"),
      ("2024-01-04", 22.0, 600L, 600L, "ok"),
      ("2024-01-05", 22.0, 1200L, 0L, "shift_up"),
      ("2024-01-06", 22.0, 1800L, 0L, "shift_up")))
  }

  test("repeatIntervals: histogram quantiles, same-day gap 0, single orders drop") {
    val customer = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      // cust 1 (A): days 0, 2, 5, 14 → gaps 2, 3, 9
      (1L, 10L, "2024-01-01"), (1L, 11L, "2024-01-03"),
      (1L, 12L, "2024-01-06"), (1L, 13L, "2024-01-15"),
      // cust 2 (A): gap 2
      (2L, 20L, "2024-01-01"), (2L, 21L, "2024-01-03"),
      // cust 3 (B): two orders the SAME day → gaps 1 then 0
      (3L, 30L, "2024-01-01"), (3L, 31L, "2024-01-02"),
      (3L, 32L, "2024-01-02"),
      // cust 4 (C): single order → no interval, segment absent
      (4L, 40L, "2024-01-01"))
      .toDF("o_custkey", "o_orderkey", "__d")
      .withColumn("o_orderdate", to_timestamp(col("__d")))
    val got = Analytics.repeatIntervals(orders, customer)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq
    // A: gaps {2,2,3,9} → mean 4.0, lower-median 2, p90 9
    // B: gaps {1,0} → mean 0.5, median 0, p90 1
    assert(got == Seq(("A", 4L, 4.0, 2L, 9L), ("B", 2L, 0.5, 0L, 1L)))
  }

  test("coPurchaseDegrees: degree histogram over the support-floored edge set") {
    // edges at support >= 2: {1-2, 1-3, 2-3, 3-4} → degrees 2,2,3,1
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L),
      (4L, 2L), (4L, 3L),
      (5L, 1L), (5L, 3L),
      (6L, 3L), (6L, 4L), (7L, 3L), (7L, 4L),
      (8L, 4L), (8L, 5L)) // support 1 → below the floor
      .toDF("l_orderkey", "l_partkey")
    val got = Analytics.coPurchaseDegrees(li, minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 1L)))
  }

  test("valueDeciles: remainder buckets lead, price ties order by key") {
    val orders = Seq(
      (1L, 10.0), (2L, 20.0), (3L, 20.0), (4L, 40.0),
      (5L, 50.0), (6L, 60.0), (7L, 70.0))
      .toDF("o_orderkey", "o_totalprice")
    val got = Analytics.valueDeciles(orders, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    // n=7, k=3 → bucket sizes 3,2,2 over (price, key) order
    assert(got == Seq(
      (1, 3L, 10.0, 20.0, 50.0),
      (2, 2L, 40.0, 50.0, 90.0),
      (3, 2L, 60.0, 70.0, 130.0)))
  }

  test("supplierHhi: exact ppm shares, discount applied, single-vendor nation") {
    val supplier = Seq((1L, 10L), (2L, 10L), (3L, 20L))
      .toDF("s_suppkey", "s_nationkey")
    val nation = Seq((10L, "N1"), (20L, "N2"))
      .toDF("n_nationkey", "n_name")
    val lineitem = Seq(
      // S1: 50·(1−0.5) + 50·(1−0) = 75; S2: 25 → shares 75/25 ppm-exact
      (1L, 50.0, 0.5), (1L, 50.0, 0.0), (2L, 25.0, 0.0),
      (3L, 10.0, 0.0)) // N2's lone supplier → share 1e6, HHI 1e6
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
    val got = Analytics.supplierHhi(supplier, nation, lineitem)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq
    // N1: HHI = (750000² + 250000²)/10⁶ = 625000
    assert(got == Seq(
      ("N1", 2L, 100.0, 750000L, 625000L),
      ("N2", 1L, 10.0, 1000000L, 1000000L)))
  }

  test("scd2PointInTime: interval containment, boundaries, pre-history 'none'") {
    val events = Seq(
      // u1 status history: signup@0 (v1), upgrade@20 (v2; the @30
      // repeat collapses), error@40 (v3, open tail)
      (1L, 1L, 0L, "signup"), (1L, 2L, 20L, "upgrade"),
      (1L, 3L, 30L, "upgrade"), (1L, 4L, 40L, "error"),
      // u1 purchases: before history, at v1's open, mid-v2, exactly at
      // v3's valid_from (new version wins), deep in the open tail
      (1L, 100L, -5L, "purchase"), (1L, 101L, 0L, "purchase"),
      (1L, 102L, 25L, "purchase"), (1L, 103L, 40L, "purchase"),
      (1L, 104L, 100L, "purchase"),
      // u2: no status events at all
      (2L, 200L, 10L, "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Analytics.scd2PointInTime(events, "user_id", "ts",
        "event_type", "event_id", factType = "purchase")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, 100L, "none", null),
      (1L, 101L, "signup", 1L),
      (1L, 102L, "upgrade", 2L),
      (1L, 103L, "error", 3L),
      (1L, 104L, "error", 3L),
      (2L, 200L, "none", null)))
  }

  test("round-13 operators: partitioning-invariant on the real sf0.001 tables") {
    // the determinism claim every oracle depends on, checked the blunt
    // way: identical results when the FACT arrives in 13 arbitrary
    // partitions instead of the file layout
    val orders = graft.Tables.orders(spark, sf)
    val customer = graft.Tables.customer(spark, sf)
    val lineitem = graft.Tables.lineitem(spark, sf)
    val supplier = graft.Tables.supplier(spark, sf)
    val nation = graft.Tables.nation(spark, sf)
    val events = graft.Tables.events(spark, sf)
    def inv(name: String)(f: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame,
        fact: org.apache.spark.sql.DataFrame): Unit = {
      val a = f(fact).collect().toSeq
      val b = f(fact.repartition(13)).collect().toSeq
      assert(a == b, s"$name changed under repartition(13)")
      assert(a.nonEmpty, s"$name returned nothing at sf0.001")
    }
    inv("cusumShift")(Analytics.cusumShift(_, 100000000L), orders)
    inv("repeatIntervals")(Analytics.repeatIntervals(_, customer), orders)
    inv("coPurchaseDegrees")(Analytics.coPurchaseDegrees(_, 2L), lineitem)
    inv("valueDeciles")(Analytics.valueDeciles(_, 10), orders)
    inv("supplierHhi")(Analytics.supplierHhi(supplier, nation, _), lineitem)
    inv("scd2PointInTime")(Analytics.scd2PointInTime(_, "user_id", "ts",
      "event_type", "event_id", "purchase"), events)
    inv("cohortRevenue")(Analytics.cohortRevenue(_), orders)
    inv("newVsReturning")(Analytics.newVsReturning(_), orders)
    inv("importantParts")(Analytics.importantParts(_, supplier, nation,
      "NATION_3", 3), lineitem)
    inv("priorityByFlag")(Analytics.priorityByFlag(orders, _,
      "1996-01-01", "1998-01-01"), lineitem)
    inv("shipLatency")(Analytics.shipLatency(orders, _), lineitem)
    inv("returnRate")(Analytics.returnRate(_), lineitem)
    inv("funnelLatency")(Analytics.funnelLatency(_, "user_id",
      "event_type", "ts", Seq("view", "click", "purchase")), events)
    inv("sequenceMatch")(Analytics.sequenceMatch(_, "user_id",
      "event_type", "ts", "event_id",
      Seq("v2p" -> "view.*purchase")), events)
    inv("propsRollup")(Analytics.propsRollup(_, "event_type", "props",
      "k"), events)
    val emb = graft.Tables.embeddings(spark, sf)
    inv("hardNegatives")(graft.vector.Similarity.hardNegatives(_, "vec_id",
      "embedding", org.apache.spark.sql.functions.col("vec_id") % 199 === 0,
      k = 5), emb)
    val cents = emb.filter(
        org.apache.spark.sql.functions.col("vec_id") < 8)
      .orderBy("vec_id")
      .select(org.apache.spark.sql.functions.col("embedding")
        .cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq
    inv("annRecall")(graft.vector.Ivf.annRecall(_, "vec_id", "embedding",
      org.apache.spark.sql.functions.col("vec_id") % 199 === 0, cents,
      nProbe = 3, k = 10), emb)
  }

  private val cohortOrders = Seq(
    // c1: first 2024-01 (two orders that month), again 2024-03
    (1L, "2024-01-05", 10.0), (1L, "2024-01-20", 5.0),
    (1L, "2024-03-01", 20.0),
    // c2: single first order 2024-02
    (2L, "2024-02-10", 7.0),
    // c3: first 2024-01, returns 2024-02
    (3L, "2024-01-15", 1.0), (3L, "2024-02-15", 2.0),
    // c4: first DECEMBER 2023, returns january — the year-boundary
    // month arithmetic (2024·12+0) − (2023·12+11) = 1
    (4L, "2023-12-31", 3.0), (4L, "2024-01-01", 4.0))
    .toDF("o_custkey", "__d", "o_totalprice")
    .withColumn("o_orderdate", to_timestamp(col("__d")))

  test("cohortRevenue: cohort by first month, age across year boundary") {
    val got = Analytics.cohortRevenue(cohortOrders)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      ("2023-12", 0L, 1L, 1L, 3.0),
      ("2023-12", 1L, 1L, 1L, 4.0),
      ("2024-01", 0L, 2L, 3L, 16.0), // c1 twice + c3 once
      ("2024-01", 1L, 1L, 1L, 2.0),
      ("2024-01", 2L, 1L, 1L, 20.0),
      ("2024-02", 0L, 1L, 1L, 7.0)))
  }

  test("importantParts: mean-multiple cut, scope excludes other nations") {
    val supplier = Seq((1L, 10L), (2L, 10L), (3L, 20L))
      .toDF("s_suppkey", "s_nationkey")
    val nation = Seq((10L, "N"), (20L, "OTHER"))
      .toDF("n_nationkey", "n_name")
    // part 1 takes 50 of the nation's 95 total; nine tail parts take 5
    // each; part 99's huge revenue belongs to the OTHER nation
    val li = (Seq((1L, 1L, 50.0)) ++
      (2L to 10L).map(p => (p, 2L, 5.0)) ++
      Seq((99L, 3L, 1000.0)))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
      .withColumn("l_discount", lit(0.0))
    val got = Analytics.importantParts(li, supplier, nation, "N",
        meanMultiple = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    // v·n > K·t: 50·10 = 500 > 3·95 = 285 for part 1 only; share =
    // ⌊50e6·10⁶ / 95e6⌋ = 526315 ppm
    assert(got == Seq((1L, 50.0, 526315L)))
  }

  test("priorityByFlag: window bounds inclusive/exclusive, CASE split exact") {
    val orders = Seq((1L, "1-URGENT"), (2L, "2-HIGH"), (3L, "5-LOW"))
      .toDF("o_orderkey", "o_orderpriority")
    val li = Seq(
      (1L, "A", "2020-01-01"), // in-window (inclusive start)
      (1L, "A", "2020-06-01"),
      (2L, "A", "2020-12-31"),
      (3L, "A", "2020-06-01"),
      (3L, "B", "2020-06-01"),
      (2L, "B", "2021-01-01"), // exclusive end — out
      (1L, "B", "2019-12-31")) // before — out
      .toDF("l_orderkey", "l_returnflag", "__d")
      .withColumn("l_shipdate", to_timestamp(col("__d")))
    val got = Analytics.priorityByFlag(orders, li,
        "2020-01-01", "2021-01-01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", 3L, 1L), ("B", 0L, 1L)))
  }

  test("sessionFunnel: steps reset at session boundaries, per-visit counts") {
    val gap = 100L
    val events = Seq(
      // u1 session A completes the funnel; session B (new gap) only views
      (1L, "view", 10L, 0L), (1L, "click", 11L, 5L),
      (1L, "purchase", 12L, 10L), (1L, "view", 13L, 1000L),
      // u2: the click lands in a NEW session (gap 200 > 100) with no
      // view — a lifetime funnel would credit it, the session one must not
      (2L, "view", 20L, 0L), (2L, "click", 21L, 200L),
      // u3: click BEFORE the view inside one session — order matters
      (3L, "click", 30L, 0L), (3L, "view", 31L, 5L))
      .toDF("user_id", "event_type", "event_id", "ts")
    val got = Analytics.sessionFunnel(events, "user_id", "event_type",
        "ts", "event_id", Seq("view", "click", "purchase"), gapUs = gap)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // view sessions: u1-A, u1-B, u2-s1, u3 → 4; click/purchase: u1-A only
    assert(got == Seq((1, "view", 4L), (2, "click", 1L),
      (3, "purchase", 1L)))
  }

  test("funnelLatency: earliest anchors, strict-after ties, non-completers absent") {
    val events = Seq(
      // u1: clean completion → 20
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2: pre-anchor click ignored; purchase TIED with the click is
      // rejected (strict >), the later one completes → 40 − 10 = 30
      (2L, "click", 5L), (2L, "view", 10L), (2L, "click", 15L),
      (2L, "purchase", 15L), (2L, "purchase", 40L),
      // u3: never completes → no row
      (3L, "view", 10L), (3L, "click", 20L),
      // u4: the EARLIEST view anchors even though a later one exists
      (4L, "view", 10L), (4L, "view", 100L), (4L, "click", 50L),
      (4L, "purchase", 60L))
      .toDF("user_id", "event_type", "ts")
    val got = Analytics.funnelLatency(events, "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 20L), (2L, 30L), (4L, 50L)))
  }

  test("sequenceMatch: order-sensitive journeys, zero-match patterns report 0") {
    val events = Seq(
      (1L, "view", 10L, 1L), (1L, "click", 11L, 2L),
      (1L, "purchase", 12L, 3L),
      (2L, "error", 20L, 1L), (2L, "error", 21L, 2L),
      (2L, "error", 22L, 3L), (2L, "purchase", 23L, 4L),
      // u4's purchase PRECEDES the view — an adjacency-pair matrix
      // can't see this; the journey regex must reject it
      (4L, "purchase", 40L, 1L), (4L, "view", 41L, 2L))
      .toDF("user_id", "event_type", "event_id", "ts")
    val got = Analytics.sequenceMatch(events, "user_id", "event_type",
        "ts", "event_id", Seq(
          "error_storm" -> "error error error",
          "recovered" -> "error.*purchase",
          "view_to_purchase" -> "view.*purchase",
          "never" -> "signup signup"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("error_storm", 1L), ("never", 0L),
      ("recovered", 1L), ("view_to_purchase", 1L)))
  }

  test("attributionLastTouch: preceding touch wins, touchless goes direct") {
    val events = Seq(
      // u1: view -> click -> purchase(10): click gets the credit
      (1L, "view", 10L, 1L, 0.0), (1L, "click", 11L, 2L, 0.0),
      (1L, "purchase", 12L, 3L, 10.0),
      // u1 second purchase(4) right after: still last-touch = click
      (1L, "purchase", 13L, 4L, 4.0),
      // u2: purchase with no preceding event at all -> direct
      (2L, "purchase", 20L, 1L, 7.5),
      // u3: touch AFTER the purchase must not count (frame ends at -1)
      (3L, "purchase", 30L, 1L, 2.0), (3L, "view", 31L, 2L, 0.0))
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val got = Analytics.attributionLastTouch(events, "user_id",
        "event_type", "ts", "event_id", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("click", 2L, 14.0), ("direct", 2L, 9.5)))
  }

  test("attributionLinear: equal split in floored micros per segment") {
    val events = Seq(
      // u1 segment 0: view, view, click then purchase(10.0)
      // -> 3 touches, each floor(10e6/3) = 3333333 micros
      (1L, "view", 10L, 1L, 0.0), (1L, "view", 11L, 2L, 0.0),
      (1L, "click", 12L, 3L, 0.0), (1L, "purchase", 13L, 4L, 10.0),
      // u1 segment 1: one click then purchase(2.0) -> click +2000000
      (1L, "click", 14L, 5L, 0.0), (1L, "purchase", 15L, 6L, 2.0),
      // u2: purchase with no touches -> contributes nothing
      (2L, "purchase", 20L, 1L, 9.0),
      // u3: trailing touches with no purchase -> nothing
      (3L, "view", 30L, 1L, 0.0))
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val got = Analytics.attributionLinear(events, "user_id",
        "event_type", "ts", "event_id", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("click", 2L, 3333333L + 2000000L),
      ("view", 2L, 2L * 3333333L)))
  }

  test("dailyOrderSpine: orderless days appear with zeros") {
    val orders = Seq(
      (1L, "2024-01-01", 10.0), (2L, "2024-01-01", 5.0),
      // Jan 2 and 3 have no orders
      (3L, "2024-01-04", 2.5))
      .toDF("o_orderkey", "__d", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("__d")))
    val got = Analytics.dailyOrderSpine(orders)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 2L, 15.0),
      ("2024-01-02", 0L, 0.0),
      ("2024-01-03", 0L, 0.0),
      ("2024-01-04", 1L, 2.5)))
  }

  test("brandVwap: quantity-weighted, not a mean of prices") {
    val part = Seq((1L, "B1"), (2L, "B1")).toDF("p_partkey", "p_brand")
    val li = Seq(
      // 1 unit at 10 and 9 units at 100 (extended prices): VWAP
      // = 110/10 = 11.0, where a mean of unit prices would say 55
      (1L, "2024-01-05", 1.0, 10.0),
      (2L, "2024-01-20", 9.0, 100.0))
      .toDF("l_partkey", "__s", "l_quantity", "l_extendedprice")
      .withColumn("l_shipdate", to_timestamp(col("__s")))
    val got = Analytics.brandVwap(part, li)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == Seq(("B1", "2024-01", 2L, 10.0, 11.0)))
  }

  test("sessionPaths: gap splits paths; counts collapse identical journeys") {
    val gap = 1800000000L // 30 min in micros
    def us(min: Long) = min * 60000000L
    val events = Seq(
      // u1 session 1: view>click ; session 2 (90 min later): view>click
      (1L, "view", us(0), 1L), (1L, "click", us(10), 2L),
      (1L, "view", us(100), 3L), (1L, "click", us(110), 4L),
      // u2: one session view>click
      (2L, "view", us(0), 1L), (2L, "click", us(20), 2L),
      // u3: single-event session
      (3L, "signup", us(0), 1L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Analytics.sessionPaths(events, "user_id", "event_type",
        "ts", "event_id", gapUs = gap, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("view>click", 3L), ("signup", 1L)))
  }

  test("madOutliers: rank-pick medians, MAD cutoff counts the spike") {
    val events = (1L to 9L).map(i => ("a", i.toDouble, i)) ++
      Seq(("a", 1000.0, 10L)) // the fat-finger event
    val df = events.toDF("event_type", "value", "event_id")
    val got = Analytics.madOutliers(df, "event_type", "value", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    // n=10 -> lower median rank 5 -> 5.0; deviations sorted:
    // {0,1,1,2,2,3,3,4,4,995} -> MAD rank 5 -> 2.0; cutoff 3*2=6 ->
    // only the 1000.0 event (dev 995) is an outlier — the robust
    // property: one spike cannot drag the boundary
    assert(got == Seq(("a", 10L, 5.0, 2.0, 1L)))
  }

  test("brandTopParts: rank over aggregated revenue, part-key tiebreak") {
    val part = Seq((1L, "B1"), (2L, "B1"), (3L, "B1"), (4L, "B2"))
      .toDF("p_partkey", "p_brand")
    val li = Seq(
      (1L, 10.0), (1L, 10.0), // part 1: 20
      (2L, 20.0),             // part 2: 20 — ties part 1, key breaks it
      (3L, 5.0),              // part 3: 5
      (4L, 1.0))
      .toDF("l_partkey", "l_extendedprice")
    val got = Analytics.brandTopParts(part, li, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      ("B1", 1L, 1L, 20.0), ("B1", 2L, 2L, 20.0),
      ("B2", 1L, 4L, 1.0)))
  }

  test("dailyStatusLocf: inactive days carry the latest prior status") {
    def us(day: Long, h: Long = 0) = day * 86400000000L + h * 3600000000L
    val events = Seq(
      // u1: day 0 ends 'active' (latest of day), days 1-2 silent,
      // day 3 'churned'
      (1L, "signup", us(0, 1), 1L), (1L, "active", us(0, 5), 2L),
      (1L, "churned", us(3, 2), 3L),
      // u2: single day
      (2L, "signup", us(10), 1L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Analytics.dailyStatusLocf(events, "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, 0L, "active"), (1L, 1L, "active"), (1L, 2L, "active"),
      (1L, 3L, "churned"), (2L, 10L, "signup")))
  }

  test("weightedMedian: half the WEIGHT decides, not half the rows") {
    val df = Seq(
      // group a: value 1 carries weight 9 of 12 -> median 1 even
      // though 3 of 4 rows have higher values
      ("a", 1.0, 9L), ("a", 5.0, 1L), ("a", 7.0, 1L), ("a", 9.0, 1L),
      // group b: exact half at the boundary -> lower pick (2*5 >= 10)
      ("b", 2.0, 5L), ("b", 4.0, 5L))
      .toDF("g", "v", "w")
    val got = Analytics.weightedMedian(df, "g", "v", "w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq(("a", 12L, 1.0), ("b", 10L, 2.0)))
    // a negative weight breaks the monotone-cumulative invariant the
    // pick depends on — it must fail loud, never return a quiet wrong
    // median
    val bad = Seq(("a", 1.0, 5L), ("a", 2.0, -1L)).toDF("g", "v", "w")
    val e = intercept[IllegalArgumentException] {
      Analytics.weightedMedian(bad, "g", "v", "w").collect()
    }
    assert(e.getMessage.contains("nonnegative"))
    // null weights fail loud INSIDE the shared prefix machinery (the
    // guard protects every GlobalRank caller, not just this one) — a
    // friendly require, never an NPE on the null partition sum
    val allNull = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
      .withColumn("w", lit(null).cast("long"))
    val e2 = intercept[IllegalArgumentException] {
      Analytics.weightedMedian(allNull, "g", "v", "w").collect()
    }
    assert(e2.getMessage.contains("contains nulls"))
    // validateWeights = false: the extra narrow agg is skipped on a
    // known-clean hot path; same result as the default
    val got2 = Analytics.weightedMedian(df, "g", "v", "w",
        validateWeights = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got2 == Seq(("a", 12L, 1.0), ("b", 10L, 2.0)))
  }

  test("coPurchaseClustering: triangle corners vs open wedges, pendants out") {
    // orders o1, o2 both carry {1,2,3} (every pair at support 2 — one
    // triangle); o3, o4 both carry {1,4} (a pendant edge off vertex 1)
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 4L),
      (4L, 1L), (4L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val got = Analytics.coPurchaseClustering(li, minSupport = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      // v1: degree 3, 1 triangle -> 2e6/(3*2) = 333333 (floor)
      (1L, 3L, 1L, 333333L),
      // v2, v3: degree 2, their one neighbor pair IS connected -> 1e6
      (2L, 2L, 1L, 1000000L),
      (3L, 2L, 1L, 1000000L)))
    // degree-1 vertex 4 is excluded (cc undefined), not reported as 0
  }

  test("timeWeightedAverage: duration weighting, not event counting") {
    val events = Seq(
      // u1: value 10 held for 9 µs, then value 100 held for 1 µs, then
      // a last event (no successor -> no interval):
      // TWAP = (10*9 + 100*1)/10 = 19.0 — a plain mean would say 55+
      (1L, 10.0, 0L, 1L), (1L, 100.0, 9L, 2L), (1L, 7.0, 10L, 3L),
      // u2: single event -> no interval -> excluded entirely
      (2L, 42.0, 5L, 1L),
      // u3: two events at the SAME timestamp (zero span) -> excluded
      (3L, 1.0, 7L, 1L), (3L, 2.0, 7L, 2L))
      .toDF("user_id", "value", "ts", "event_id")
    val got = Analytics.timeWeightedAverage(events, "user_id", "value",
        "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 10L, 19000000L)))
  }

  test("round-14 operators: partitioning-invariant on the real sf0.001 tables") {
    val orders = graft.Tables.orders(spark, sf)
    val part = graft.Tables.part(spark, sf)
    val lineitem = graft.Tables.lineitem(spark, sf)
    val events = graft.Tables.events(spark, sf)
    def inv(name: String)(f: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame,
        fact: org.apache.spark.sql.DataFrame): Unit = {
      val a = f(fact).collect().toSeq
      val b = f(fact.repartition(13)).collect().toSeq
      assert(a == b, s"$name changed under repartition(13)")
      assert(a.nonEmpty, s"$name returned nothing at sf0.001")
    }
    inv("attributionLastTouch")(Analytics.attributionLastTouch(_,
      "user_id", "event_type", "ts", "event_id", "value"), events)
    inv("attributionLinear")(Analytics.attributionLinear(_,
      "user_id", "event_type", "ts", "event_id", "value"), events)
    inv("dailyOrderSpine")(Analytics.dailyOrderSpine(_), orders)
    inv("brandVwap")(Analytics.brandVwap(part, _), lineitem)
    inv("sessionPaths")(Analytics.sessionPaths(_, "user_id", "event_type",
      "ts", "event_id", gapUs = 1800000000L, k = 20), events)
    inv("madOutliers")(Analytics.madOutliers(_, "event_type", "value",
      "event_id"), events)
    inv("brandTopParts")(Analytics.brandTopParts(part, _, 3), lineitem)
    inv("dailyStatusLocf")(Analytics.dailyStatusLocf(_, "user_id",
      "event_type", "ts", "event_id"), events)
    inv("weightedMedian")(Analytics.weightedMedian(_, "l_returnflag",
      "l_extendedprice", "l_quantity"), lineitem)
    inv("coPurchaseClustering")(Analytics.coPurchaseClustering(_, 2L),
      lineitem)
    inv("timeWeightedAverage")(Analytics.timeWeightedAverage(_, "user_id",
      "value", "ts", "event_id"), events)
    val docs = graft.Tables.documents(spark, sf)
    inv("ngramDiversity")(graft.text.TextAnalysis.ngramDiversity(_,
      "source", "text"), docs)
    inv("sourceKlDivergence")(graft.text.TextAnalysis.sourceKlDivergence(_,
      "source", "text"), docs)
  }

  test("sequenceMatch: substring-colliding vocabulary fails loud, not silent") {
    // `view` is a substring of `view_item`: the journey regex
    // `view.*purchase` would match the view_item prefix and corrupt
    // every count — the contract check must throw BEFORE any counting
    val events = Seq(
      (1L, "view_item", 10L, 1L), (1L, "purchase", 11L, 2L),
      (2L, "view", 20L, 1L))
      .toDF("user_id", "event_type", "event_id", "ts")
    val e = intercept[IllegalArgumentException] {
      Analytics.sequenceMatch(events, "user_id", "event_type",
        "ts", "event_id", Seq("v2p" -> "view.*purchase")).collect()
    }
    assert(e.getMessage.contains("substring"))
    // whitespace inside a type breaks the space-delimited encoding
    val spaced = Seq((1L, "add to cart", 10L, 1L))
      .toDF("user_id", "event_type", "event_id", "ts")
    val e2 = intercept[IllegalArgumentException] {
      Analytics.sequenceMatch(spaced, "user_id", "event_type",
        "ts", "event_id", Seq("p" -> "cart")).collect()
    }
    assert(e2.getMessage.contains("whitespace"))
    // opting out (known-clean vocabulary) skips the validation pass
    val clean = Analytics.sequenceMatch(events, "user_id", "event_type",
      "ts", "event_id", Seq("v2p" -> "view_item.*purchase"),
      validateVocabulary = false).collect()
    assert(clean.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("v2p", 1L)))
  }

  test("returnRate: zero-revenue month pins the rate to NULL, not an error") {
    val li = Seq(
      // normal month: 100.00 total, 25.00 returned -> 250000 ppm
      ("2024-01-05", "N", 50.0, 0.0), ("2024-01-06", "R", 25.0, 0.0),
      ("2024-01-07", "N", 25.0, 0.0),
      // degenerate month: fully discounted -> total 0, rate NULL
      ("2024-02-01", "R", 40.0, 1.0))
      .toDF("__s", "l_returnflag", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", to_timestamp(col("__s")))
    val got = Analytics.returnRate(li)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toSeq
    assert(got == Seq(
      ("2024-01", 100.0, 25.0, 250000L),
      ("2024-02", 0.0, 0.0, null)))
  }

  test("shipLatency: histogram quantiles per month, month from the order date") {
    val orders = Seq(
      (1L, "2024-01-10"), (2L, "2024-01-20"),
      // order in january, shipped in february — the month bucket
      // follows the ORDER date
      (3L, "2024-01-31"),
      (4L, "2024-02-05"))
      .toDF("o_orderkey", "__d")
      .withColumn("o_orderdate", to_timestamp(col("__d")))
    val li = Seq(
      (1L, "2024-01-12"), // gap 2
      (1L, "2024-01-13"), // gap 3 (two lines of one order both count)
      (2L, "2024-01-29"), // gap 9
      (3L, "2024-02-02"), // gap 2, bucketed to 2024-01
      (4L, "2024-02-05")) // gap 0
      .toDF("l_orderkey", "__s")
      .withColumn("l_shipdate", to_timestamp(col("__s")))
    val got = Analytics.shipLatency(orders, li)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq
    // 2024-01 gaps {2,2,3,9}: mean 4.0, lower-median 2, p90 9
    assert(got == Seq(
      ("2024-01", 4L, 4.0, 2L, 9L),
      ("2024-02", 1L, 0.0, 0L, 0L)))
  }

  test("propsRollup: exact extraction, null on malformed/missing JSON") {
    val ev = Seq(
      (1L, "a", """{"k": 5}"""), (2L, "a", """{"k": 7}"""),
      (3L, "a", "not json at all"),
      (4L, "b", null), (5L, "b", """{"other": 1}"""))
      .toDF("event_id", "event_type", "props")
    val got = Analytics.propsRollup(ev, "event_type", "props", "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getLong(4),
        if (r.isNullAt(5)) null else r.getLong(5))).toSeq
    assert(got == Seq(
      ("a", 3L, 2L, 12L, 5L, 7L),
      ("b", 2L, 0L, null, null, null)))
  }

  test("newVsReturning: first-month orders count as new, disjoint splits") {
    val got = Analytics.newVsReturning(cohortOrders)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      ("2023-12", 1L, 0L, 3.0, 0.0),
      ("2024-01", 2L, 1L, 16.0, 4.0), // c1+c3 new, c4 returning
      ("2024-02", 1L, 1L, 7.0, 2.0),
      ("2024-03", 0L, 1L, 0.0, 20.0)))
  }

  test("orderPriceAudit: exact-cent reconcile, drift census, headless lines") {
    // o1 reconciles exactly: 100 * (1-0.10) * (1+0.10) = 99.00
    // o2 drifts by +0.50 against its recompute (2.00)
    // o3 has NO lines at all
    val orders = Seq(
      (1L, "O", 99.0), (2L, "O", 2.5), (3L, "F", 7.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
    val lines = Seq(
      (1L, 100.0, 0.10, 0.10),
      (2L, 2.0, 0.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val got = Analytics.orderPriceAudit(orders, lines)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("F", 1L, 0L, 0L, 1L, 0L),          // headless: neither bucket
      ("O", 2L, 1L, 1L, 0L, 500000L)))    // drift = 0.50 = 500000 micros
  }

  test("interArrivalMedian: gaps within (user, type) only, lower median") {
    val events = Seq(
      // u1 'a': gaps 10, 30 -> contributes both; u1's 'b' between them
      // must NOT split the 'a' chain (per-type cadence)
      (1L, "a", 0L, 1L), (1L, "b", 5L, 2L), (1L, "a", 10L, 3L),
      (1L, "a", 40L, 4L),
      // u2 'a': single event, no gap
      (2L, "a", 7L, 5L),
      // u2 'b': gap 20
      (2L, "b", 0L, 6L), (2L, "b", 20L, 7L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Analytics.interArrivalMedian(events, "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // 'a' gaps {10, 30}: lower median 10; 'b' gaps {20}
    assert(got == Seq(("a", 2L, 10L), ("b", 1L, 20L)))
  }

  test("iqrOutliers: quartile picks are data values, fences catch the tails") {
    // n=8 values 1..8 plus outliers -100 and 100 (n=10):
    // q1 at rank ceil(10/4)=3, q3 at rank ceil(30/4)=8
    val vals = Seq(-100.0) ++ (1 to 8).map(_.toDouble) ++ Seq(100.0)
    val events = vals.zipWithIndex
      .map { case (v, i) => ("t", v, i.toLong) }
      .toDF("event_type", "value", "event_id")
    val got = Analytics.iqrOutliers(events, "event_type", "value", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5))).head
    // sorted: -100,1..8,100 -> rank3 = 2, rank8 = 7; IQR = 5
    // fences: lo = 2 - 7.5 = -5.5, hi = 7 + 7.5 = 14.5
    assert(got == (("t", 10L, 2.0, 7.0, 1L, 1L)))
  }

  test("priceHistogram: integer widths, remainder bins, degenerate span") {
    // cents 100..115 (16 values) in 4 buckets -> width ceil(16/4)=4
    val li = (100 to 115).map(c => c / 100.0).toDF("l_extendedprice")
    val got = Analytics.priceHistogram(li, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq((0L, 100L, 103L, 4L), (1L, 104L, 107L, 4L),
      (2L, 108L, 111L, 4L), (3L, 112L, 115L, 4L)))
    // all-equal prices: width clamps to 1, single bucket
    val flat = Seq(2.0, 2.0, 2.0).toDF("l_extendedprice")
    val g2 = Analytics.priceHistogram(flat, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(g2 == Seq((0L, 3L)))
  }

  test("sessionCooccurrence: distinct types per session, gap splits pairs") {
    val gap = 1000L
    val events = Seq(
      // u1 session 1: a, b, a (pair (a,b) counted ONCE despite repeat)
      (1L, "a", 0L, 1L), (1L, "b", 10L, 2L), (1L, "a", 20L, 3L),
      // u1 session 2 (past the gap): a, c
      (1L, "a", 5000L, 4L), (1L, "c", 5010L, 5L),
      // u2: b then c in one session
      (2L, "c", 0L, 6L), (2L, "b", 1L, 7L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Analytics.sessionCooccurrence(events, "user_id", "event_type",
        "ts", "event_id", gapUs = gap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("winsorizedMean: clipping tames the outlier, picks are exact") {
    // values 1..9 plus 1000: p10 pick at rank 1 (=1), p90 at rank 9 (=9)
    val vals = (1 to 9).map(_.toDouble) ++ Seq(1000.0)
    val events = vals.zipWithIndex.map { case (v, i) => ("t", v, i.toLong) }
      .toDF("event_type", "value", "event_id")
    val got = Analytics.winsorizedMean(events, "event_type", "value",
        "event_id", loPct = 10, hiPct = 90)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).head
    // clipped: 1..9 stay, 1000 -> 9; mean = 54/10 = 5.4 -> 5400000
    assert(got == (("t", 10L, 1.0, 9.0, 5400000L)))
  }

  test("revenueBridge: new vs retained vs churned, phantom month clipped") {
    val orders = Seq(
      // month M: c1 30.00, c2 10.00 (both new)
      (1L, "2024-01-15", 30.0), (2L, "2024-01-20", 10.0),
      // month M+1: c1 retained 20.00, c3 new 5.00; c2 churned (10.00)
      (1L, "2024-02-10", 20.0), (3L, "2024-02-11", 5.0))
      .toDF("o_custkey", "__d", "o_totalprice")
      .select(col("o_custkey"), col("__d").cast("date").as("o_orderdate"),
        col("o_totalprice"))
    val got = Analytics.revenueBridge(orders)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val m = 2024 * 12 + 0 // 2024-01
    // no third row: the month after the series end must not appear
    assert(got == Seq(
      (m.toLong, 4000L, 0L, 0L),
      (m.toLong + 1, 500L, 2000L, 1000L)))
  }

  test("attributionCompare: discovery vs closer credit, direct fallback") {
    val events = Seq(
      // u1: view ... click ... purchase 10 -> first=view, last=click
      (1L, "view", 0L, 1L, 0.0), (1L, "click", 10L, 2L, 0.0),
      (1L, "purchase", 20L, 3L, 10.0),
      // u2: touchless purchase -> both models credit 'direct'
      (2L, "purchase", 5L, 1L, 4.0))
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val got = Analytics.attributionCompare(events, "user_id", "event_type",
        "ts", "event_id", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("click", 0L, 0L, 1L, 10000000L),
      ("direct", 1L, 4000000L, 1L, 4000000L),
      ("view", 1L, 10000000L, 0L, 0L)))
  }

  test("monthStreakHistogram: islands at month grain, best streak per customer") {
    val orders = Seq(
      // c1: Jan, Feb, Apr 2024 -> streaks {2, 1}, best 2
      (1L, "2024-01-05"), (1L, "2024-02-07"), (1L, "2024-04-01"),
      // duplicate month must not break the island run
      (1L, "2024-02-20"),
      // c2: Dec 2023, Jan 2024 -> the year boundary is consecutive
      (2L, "2023-12-30"), (2L, "2024-01-02"),
      // c3: one month
      (3L, "2024-06-15"))
      .toDF("o_custkey", "__d")
      .select(col("o_custkey"), col("__d").cast("date").as("o_orderdate"),
        lit(1.0).as("o_totalprice"))
    val got = Analytics.monthStreakHistogram(orders)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 2L)))
  }

  test("dailyValueQuantiles: exact picks per (type, day) cell") {
    val day = 86400000000L
    val events = ((1 to 10).map(i => ("a", i.toDouble, i.toLong, 0L)) ++
      Seq(("a", 100.0, 11L, day), ("a", 200.0, 12L, day)) ++
      Seq(("b", 5.0, 13L, 0L)))
      .map { case (ty, v, id, t) => (ty, v, id, t + 1) } // past epoch 0
      .toDF("event_type", "value", "event_id", "ts")
    val got = Analytics.dailyValueQuantiles(events, "event_type", "ts",
        "value", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      // day 0, type a, n=10: p50 at rank 5, p90 at 9, p99 at 10
      ("a", 0L, 10L, 5.0, 9.0, 10.0),
      // day 1, n=2: picks at rank 1, 2, 2
      ("a", 1L, 2L, 100.0, 200.0, 200.0),
      ("b", 0L, 1L, 5.0, 5.0, 5.0)))
  }

  test("sessionPairLift: lift from independent vs co-occurring types") {
    val gap = 1000L
    // 4 sessions (distinct users): {a,b} x2, {a} x1, {b} x1
    // n_a = 3, n_b = 3, n_ab = 2, N = 4
    val events = Seq(
      (1L, "a", 0L, 1L), (1L, "b", 1L, 2L),
      (2L, "a", 0L, 3L), (2L, "b", 1L, 4L),
      (3L, "a", 0L, 5L),
      (4L, "b", 0L, 6L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Analytics.sessionPairLift(events, "user_id", "event_type",
        "ts", "event_id", gapUs = gap)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // support 2/4 = 500000; conf 2/3 = 666666; lift 2*4/(3*3) = 888888
    assert(got == Seq(("a", "b", 2L, 500000L, 666666L, 666666L, 888888L)))
  }

  test("growthAccounting: classes per day, churn booked to observed days only") {
    val day = 86400000000L
    val events = Seq(
      // u1: days 1, 2, 4 -> new@1, retained@2, resurrected@4;
      // churn@3 (observed via u2) and churn@5 (UNOBSERVED -> clipped)
      (1L, 1 * day), (1L, 2 * day), (1L, 4 * day),
      // u2: day 3 only -> new@3, churn@4
      (2L, 3 * day))
      .toDF("user_id", "ts")
    val got = Analytics.growthAccounting(events, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 1L, 0L, 0L, 0L),
      (2L, 0L, 1L, 0L, 0L),
      (3L, 1L, 0L, 0L, 1L),   // u1 churned on 3 (active 2, not 3)
      (4L, 0L, 0L, 1L, 1L)))  // u1 resurrected; u2 churned
  }

  test("hourlyProfile: epoch-hour buckets, floored integer mean") {
    val hour = 3600000000L
    val events = Seq(
      (1L * hour + 5, 1.0), (1L * hour + 9, 2.0),  // hour 1: mean 1.5
      (26L * hour + 1, 7.0))                       // 26 mod 24 = hour 2
      .toDF("ts", "value")
    val got = Analytics.hourlyProfile(events, "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 1500000L), (2L, 1L, 7000000L)))
  }

  test("basketSizeHistogram: orders roll to their line counts") {
    val li = Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1), (3L, 1), (3L, 2))
      .toDF("l_orderkey", "l_linenumber")
    val got = Analytics.basketSizeHistogram(li)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("recencyHistogram: last order vs corpus max, 30-day buckets") {
    val orders = Seq(
      // corpus max = 2024-03-31; c1 last = max (bucket 0 despite the
      // older order), c2 last = 35 days before (bucket 1),
      // c3 last = 60 days before (bucket 2)
      (1L, "2024-01-01"), (1L, "2024-03-31"),
      (2L, "2024-02-25"),
      (3L, "2024-01-31"))
      .toDF("o_custkey", "__d")
      .select(col("o_custkey"), col("__d").cast("date").as("o_orderdate"))
    val got = Analytics.recencyHistogram(orders)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 0L, 1L), (1L, 30L, 1L), (2L, 60L, 1L)))
  }

  test("weekdayProfile: epoch-day arithmetic, 0 = Sunday") {
    val orders = Seq(
      ("2024-01-07", 10.0), // a Sunday -> 0
      ("2024-01-08", 20.0), // Monday -> 1
      ("2024-01-15", 30.0)) // Monday -> 1
      .toDF("__d", "o_totalprice")
      .select(col("__d").cast("date").as("o_orderdate"), col("o_totalprice"))
    val got = Analytics.weekdayProfile(orders)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      (0L, 1L, 10.0, 166666L),   // 10/60 -> floored ppm
      (1L, 2L, 50.0, 833333L)))
  }

  test("repurchaseSurvival: same-day orders collapse, horizons cumulative") {
    val orders = Seq(
      // c1: active days 0, 5, 40 (the second day-5 order is the SAME
      // active day) -> gaps {5, 35}
      (1L, "1970-01-01"), (1L, "1970-01-06"), (1L, "1970-01-06"),
      (1L, "1970-02-10"),
      // c2: a single active day -> contributes no gap
      (2L, "1970-03-01"))
      .toDF("o_custkey", "__d")
      .select(col("o_custkey"), col("__d").cast("date").as("o_orderdate"))
    val got = Analytics.repurchaseSurvival(orders)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      (7L, 2L, 1L, 500000L), (14L, 2L, 1L, 500000L),
      (30L, 2L, 1L, 500000L), (60L, 2L, 2L, 1000000L),
      (90L, 2L, 2L, 1000000L), (180L, 2L, 2L, 1000000L)))
  }

  test("repurchaseSurvival: duplicated horizons dedup, never double-count") {
    // the pre-guard failure mode: a repeated horizon exploded each gap
    // row twice into the same horizon_days group, doubling n_gaps_le
    // (cum_ppm > 10⁶ while n_gaps stayed right)
    val orders = Seq(
      (1L, "1970-01-01"), (1L, "1970-01-06"), (1L, "1970-02-10"))
      .toDF("o_custkey", "__d")
      .select(col("o_custkey"), col("__d").cast("date").as("o_orderdate"))
    def run(hs: Seq[Int]) = Analytics.repurchaseSurvival(orders, hs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(run(Seq(7, 7, 60, 60, 60)) == run(Seq(7, 60)))
    assert(run(Seq(7, 60)) ==
      Seq((7L, 2L, 1L, 500000L), (60L, 2L, 2L, 1000000L)))
  }

  test("typeDailyCorrelation: perfect +/-, constant series NULL") {
    val day = 86400000000L
    // daily counts over span {0,1,2} (nd = 3):
    //   a: 1,2,3   b: 2,4,6 (= 2a, r = +1)   c: 1,1,1 (constant)
    //   d: 3,2,1 (= reversed a, r = -1)
    def rows(ty: String, perDay: Seq[Int]): Seq[(String, Long)] =
      perDay.zipWithIndex.flatMap { case (n, d) =>
        (0 until n).map(i => (ty, d * day + i + 1)) }
    val events = (rows("a", Seq(1, 2, 3)) ++ rows("b", Seq(2, 4, 6)) ++
      rows("c", Seq(1, 1, 1)) ++ rows("d", Seq(3, 2, 1)))
      .toDF("event_type", "ts")
    val got = Analytics.typeDailyCorrelation(events, "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got == Seq(
      ("a", "b", 3L, Some(1000000L)),
      ("a", "c", 3L, None),
      ("a", "d", 3L, Some(-1000000L)),
      ("b", "c", 3L, None),
      ("b", "d", 3L, Some(-1000000L)),
      ("c", "d", 3L, None)))
  }

  test("typeDailyCorrelation: disjoint active days still correlate (zero overlap)") {
    val day = 86400000000L
    // a active on days {0,1}, b only on day 2: spans align to nd = 3,
    // sxy = 0 via the left join, num = 3*0 - 3*5 = -15 -> negative
    val events = (Seq(("a", 1L), ("a", 2L), ("a", day + 1))
      ++ Seq(("b", 2 * day + 1), ("b", 2 * day + 2), ("b", 2 * day + 3),
        ("b", 2 * day + 4), ("b", 2 * day + 5)))
      .toDF("event_type", "ts")
    val got = Analytics.typeDailyCorrelation(events, "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    // a: counts 2,1,0 -> sx=3 sxx=5 dena=3*5-9=6
    // b: counts 0,0,5 -> sx=5 sxx=25 denb=3*25-25=50
    // num=-15; ra=floor(15e6/6)=2500000; rb=floor(15e6/50)=300000
    // r2=floor(2.5e6*3e5/1e6)=750000, signed -750000
    assert(got == Seq(("a", "b", 3L, -750000L)))
  }

  test("psiDrift: identical halves score exactly 0, a regime shift scores > 0") {
    val day = 86400000000L
    // span {0, 1}: mid = 0 + (1-0+2)//2 = 1 -> day 0 first, day 1 second
    // type a: the SAME four values in both halves -> every bin has
    // p = q, every term is exactly 0 (no ln rounding can leak in)
    val a = Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.flatMap { case (v, i) =>
      Seq(("a", i.toLong + 1, v), ("a", day + i + 1, v)) }
    // type b: all mass in bin 0 first, all in bin 9 second
    val b = (1 to 4).map(i => ("b", i.toLong, 0.0)) ++
      (1 to 4).map(i => ("b", day + i, 40.0))
    val events = (a ++ b).toDF("event_type", "ts", "value")
    val rows = Analytics.psiDrift(events, "event_type", "ts", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(rows.map(t => (t._1, t._2, t._3)) ==
      Seq(("a", 4L, 4L), ("b", 4L, 4L)))
    val psi = rows.map(t => t._1 -> t._4).toMap
    assert(psi("a") == 0L, s"identical distributions must score 0: $psi")
    // true PSI here is unbounded (disjoint support) but +1 smoothing on
    // 4-event halves flattens both sides toward uniform: the exact
    // smoothed value is ~0.92 nats — still far past the 0.25 threshold
    assert(psi("b") > 250000L,
      s"a total regime shift must clear the 0.25 drift threshold: $psi")
  }

  test("seasonalNaiveBacktest: lag-7 alignment, same-day collapse, WMAPE") {
    val orders = Seq(
      // day 0 has TWO orders (must collapse to 150.00 before scoring)
      ("1970-01-01", 100.0), ("1970-01-01", 50.0),
      ("1970-01-02", 200.0),
      ("1970-01-08", 110.0),   // vs d0=150 -> err 4000c
      ("1970-01-09", 150.0),   // vs d1=200 -> err 5000c
      ("1970-01-15", 100.0),   // vs d7=110 -> err 1000c
      ("1970-01-25", 100.0),   // d17 unobserved -> NOT scored
      ("1970-02-01", 50.0))    // vs d24=100 -> err 5000c (February)
      .toDF("__d", "o_totalprice")
      .select(col("__d").cast("date").as("o_orderdate"),
        col("o_totalprice"))
    val got = Analytics.seasonalNaiveBacktest(orders)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // Jan: errs {4000, 5000, 1000}, actuals {11000, 15000, 10000}
    //   mae = 10000 // 3; wmape = 10000e6 // 36000
    assert(got == Seq(
      ("1970-01", 3L, 3333L, 277777L),
      ("1970-02", 1L, 5000L, 1000000L)))
  }

  test("brandPairLift: distinct brands per basket, cross-multiplied lift") {
    val part = Seq((1L, "B1"), (2L, "B2"), (3L, "B3"))
      .toDF("p_partkey", "p_brand")
    val li = Seq(
      (1L, 1L), (1L, 2L),            // o1: {B1, B2}
      (2L, 1L), (2L, 2L), (2L, 1L),  // o2: duplicate part collapses
      (3L, 1L),                      // o3: {B1}
      (4L, 3L))                      // o4: {B3}
      .toDF("l_orderkey", "l_partkey")
    val got = Analytics.brandPairLift(part, li)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // N=4, n_B1=3, n_B2=2, both=2: support 2/4, lift 2*4/(3*2)
    assert(got == Seq(("B1", "B2", 2L, 500000L, 1333333L)))
  }

  test("sessionBounceRate: single-event sessions count, entry by (ts, id)") {
    val gap = 1000L
    val events = Seq(
      (1L, "home", 0L, 1L), (1L, "view", 1L, 2L), // session of 2
      (1L, "home", 5000L, 3L),                    // bounce
      (2L, "search", 0L, 4L),                     // bounce
      (3L, "a", 10L, 5L), (3L, "b", 10L, 6L))     // tie: id picks "a"
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Analytics.sessionBounceRate(events, "user_id", "event_type",
        "ts", "event_id", gapUs = gap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      ("a", 1L, 0L, 0L),
      ("home", 2L, 1L, 500000L),
      ("search", 1L, 1L, 1000000L)))
  }

  test("revenueAutocorrelation: exact signed r² at each lag, zero-fill algebra") {
    // observed days 0..3 with cents 100, 200, 100, 200 (strict
    // alternation): lag-1 is perfectly ANTI-correlated, lag-2
    // perfectly correlated; day 5 unobserved on purpose is omitted —
    // keep the span dense so the hand numbers stay small
    val orders = Seq(
      ("1970-01-01", 1.0), ("1970-01-02", 2.0),
      ("1970-01-03", 1.0), ("1970-01-04", 2.0))
      .toDF("__d", "o_totalprice")
      .select(col("__d").cast("date").as("o_orderdate"),
        col("o_totalprice"))
    val got = Analytics.revenueAutocorrelation(orders, lags = Seq(1, 2))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    // lag 1: x side = days 1..3 (200,100,200), y side = days 0..2
    //   (100,200,100), n = 3: num = 3*(2+2+2)*10000 - 500*400 (in
    //   cents²): perfectly alternating -> r = -1 exactly
    // lag 2: x = days 2..3 (100,200), y = days 0..1 (100,200), n = 2:
    //   identical series -> r = +1 exactly
    assert(got == Seq((1L, 3L, Some(-1000000L)), (2L, 2L, Some(1000000L))))
  }

  test("revenueAutocorrelation: unobserved days are zeros, constants NULL") {
    // observed days 0 and 2 only (day 1 is a true zero-revenue day):
    // lag 1 pairs (1,0), (2,1) -> sxy = 0 via the join algebra
    val orders = Seq(("1970-01-01", 1.0), ("1970-01-03", 1.0))
      .toDF("__d", "o_totalprice")
      .select(col("__d").cast("date").as("o_orderdate"),
        col("o_totalprice"))
    val got = Analytics.revenueAutocorrelation(orders, lags = Seq(1, 2))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    // lag 1: x = {0, 100}, y = {100, 0}, n = 2: num = 2*0 - 100*100 < 0,
    //   dena = denb = 2*10000 - 10000 = 10000 -> r = -1 exactly
    // lag 2: single pair (2,0): both sides constant-1-point -> both
    //   variances 0 -> NULL
    assert(got == Seq((1L, 2L, Some(-1000000L)), (2L, 1L, None)))
  }

  test("revenueAutocorrelation: duplicated lags dedup, moments unscaled") {
    // the pre-guard failure mode: a repeated lag scaled the conditional
    // moment sums and Σxy by its multiplicity while n did not —
    // silently wrong r2_signed_ppm, not a repeated row
    val orders = Seq(
      ("1970-01-01", 1.0), ("1970-01-02", 2.0),
      ("1970-01-03", 1.0), ("1970-01-04", 2.0))
      .toDF("__d", "o_totalprice")
      .select(col("__d").cast("date").as("o_orderdate"),
        col("o_totalprice"))
    def run(ls: Seq[Int]) = Analytics.revenueAutocorrelation(orders, ls)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(run(Seq(1, 1, 2, 2, 2)) == run(Seq(1, 2)))
    assert(run(Seq(1, 2)) ==
      Seq((1L, 3L, Some(-1000000L)), (2L, 2L, Some(1000000L))))
  }

  test("customerTrendCensus: slope sign classes, zero-variance day is flat") {
    val customer = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      // c1 improving: 100 then 200
      (1L, "1970-01-01", 100.0), (1L, "1970-01-10", 200.0),
      // c2 declining: 200 then 100
      (2L, "1970-01-01", 200.0), (2L, "1970-01-10", 100.0),
      // c3 single order
      (3L, "1970-01-05", 50.0),
      // c4 flat: both orders the SAME day (zero time variance)
      (4L, "1970-01-03", 10.0), (4L, "1970-01-03", 99.0),
      // c5 flat: equal values across days (zero numerator)
      (5L, "1970-01-01", 75.0), (5L, "1970-01-09", 75.0))
      .toDF("o_custkey", "__d", "o_totalprice")
      .select(col("o_custkey"), col("__d").cast("date").as("o_orderdate"),
        col("o_totalprice"))
    val got = Analytics.customerTrendCensus(orders, customer)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSeq
    assert(got == Seq(
      ("A", "declining", 1L), ("A", "improving", 1L), ("A", "single", 1L),
      ("B", "flat", 2L)))
  }

  test("typeFreshness: staleness vs the corpus frontier, exact seconds") {
    val events = Seq(
      ("a", 10000000L), ("a", 5000000L),  // a: last = 10 s (frontier)
      ("b", 4000000L))                    // b: 6 s stale
      .toDF("event_type", "ts")
    val got = Analytics.typeFreshness(events, "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      ("a", 2L, 10000000L, 0L), ("b", 1L, 4000000L, 6L)))
  }

  test("abandonmentCensus: time budget, strict-after ties, no-purchase users") {
    val events = Seq(
      // u1: converted view (purchase 500 µs later), then an abandoned
      // view (next purchase past the 1000 µs budget)
      (1L, "view", 0L, 1L), (1L, "purchase", 500L, 2L),
      (1L, "view", 2000L, 3L), (1L, "purchase", 4000L, 4L),
      // u2: view with no purchase ever
      (2L, "view", 0L, 5L),
      // u3: same-ts purchase with HIGHER id counts (strict (t, id)
      // order); the later view has no following purchase
      (3L, "view", 0L, 6L), (3L, "purchase", 0L, 7L),
      (3L, "purchase", 5L, 9L), (3L, "view", 10L, 8L),
      // noise type must not enter the window sort
      (1L, "click", 100L, 10L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Analytics.abandonmentCensus(events, "user_id", "event_type",
        "ts", "event_id", "view", "purchase", windowUs = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // 5 views; abandoned: u1's second, u2's, u3's second -> 3/5
    assert(got == Seq((5L, 3L, 600000L, 3L)))
  }

  test("lateDeliveryCensus: budget boundary, exact milli-day mean per nation") {
    val nation = Seq((1L, "FR"), (2L, "DE")).toDF("n_nationkey", "n_name")
    val supplier = Seq((10L, 1L), (11L, 1L), (12L, 2L))
      .toDF("s_suppkey", "s_nationkey")
    val orders = Seq((100L, "1970-01-01"), (101L, "1970-01-01"))
      .toDF("o_orderkey", "__d")
      .select(col("o_orderkey"), col("__d").cast("date").as("o_orderdate"))
    val li = Seq(
      // FR: s10 ships at +12 days (late vs budget 10) and exactly at
      // the budget (+10 is NOT late); s11 ships at +4
      (100L, 10L, "1970-01-13"), (100L, 10L, "1970-01-11"),
      (101L, 11L, "1970-01-05"),
      // DE: +2 days
      (101L, 12L, "1970-01-03"))
      .toDF("l_orderkey", "l_suppkey", "__s")
      .select(col("l_orderkey"), col("l_suppkey"),
        col("__s").cast("date").as("l_shipdate"))
    val got = Analytics.lateDeliveryCensus(li, orders, supplier, nation,
        budgetDays = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // FR: 3 lines, 1 late, delays {12, 10, 4} -> mean 26000/3 = 8666
    assert(got == Seq(
      ("DE", 1L, 0L, 0L, 2000L),
      ("FR", 3L, 1L, 333333L, 8666L)))
  }

  test("audienceOverlap: distinct users per type, disjoint pair kept at 0") {
    val events = Seq(
      // a: users {1, 2, 3} (u1 twice — must dedup); b: {2, 3};
      // c: {9} (disjoint from both)
      (1L, "a"), (1L, "a"), (2L, "a"), (3L, "a"),
      (2L, "b"), (3L, "b"),
      (9L, "c"))
      .toDF("user_id", "event_type")
    val got = Analytics.audienceOverlap(events, "event_type", "user_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("a", "b", 3L, 2L, 2L, 666666L),  // {2,3} / {1,2,3}
      ("a", "c", 3L, 1L, 0L, 0L),
      ("b", "c", 2L, 1L, 0L, 0L)))
  }
}
