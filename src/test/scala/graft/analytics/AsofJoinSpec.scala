package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The as-of join's determinism contract, pinned against a brute-force
  * local argmax — including the tie/strict/tolerance edges where
  * point-in-time lookups silently disagree between engines. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // (key, ts, id) fixtures; quotes = right side, trades = left side
  private val quotes = Seq(
    (1L, 100L, 10L), (1L, 200L, 11L), (1L, 200L, 12L), (1L, 300L, 13L),
    (2L, 500L, 20L))
  private val trades = Seq(
    (1L, 50L, 1L),   // before any quote → unmatched
    (1L, 200L, 2L),  // ties two quotes at 200 → larger id (12) wins
    (1L, 250L, 3L),  // between → 200-quote, id 12
    (1L, 999L, 4L),  // after all → latest (300, 13)
    (2L, 500L, 5L),  // exact hit on the only quote
    (3L, 100L, 6L))  // key with no quotes at all

  private def brute(inclusive: Boolean): Map[Long, Option[(Long, Long)]] =
    trades.map { case (k, t, id) =>
      val cands = quotes.filter { case (qk, qt, _) =>
        qk == k && (if (inclusive) qt <= t else qt < t)
      }
      id -> (if (cands.isEmpty) None
             else { val (_, qt, qid) = cands.maxBy { case (_, qt, qid) => (qt, qid) }
                    Some((qid, t - qt)) })
    }.toMap

  private def run(inclusive: Boolean, tol: Long = Long.MaxValue,
      parts: Int = 1): Map[Long, Option[(Long, Long)]] = {
    val l = trades.toDF("user_id", "ts", "event_id").repartition(parts)
    val r = quotes.toDF("user_id", "ts", "event_id").repartition(parts)
    AsofJoin.asofJoin(l, r, "user_id", "ts", "ts", "event_id", "event_id",
        inclusive = inclusive, toleranceMicros = tol)
      .collect().map { row =>
        row.getLong(1) -> (if (row.isNullAt(2)) None
          else Some((row.getLong(2), row.getLong(3))))
      }.toMap
  }

  test("inclusive as-of equals the brute-force argmax (ties → larger id)") {
    assert(run(inclusive = true) == brute(inclusive = true))
    // and the tie case specifically picked id 12, not 11
    assert(run(inclusive = true)(2L).map(_._1).contains(12L))
  }

  test("strict as-of excludes the equal-timestamp row") {
    val got = run(inclusive = false)
    assert(got == brute(inclusive = false))
    // trade at 200 now matches the 100-quote; exact-hit trade 5 unmatched
    assert(got(2L).map(_._1).contains(10L))
    assert(got(5L).isEmpty)
  }

  test("tolerance nulls out stale matches; partitioning-invariant") {
    val got = run(inclusive = true, tol = 100L)
    // trade 4 (ts 999) is 699 past the last quote → out of tolerance
    assert(got(4L).isEmpty)
    assert(got(3L).map(_._2).contains(50L))
    assert(run(inclusive = true, tol = 100L, parts = 7) == got)
  }

  test("non-integral id columns are rejected loudly, not nulled silently") {
    // a string id would cast to null long, hiding every right row from
    // the carry-forward — the join must refuse instead
    val l = trades.toDF("user_id", "ts", "event_id")
    val rStr = quotes.map { case (k, t, id) => (k, t, s"evt-$id") }
      .toDF("user_id", "ts", "event_id")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l, rStr, "user_id", "ts", "ts", "event_id", "event_id")
    }
    assert(e.getMessage.contains("integral"))
    val lStr = trades.map { case (k, t, id) => (k, t, s"t-$id") }
      .toDF("user_id", "ts", "event_id")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(lStr, quotes.toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "ts", "event_id", "event_id")
    }
  }

  test("runningRevenue: cumulative per customer, date-then-key order") {
    val orders = Seq(
      (1L, 101L, "2024-01-01", 10.0), (1L, 103L, "2024-01-01", 5.0),
      (1L, 102L, "2024-02-01", 2.5), (2L, 201L, "2024-01-15", 7.0))
      .toDF("o_custkey", "o_orderkey", "d", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("d"))).drop("d")
    val got = Analytics.runningRevenue(orders)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(got == Seq((1L, 101L, 10.0), (1L, 102L, 17.5), (1L, 103L, 15.0),
      (2L, 201L, 7.0)))
  }
}
