package graft.util

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared global-rank/prefix machinery must be bit-identical to the
  * textbook single-partition global window at any parallelism — that
  * equality is the whole contract the median/MAD/Pareto/shard/SNM
  * family leans on. */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  // deliberately skewed + shuffled input, many partitions, duplicate
  // values (the id tiebreak carries the total order)
  private def base = (1L to 500L)
    .map(i => (i, (i * 7919) % 23, ((i * 104729) % 50).toDouble))
    .toDF("id", "w", "v")
    .repartition(16)

  test("withGlobalRank equals the global row_number over the total order") {
    val sort = Seq(col("v"), col("id"))
    val (got, n) = GlobalRank.withGlobalRank(base, sort, "rk")
    assert(n == 500L)
    val expected = base.withColumn("rk",
      row_number().over(Window.orderBy(sort: _*)).cast("long"))
    assert(got.select("id", "rk").as[(Long, Long)].collect().toMap ==
      expected.select("id", "rk").as[(Long, Long)].collect().toMap)
  }

  test("withGlobalRankAndPrefix equals the global running sum; totals exact") {
    val sort = Seq(col("v"), col("id"))
    val (got, n, total) =
      GlobalRank.withGlobalRankAndPrefix(base, sort, "w", "rk", "cum")
    assert(n == 500L)
    assert(total == (1L to 500L).map(i => (i * 7919) % 23).sum)
    val w = Window.orderBy(sort: _*).rowsBetween(Window.unboundedPreceding, 0)
    val expected = base
      .withColumn("rk", row_number().over(Window.orderBy(sort: _*)).cast("long"))
      .withColumn("cum", sum(col("w")).over(w))
    assert(got.select("id", "rk", "cum").as[(Long, Long, Long)]
        .collect().toSet ==
      expected.select("id", "rk", "cum").as[(Long, Long, Long)]
        .collect().toSet)
  }

  test("bucketedRank equals the global rank under an order-aligned bucketing") {
    // bucket by value-range: aligned with the (v, id) order by
    // construction; bucket column is DOUBLE-derived int
    val bucketed = base.withColumn("bkt", (col("v") / 10).cast("int"))
      .localCheckpoint()
    val got = GlobalRank.bucketedRank(bucketed, "bkt",
      Seq(col("v"), col("id")), "rk")
    val expected = bucketed.withColumn("rk",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    assert(got.select("id", "rk").as[(Long, Long)].collect().toMap ==
      expected.select("id", "rk").as[(Long, Long)].collect().toMap)
    // the bucket column survives (callers keep using it)
    assert(got.columns.contains("bkt"))
  }

  test("bucketedPrefix: inclusive and exclusive frames, grand total, overflow guard") {
    val bucketed = base.withColumn("bkt", (col("v") / 10).cast("int"))
      .localCheckpoint()
    val w = Window.orderBy(col("v"), col("id"))
    val (inc, totInc) = GlobalRank.bucketedPrefix(bucketed, "bkt",
      Seq(col("v"), col("id")), "w", "cum")
    val expInc = bucketed.withColumn("cum",
      sum(col("w")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    assert(inc.select("id", "cum").as[(Long, Long)].collect().toMap ==
      expInc.select("id", "cum").as[(Long, Long)].collect().toMap)
    assert(totInc == (1L to 500L).map(i => (i * 7919) % 23).sum)
    // exclusive: each row's START offset; 0 for the global first row
    val (exc, _) = GlobalRank.bucketedPrefix(bucketed, "bkt",
      Seq(col("v"), col("id")), "w", "cum", inclusive = false)
    val expExc = bucketed.withColumn("cum", coalesce(
      sum(col("w")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L)))
    assert(exc.select("id", "cum").as[(Long, Long)].collect().toMap ==
      expExc.select("id", "cum").as[(Long, Long)].collect().toMap)
    // a total past 2^63 must fail loud, not wrap into garbage offsets
    val big = Seq((1L, 0, Long.MaxValue / 2), (2L, 1, Long.MaxValue / 2),
      (3L, 2, Long.MaxValue / 2)).toDF("id", "bkt", "w").localCheckpoint()
    val e = intercept[IllegalArgumentException] {
      GlobalRank.bucketedPrefix(big, "bkt", Seq(col("id")), "w", "cum")
    }
    assert(e.getMessage.contains("overflows 64-bit"))
  }

  test("withGroupLocalRank equals per-group row_number, group sizes exact") {
    val got = GlobalRank.withGroupLocalRank(base, Seq("w"),
      Seq(col("v"), col("id")), "lr", "n")
    val expected = base
      .withColumn("lr", row_number().over(
        Window.partitionBy("w").orderBy(col("v"), col("id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("w")))
    assert(got.select("id", "lr", "n").as[(Long, Long, Long)]
        .collect().toSet ==
      expected.select("id", "lr", "n").as[(Long, Long, Long)]
        .collect().toSet)
    // the decomposition itself: a partition-id window, never one over
    // the group column
    val p = got.queryExecution.executedPlan.toString()
    assert(p.contains("windowspecdefinition(__pid"),
      s"group-local ranks must ride the range-partition decomposition:\n$p")
    assert(!p.contains("windowspecdefinition(w"),
      s"never a per-group window over the raw frame:\n$p")
  }

  test("empty input: rank and prefix return empty frames, zero totals") {
    val empty = base.filter(col("id") < 0)
    val (r, n) = GlobalRank.withGlobalRank(empty, Seq(col("id")), "rk")
    assert(n == 0L && r.count() == 0L)
    val bucketedEmpty = empty.withColumn("bkt", lit(0)).localCheckpoint()
    val (p, tot) = GlobalRank.bucketedPrefix(bucketedEmpty, "bkt",
      Seq(col("id")), "w", "cum")
    assert(tot == 0L && p.count() == 0L)
  }
}
