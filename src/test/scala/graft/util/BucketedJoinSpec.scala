package graft.util

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Proves the co-location property: two same-bucketed tables join with
  * NO shuffle exchange, and results match the shuffled join exactly. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-bucketed join plans without Exchange; results match shuffled join") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_orderkey"), 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", Seq("o_orderkey"), 4)
    // tiny test tables would take a broadcast join (its BroadcastExchange
    // is not a shuffle); disable to surface the sort-merge path a big
    // fact-fact join would use
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem",
        Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan should be bucketed:\n$plan")
      // correctness parity with the plain (shuffling) join
      val expected = orders.join(lineitem, "o_orderkey")
        .agg(count(lit(1)), sum($"l_quantity")).as[(Long, Double)].head()
      val got = joined.agg(count(lit(1)), sum($"l_quantity")).as[(Long, Double)].head()
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucketed aggregation on the bucket key also avoids the exchange") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(orders, "b_orders_agg", Seq("o_orderkey"), 4)
    try {
      val agg = spark.table("b_orders_agg").groupBy("o_orderkey")
        .agg(sum($"o_totalprice").as("s"))
      val plan = agg.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"groupBy on bucket key must not shuffle:\n$plan")
      assert(agg.count() == orders.count())
    } finally spark.sql("DROP TABLE IF EXISTS b_orders_agg")
  }
}
