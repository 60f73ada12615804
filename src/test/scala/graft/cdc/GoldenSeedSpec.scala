package graft.cdc

import graft.SparkSpec
import graft.analytics.Analytics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Golden-seed parity test (reference: seed data
  * `tests/integration/fixtures/sample_data.sql` — 5 users, 5 products,
  * 5 orders, 9 items, 5 txns; expectations `expected_results.sql` and
  * the user count-by-status validation init.sql:335-350 — 4 active,
  * 1 inactive; minimum slice SURVEY §7.2).
  *
  * Replays the seed as change events through the full engine path
  * (collapse → validation suite) and asserts the reference's golden
  * counts PASS.
  */
class GoldenSeedSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def seedUsers = {
    val rows = Seq(
      ("u-1", "alice@example.com", "alice", "active"),
      ("u-2", "bob@example.com", "bob", "active"),
      ("u-3", "carol@example.com", "carol", "active"),
      ("u-4", "dan@example.com", "dan", "active"),
      ("u-5", "eve@example.com", "eve", "inactive")
    ).map { case (id, em, un, st) =>
      Row(id, em, un, null, null, st, ts("2024-01-01 00:00:00"), null, null)
    }
    spark.createDataFrame(rows.asJava, ReferenceSchemas.users)
  }

  private def seedOrders = {
    val rows = (1 to 5).map { i =>
      Row(s"o-$i", s"u-${(i % 5) + 1}", if (i <= 3) "completed" else "pending",
        new java.math.BigDecimal(s"$i${i}0.50"), null,
        ts(s"2024-01-0$i 10:00:00"), null, null)
    }
    spark.createDataFrame(rows.asJava, ReferenceSchemas.orders)
  }

  private def seedItems = {
    val rows = (1 to 9).map { i =>
      Row(s"o-${(i % 5) + 1}", s"i-$i", s"p-${(i % 5) + 1}", i,
        new java.math.BigDecimal("9.99"), null)
    }
    spark.createDataFrame(rows.asJava, ReferenceSchemas.orderItems)
  }

  test("reference schemas carry the documented shapes") {
    assert(ReferenceSchemas.all.size == 5)
    assert(ReferenceSchemas.primaryKeys("order_items") == Seq("order_id", "item_id"))
    assert(ReferenceSchemas.orders("total_amount").dataType == DecimalType(12, 2))
    val withMeta = ReferenceSchemas.withCdcMeta(ReferenceSchemas.users)
    assert(ChangeEvent.MetaColumns.forall(withMeta.fieldNames.contains))
  }

  test("golden seed through the engine: user status validation passes (4 active / 1 inactive)") {
    // replay the seed as INSERT change events through the upsert collapse
    val events = seedUsers
      .withColumn("__deleted", lit("false"))
      .withColumn("commit_ts", lit(1L))
    val state = Upsert.collapseBatch(events, Seq("user_id"),
      struct(col("commit_ts")), "__deleted")
    val counts = state.groupBy("status").count().as[(String, Long)].collect().toMap
    assert(counts == Map("active" -> 4L, "inactive" -> 1L)) // init.sql:335-350

    // expected-vs-actual validation rows all PASS (A7/A8 machinery)
    val checks = Seq(
      Analytics.validationRow("active_users",
        spark.range(1).select(lit(4.0).as("v")),
        state.filter($"status" === "active").agg(count(lit(1)).cast("double"))),
      Analytics.validationRow("inactive_users",
        spark.range(1).select(lit(1.0).as("v")),
        state.filter($"status" === "inactive").agg(count(lit(1)).cast("double"))))
    val summary = Analytics.validationSummary(checks)
    assert(summary.filter($"status" =!= "PASS").count() == 0)
    val pct = Analytics.completenessPercentage(summary).as[Double].head()
    assert(pct == 100.0)
  }

  test("golden referential integrity: every order links a user; item counts match") {
    val itemCounts = seedItems.groupBy("order_id").agg(count(lit(1)).as("n"))
    val joined = seedOrders
      .join(seedUsers.select($"user_id"), Seq("user_id"), "left")
      .join(itemCounts, Seq("order_id"), "left")
    assert(joined.filter($"user_id".isNull).count() == 0) // no orphans
    val totalItems = joined.agg(sum(coalesce($"n", lit(0L)))).as[Long].head()
    assert(totalItems == 9L) // expected_results.sql item count
  }

  test("composite-key reconciliation on order_items (differ over 2-part PK)") {
    val tgt = seedItems.filter($"item_id" =!= "i-9") // drop one
    val missing = graft.reconcile.Differ.findMissingInTarget(
      seedItems, tgt, ReferenceSchemas.primaryKeys("order_items"))
    assert(missing.select("item_id").as[String].collect().toSeq == Seq("i-9"))
  }
}
