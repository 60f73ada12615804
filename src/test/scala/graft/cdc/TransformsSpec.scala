package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors the SMT chain contract (postgres-sink.json:37-118). */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def envelope = Seq(
    ("scylla-cluster.app_data.users", "INSERT", (1L, "a@x.com"), 10L),
    ("scylla-cluster.app_data.users", "DELETE", (2L, "b@x.com"), 11L),
    ("heartbeat.scylla", "INSERT", (0L, "hb"), 12L)
  ).toDF("topic", "operation", "after", "event_id")
    .withColumn("after", $"after".cast("struct<user_id_value:bigint,email_value:string>"))

  test("dropHeartbeats removes heartbeat topics (T5)") {
    assert(Transforms.dropHeartbeats(envelope).count() == 2)
  }

  test("routeTable extracts destination table from topic (T4)") {
    val got = Transforms.routeTable(envelope).select("__table").as[String].collect()
    assert(got.count(_ == "users") == 2 && got.count(_ == "") == 1)
  }

  test("unwrap flattens after-image and adds __deleted rewrite (T1)") {
    val got = Transforms.unwrap(envelope, "after", "operation")
    assert(got.columns.toSet == Set("user_id_value", "email_value", "__deleted", "operation"))
    val del = got.filter($"__deleted" === "true").select("user_id_value").as[Long].collect()
    assert(del.toSeq == Seq(2L))
  }

  test("flatten recurses nested structs with delimiter (T2)") {
    val df = Seq((1L, (2L, (3L, "x")))).toDF("a", "b")
      .withColumn("b", $"b".cast("struct<c:bigint,d:struct<e:bigint,f:string>>"))
    val got = Transforms.flatten(df)
    assert(got.columns.toSeq == Seq("a", "b_c", "b_d_e", "b_d_f"))
  }

  test("renameFields applies the reference rename map in one select (T3)") {
    val df = Seq((1L, "x")).toDF("user_id", "email_value")
    val got = Transforms.renameFields(df, Transforms.ReferenceRenames)
    assert(got.columns.toSeq == Seq("user_id", "email"))
  }

  test("withCorrelationId keeps existing ids and mints missing ones (T7)") {
    val df = Seq((1L, Some("cid-1")), (2L, None)).toDF("id", "hdr")
    val got = Transforms.withCorrelationId(df, Some("hdr"))
      .select("id", "correlation_id").as[(Long, String)].collect().toMap
    assert(got(1L) == "cid-1")
    assert(got(2L).matches("[0-9a-f-]{36}"))
  }

  test("withCdcMeta stamps sink metadata columns (T8)") {
    val df = Seq((1L, "INSERT")).toDF("id", "operation")
    val got = Transforms.withCdcMeta(df, source = "scylla")
    assert(ChangeEvent.MetaColumns.filterNot(_ == "__deleted")
      .forall(got.columns.contains))
    assert(got.select("cdc_source").as[String].head() == "scylla")
  }

  test("castTo applies the table schema to a string-typed envelope (§7.4.5)") {
    val df = Seq(("o1", "u1", "199.50", "2024-01-02 03:04:05", "op"))
      .toDF("order_id", "user_id", "total_amount", "order_date", "cdc_operation")
    val typed = Transforms.castTo(df, ReferenceSchemas.orders)
    assert(typed.schema("total_amount").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2))
    assert(typed.schema("order_date").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(typed.schema("cdc_operation").dataType ==
      org.apache.spark.sql.types.StringType) // passthrough untouched
    val r = typed.select("total_amount", "order_date").head()
    assert(r.getDecimal(0) == new java.math.BigDecimal("199.50"))
    assert(r.getTimestamp(1) == java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))
    // lenient mode: poison values null out (DLQ-routable) instead of
    // ANSI-failing the batch
    val bad = Seq(("o2", "u2", "NOT MONEY", "nor a date", "x"))
      .toDF("order_id", "user_id", "total_amount", "order_date", "status")
    val lenient = Transforms.castTo(bad, ReferenceSchemas.orders, lenient = true)
      .select("total_amount", "order_date").head()
    assert(lenient.isNullAt(0) && lenient.isNullAt(1))
    assertThrows[Exception](
      Transforms.castTo(bad, ReferenceSchemas.orders).select("total_amount")
        .collect())
  }

  test("dropTombstones removes null-value records (T6)") {
    val df = Seq((1L, Some("v")), (2L, None)).toDF("id", "value")
    assert(Transforms.dropTombstones(df, "value").count() == 1)
  }
}
