package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors the reference's sink-side semantics: upsert idempotence
  * (tests/contract/test_postgres_sink.py:89), partial-update coalescing
  * (handle-partial-updates.sql), delete handling, per-key ordering. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  // (key, seq, name, value, deleted)
  private def changes = Seq(
    (1L, 1L, Some("a1"), Some(10.0), "false"),
    (1L, 2L, Some("a2"), None, "false"),       // partial: value absent
    (2L, 1L, Some("b1"), Some(20.0), "false"),
    (2L, 2L, None, None, "true"),              // delete key 2
    (3L, 1L, Some("c1"), Some(30.0), "false")
  ).toDF("id", "seq", "name", "value", "__deleted")

  test("latestPerKey keeps the row with max order key") {
    val got = Upsert.latestPerKey(changes, Seq("id"), struct($"seq"))
      .select("id", "seq").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("lastNonNullPerKey takes latest non-null per column") {
    val got = Upsert.lastNonNullPerKey(changes, Seq("id"), struct($"seq"),
      Seq("name", "value"))
      .select("id", "name", "value").as[(Long, Option[String], Option[Double])]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (Some("a2"), Some(10.0))) // value survives partial update
    assert(got(2L) == (Some("b1"), Some(20.0))) // delete row's nulls ignored
  }

  test("collapseBatch drops keys whose latest event is a delete") {
    val got = Upsert.collapseBatch(changes, Seq("id"), struct($"seq"), "__deleted",
      partialUpdateCols = Seq("name", "value"))
    assert(got.select("id").as[Long].collect().toSet == Set(1L, 3L))
    val row1 = got.filter($"id" === 1L).select("name", "value")
      .as[(String, Double)].head()
    assert(row1 == ("a2", 10.0))
  }

  test("mergeBatch: insert, update-with-coalesce, delete, idempotence") {
    val target = Seq(
      (1L, "old1", 1.0, 1L), (2L, "old2", 2.0, 1L)
    ).toDF("id", "name", "value", "seq")
    val updates = Seq(
      (1L, Some("new1"), None: Option[Double], 5L, "false"), // partial update
      (2L, None: Option[String], None: Option[Double], 5L, "true"), // delete
      (9L, Some("ins"), Some(9.0), 5L, "false")               // insert
    ).toDF("id", "name", "value", "seq", "__deleted")

    val merged = Upsert.mergeBatch(target, updates, Seq("id"), "seq", "__deleted",
      partialUpdateCols = Seq("name", "value"))
    val rows = merged.select("id", "name", "value", "seq")
      .as[(Long, String, Double, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "new1", 1.0, 5L), (9L, "ins", 9.0, 5L)))

    // idempotence: applying the same batch to the merged snapshot is a no-op
    val again = Upsert.mergeBatch(
      merged.withColumn("__deleted", lit("false")).drop("__deleted"),
      updates, Seq("id"), "seq", "__deleted",
      partialUpdateCols = Seq("name", "value"))
    val rows2 = again.select("id", "name", "value", "seq")
      .as[(Long, String, Double, Long)].collect().sortBy(_._1)
    assert(rows2.toSeq == rows.toSeq)
  }

  test("mergeBatch: NULL delete marker is an update, not a delete") {
    // a valid-JSON event missing `operation` yields __deleted = NULL;
    // `=== "true"` is NULL there, and filter(!(... && NULL)) used to drop
    // the joined row — silently deleting the matched target row
    val target = Seq((1L, "keep", 1.0, 1L)).toDF("id", "name", "value", "seq")
    val updates = Seq(
      (1L, Some("upd"), Some(2.0), 5L, None: Option[String]),  // NULL marker, matched
      (9L, Some("ins"), Some(9.0), 5L, None: Option[String])   // NULL marker, unmatched
    ).toDF("id", "name", "value", "seq", "__deleted")
    val merged = Upsert.mergeBatch(target, updates, Seq("id"), "seq", "__deleted")
    val rows = merged.select("id", "name", "value")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "upd", 2.0), (9L, "ins", 9.0)))
  }

  test("mergeBatch monotonic guard: stale replay does not regress target") {
    val target = Seq((1L, "current", 10.0, 100L)).toDF("id", "name", "value", "seq")
    val stale = Seq((1L, Some("ancient"), Some(1.0), 5L, "false"))
      .toDF("id", "name", "value", "seq", "__deleted")
    val merged = Upsert.mergeBatch(target, stale, Seq("id"), "seq", "__deleted")
    val row = merged.select("name", "seq").as[(String, Long)].head()
    assert(row == ("current", 100L))
  }
}
