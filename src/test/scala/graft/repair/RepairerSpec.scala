package graft.repair

import graft.SparkSpec
import graft.reconcile.Differ

/** Mirrors tests/unit/test_repairer.py: quoting, injection prevention,
  * literal formatting, action ordering, dry-run. */
class RepairerSpec extends SparkSpec {
  import spark.implicits._

  test("identifiers always quoted, embedded quotes doubled") {
    assert(Repairer.quoteIdentifier("user") == "\"user\"") // reserved word safe
    assert(Repairer.quoteIdentifier("a\"b") == "\"a\"\"b\"")
    assert(Repairer.quoteQualified("cdc_data", "orders") == "\"cdc_data\".\"orders\"")
  }

  test("SQL injection prevention (test_repairer.py:353)") {
    val sql = Repairer.generateInsertSql("s", "t", Seq("name"),
      Seq("'); DROP TABLE users; --"))
    assert(sql == """INSERT INTO "s"."t" ("name") VALUES ('''); DROP TABLE users; --')""")
    val evilCol = Repairer.generateDeleteSql("s", "t",
      Map("id\"; DROP TABLE x; --" -> 1))
    assert(evilCol.contains("\"id\"\"; DROP TABLE x; --\""))
  }

  test("literal formatting: null, bool, decimal, bytes, timestamp, collections") {
    assert(Repairer.formatValue(null) == "NULL")
    assert(Repairer.formatValue(true) == "TRUE")
    assert(Repairer.formatValue(new java.math.BigDecimal("12.30")) == "12.30")
    assert(Repairer.formatValue(Array[Byte](0x01, 0xab.toByte)) == "'\\x01ab'")
    assert(Repairer.formatValue(java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))
      .startsWith("'2024-01-02"))
    assert(Repairer.formatValue(java.time.Duration.ofSeconds(90)) == "INTERVAL '90 seconds'")
    assert(Repairer.formatValue(Map("a" -> 1)) == "'{\"a\": 1}'")
    assert(Repairer.formatValue(Seq(1, 2)) == "'[1, 2]'")
    assertThrows[IllegalArgumentException](Repairer.formatValue(new Object))
    // Spark Row.get returns mutable.ArraySeq / mutable Map for array/map
    // columns — these are NOT immutable Seq/Map and used to hit the throw
    assert(Repairer.formatValue(scala.collection.mutable.ArraySeq(1, 2)) == "'[1, 2]'")
    assert(Repairer.formatValue(scala.collection.mutable.Map("a" -> 1)) == "'{\"a\": 1}'")
  }

  test("generateRepairActions over an array-typed column formats JSON executor-side") {
    val src = Seq((1L, Seq("x", "y"))).toDF("id", "tags")
    val tgt = Seq((2L, Seq("z"))).toDF("id", "tags")
    val disc = Differ.findAllDiscrepancies(src, tgt, Seq("id"))
    val actions = Repairer.generateRepairActions(disc, "s", "t",
      Seq("id"), Seq("tags"), dryRun = true).collect()
    val byType = actions.map(r => r.getString(1) -> r.getString(3)).toMap
    assert(byType("INSERT") ==
      """INSERT INTO "s"."t" ("id", "tags") VALUES (1, '["x", "y"]')""")
  }

  test("update SQL sets only provided fields; composite-key WHERE") {
    val sql = Repairer.generateUpdateSql("s", "t",
      Map("k1" -> 1, "k2" -> "x"), Map("v" -> 2.5))
    assert(sql == """UPDATE "s"."t" SET "v" = 2.5 WHERE "k1" = 1 AND "k2" = 'x'""")
  }

  test("generateRepairActions: INSERT/DELETE/UPDATE per discrepancy, ordered DELETE first") {
    val src = Seq((1L, "a", 1.0), (2L, "b", 2.0), (4L, "d", 4.0)).toDF("id", "n", "v")
    val tgt = Seq((1L, "a", 1.0), (2L, "b", 9.0), (3L, "c", 3.0)).toDF("id", "n", "v")
    val disc = Differ.findAllDiscrepancies(src, tgt, Seq("id"))
    val actions = Repairer.generateRepairActions(disc, "cdc_data", "t",
      Seq("id"), Seq("n", "v"), dryRun = true)
      .orderBy("priority").collect()
    assert(actions.map(_.getString(1)).toSeq == Seq("DELETE", "INSERT", "UPDATE"))
    val byType = actions.map(r => r.getString(1) -> r.getString(3)).toMap
    assert(byType("DELETE") == """DELETE FROM "cdc_data"."t" WHERE "id" = 3""")
    assert(byType("INSERT") ==
      """INSERT INTO "cdc_data"."t" ("id", "n", "v") VALUES (4, 'd', 4.0)""")
    assert(byType("UPDATE") == """UPDATE "cdc_data"."t" SET "v" = 2.0 WHERE "id" = 2""")
    assert(actions.forall(_.getBoolean(4))) // dry_run flag
  }
}
