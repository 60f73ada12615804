package graft.repair

import graft.SparkSpec

class JdbcMergeSinkSpec extends SparkSpec {
  import spark.implicits._

  test("upsert SQL: conflict target, coalesce partial cols, monotonic guard") {
    val sql = JdbcMergeSink.upsertSql("cdc_data", "users", Seq("user_id"),
      "commit_ts",
      Map("user_id" -> "u1", "name" -> "alice", "commit_ts" -> 100L),
      partialUpdateCols = Set("name"))
    assert(sql ==
      """INSERT INTO "cdc_data"."users" ("commit_ts", "name", "user_id") VALUES (100, 'alice', 'u1') ON CONFLICT ("user_id") DO UPDATE SET "commit_ts" = EXCLUDED."commit_ts", "name" = COALESCE(EXCLUDED."name", "cdc_data"."users"."name") WHERE "cdc_data"."users"."commit_ts" <= EXCLUDED."commit_ts"""")
  }

  test("batch statements: deletes for tombstoned keys, upserts otherwise") {
    val collapsed = Seq(
      ("u1", Some("alice"), 100L, "false"),
      ("u2", None: Option[String], 200L, "true")
    ).toDF("user_id", "name", "commit_ts", "__deleted")
    val stmts = JdbcMergeSink.batchStatements(collapsed, "cdc_data", "users",
      Seq("user_id"), "commit_ts", partialUpdateCols = Set("name"))
      .as[(String, String)].collect().toMap
    assert(stmts("DELETE") == """DELETE FROM "cdc_data"."users" WHERE "user_id" = 'u2'""")
    assert(stmts("UPSERT").startsWith("""INSERT INTO "cdc_data"."users""""))
    assert(stmts("UPSERT").contains("COALESCE(EXCLUDED.\"name\""))
  }

  test("injection safety holds through the sink path") {
    val sql = JdbcMergeSink.upsertSql("s", "t", Seq("id"), "ts",
      Map("id" -> "'; DROP TABLE t; --", "ts" -> 1L))
    assert(sql.contains("'''; DROP TABLE t; --'"))
  }
}
